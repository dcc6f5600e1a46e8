"""Luma tx-type search + directional angle deltas (round 2).

* candidates expand to (mode, angle_delta) x tx-type (DTT4_IDTX set for
  16x16, reference product_coding_loop.c tx-type loop role);
* streams carry the signaled tx types / angle deltas and round-trip the
  verification decoder bit-exactly;
* the search actually uses the new freedom (non-DCT types or nonzero
  deltas appear on suitable content).
"""
import dataclasses

import numpy as np
import pytest

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.codec.decoder import Decoder
from svt_av1_tpu.pipeline import presets


def _frame(w, h, diag=False, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if diag:
        y = 120 + 70 * np.sin((2 * xx + yy) / 13.0)
    else:
        y = (96 + 60 * np.sin(xx / 17.0) + 50 * np.cos(yy / 23.0))
    y = np.clip(y + rng.normal(0, 2, (h, w)), 0, 255).astype(np.uint8)
    u = np.clip(128 + 40 * np.sin(xx[::2, ::2] / 31.0), 0,
                255).astype(np.uint8)
    v = np.clip(128 + 40 * np.cos(yy[::2, ::2] / 29.0), 0,
                255).astype(np.uint8)
    return y, u, v


def _encode(y, u, v, qp=35, **feat_over):
    orig = presets.features_for
    if feat_over:
        presets.features_for = lambda m: dataclasses.replace(
            orig(m), **feat_over)
    try:
        h, w = y.shape
        cfg = EncoderConfig(source_width=w, source_height=h, qp=qp,
                            enc_mode=6)
        enc = Encoder(cfg)
        enc.send_picture(y, u, v, eos=True)
        return enc.get_packet()
    finally:
        presets.features_for = orig


def test_tx_search_roundtrip_and_used():
    y, u, v = _frame(128, 96)
    pkt = _encode(y, u, v, tx_search=True, angle_deltas=False,
                  varpart=False)
    dec = Decoder()
    rec = dec.decode_temporal_unit(pkt.data)[0]
    assert np.array_equal(rec["y"], pkt.recon["y"])
    assert np.array_equal(rec["u"], pkt.recon["u"])
    assert np.array_equal(rec["v"], pkt.recon["v"])
    txs = {d.tx_type for d in rec["decisions"].values()}
    assert txs - {cc.DCT_DCT}, f"tx search never left DCT: {txs}"


def test_angle_deltas_roundtrip_and_used():
    y, u, v = _frame(128, 96, diag=True)
    pkt = _encode(y, u, v, tx_search=True, angle_deltas=True,
                  varpart=False)
    dec = Decoder()
    rec = dec.decode_temporal_unit(pkt.data)[0]
    assert np.array_equal(rec["y"], pkt.recon["y"])
    deltas = {d.angle_delta_y for d in rec["decisions"].values()}
    assert deltas - {0}, f"no nonzero angle deltas on diagonal content"


def test_tx_search_does_not_regress_psnr():
    y, u, v = _frame(128, 96)
    p0 = _encode(y, u, v, tx_search=False, angle_deltas=False,
                 varpart=False)
    p1 = _encode(y, u, v, tx_search=True, angle_deltas=False,
                 varpart=False)

    def psnr(pkt):
        mse = np.mean((pkt.recon["y"].astype(np.float64)[:96, :128]
                       - y) ** 2)
        return 10 * np.log10(255.0 ** 2 / mse)

    # allow a small PSNR dip only if bits drop materially more
    dp = psnr(p1) - psnr(p0)
    db = (len(p1.data) - len(p0.data)) / max(len(p0.data), 1)
    assert dp > -0.6 and (dp > 0 or db < 0), (dp, db)


def _encode_gop(frames, qp=35, **feat_over):
    """IPPP encode of a frame list; returns all packets."""
    orig = presets.features_for
    if feat_over:
        presets.features_for = lambda m: dataclasses.replace(
            orig(m), **feat_over)
    try:
        h, w = frames[0][0].shape
        cfg = EncoderConfig(source_width=w, source_height=h, qp=qp,
                            enc_mode=6, intra_period_length=15,
                            hierarchical_levels=2)
        enc = Encoder(cfg)
        pkts = []
        for i, (y, u, v) in enumerate(frames):
            enc.send_picture(y, u, v, eos=(i == len(frames) - 1))
            p = enc.get_packet()
            if p is not None:
                pkts.append(p)
        while True:
            p = enc.get_packet()
            if p is None:
                break
            pkts.append(p)
        return pkts
    finally:
        presets.features_for = orig


def _adst_residual_scene(n, h=96, w=128):
    """Static texture with an alternating per-16x16 vertical half-sine
    overlay: MC residuals are ADST-basis-shaped (zero at the top edge),
    the class where inter column-ADST types compact better than DCT.
    Per-block amplitudes sweep 6..~96 so that some block's
    coefficient profile favors ADST at whatever qindex the rate
    control lands on."""
    rng = np.random.default_rng(2)
    base = np.kron(rng.integers(60, 200, (h // 8, w // 8))
                   .astype(np.uint8), np.ones((8, 8), np.uint8))
    yy = np.arange(16)
    shape = np.sin(np.pi * (2 * yy + 1) / 34)[:, None] \
        * np.ones((1, 16))
    pat = np.zeros((h, w))
    for bi in range(h // 16):
        for bj in range(w // 16):
            amp = 6 + 5 * (bi * (w // 16) + bj) % 90
            pat[bi * 16:(bi + 1) * 16,
                bj * 16:(bj + 1) * 16] = amp * shape
    pat = pat.astype(np.int32)
    frames = []
    for t in range(n):
        y = np.clip(base.astype(np.int32) + (t % 2) * pat,
                    0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 110, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append((y, u, v))
    return frames


def test_inter_tx_search_roundtrip_and_used():
    """Inter analog of the intra tx-search test (ADVICE r3): the inter
    luma tx-type search must produce decoder-bit-exact streams, with
    the derived chroma tx type (syntax._chroma_tx_type_inter) matching
    the encoder-side chroma transform."""
    frames = _adst_residual_scene(4)
    pkts = _encode_gop(frames, qp=35, tx_search=True,
                       angle_deltas=False, varpart=False)
    # hierarchical GOP: decode everything in packet order, then match
    # display frames to displayed packets (test_gop_hierarchical shape)
    disp = [p for p in pkts if p.displayed]
    assert len(disp) == 4
    dec = Decoder()
    decoded = []
    used_nondct = False
    for pkt in pkts:
        for rec in dec.decode_temporal_unit(pkt.data):
            decoded.append(rec)
            for d in rec.get("decisions", {}).values():
                if getattr(d, "is_inter", False) and \
                        d.tx_type != cc.DCT_DCT:
                    used_nondct = True
    assert len(decoded) == 4
    for i, (p, rec) in enumerate(zip(disp, decoded)):
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)
    assert used_nondct, "inter tx search never left DCT"
