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
