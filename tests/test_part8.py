"""8x8 partition-split (inter pass-A MD alternative, round 4).

* motion-boundary content makes 16x16 blocks split into four 8x8
  leaves with per-sub MVs (product_coding_loop.c d1/d2 partition
  compare role, restricted to SPLIT-at-16);
* streams with splits round-trip the verification decoder bit-exactly
  through DLF (8-px edge masks) and CDEF (8-gran skip);
* the tile coder round-trips hand-built 8x8 inter/intra leaves.
"""
import dataclasses

import numpy as np

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.codec import mv_pred
from svt_av1_tpu.codec.decoder import Decoder
from svt_av1_tpu.codec.syntax import BlockDecision, TileDecoder, TileEncoder
from svt_av1_tpu.pipeline import presets


def _boundary_frames(n, h=96, w=128):
    """Blocky texture whose left part translates 8px/frame while the
    right part is static; the boundary at x=56 crosses 16x16 blocks so
    sub-block MVs win."""
    rng = np.random.default_rng(5)
    base = np.kron(rng.integers(30, 220, (h // 4, (w + 8 * n + 64) // 4))
                   .astype(np.uint8), np.ones((4, 4), np.uint8))
    frames = []
    for t in range(n):
        y = base[:, :w].copy()
        y[:, :56] = base[:, 8 * t:8 * t + 56]
        u = np.full((h // 2, w // 2), 110, np.uint8)
        v = np.full((h // 2, w // 2), 135, np.uint8)
        frames.append((y, u, v))
    return frames


def test_part8_md_and_decoder_recon():
    """Direct MD probe: splits chosen on boundary blocks; the
    verification decoder's batch recon equals the device pre-DLF
    recon bit-exactly."""
    import jax

    from svt_av1_tpu.pipeline import gop_fast as gf
    from svt_av1_tpu.pipeline import intra_encoder as ie
    from svt_av1_tpu.pipeline.inter_encoder import \
        reconstruct_inter_from_decisions
    frames = _boundary_frames(2)
    h, w = frames[0][0].shape
    ref_y, ref_u, ref_v = frames[0]
    src_y, src_u, src_v = frames[1]
    refs = {mv_pred.LAST_FRAME: dict(y=ref_y, u=ref_u, v=ref_v)}
    sp = np.concatenate(
        [src_y, np.concatenate([src_u, src_v], axis=1)], axis=0)
    pend = gf.run_inter_frame(sp, refs, 140, h, w, ie.MODES[:4],
                              split8=True)
    d, _, hdr = gf.collect_inter_frame(pend)
    n8 = sum(1 for b in d.values() if b.bsize == cc.BLOCK_8X8)
    assert n8 >= 4, f"expected split leaves, got {n8}"
    r2 = reconstruct_inter_from_decisions(
        d, refs, w, h, 140, gm=None, interp=hdr["interp"])
    pre = jax.device_get([pend.outs[0], pend.outs[1], pend.outs[2]])
    for a, pl in zip(pre, ("y", "u", "v")):
        assert np.array_equal(a, r2[pl]), pl


def test_part8_e2e_roundtrip():
    """Full API: hierarchical GOP with part8 on — streams with 8x8
    leaves decode bit-exactly through masked DLF + 8-gran CDEF."""
    frames = _boundary_frames(5)
    h, w = frames[0][0].shape
    orig = presets.features_for
    presets.features_for = lambda m: dataclasses.replace(
        orig(m), part8=True)
    try:
        cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
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
    finally:
        presets.features_for = orig
    disp = [p for p in pkts if p.displayed]
    dec = Decoder()
    decoded = []
    n8 = 0
    for p in pkts:
        for rec in dec.decode_temporal_unit(p.data):
            decoded.append(rec)
            n8 += sum(1 for d in rec.get("decisions", {}).values()
                      if d.bsize == cc.BLOCK_8X8)
    assert len(decoded) == len(disp) == 5
    assert n8 > 0, "no 8x8 leaves in the stream"
    for i, (p, rec) in enumerate(zip(disp, decoded)):
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)


def test_tile_coder_8x8_leaves():
    """Hand-built mixed 16/8 leaves (inter with per-sub MVs + intra)
    through the tile coder: symbols and coefficients round-trip."""
    rng = np.random.default_rng(0)
    W = H = 64

    def mk(r4, c4, bsize, is_inter, mv=(0, 0), skip=False):
        n = int(cc.block_size_wide[bsize])
        cn = n // 2
        if skip:
            qy = np.zeros((n, n), np.int32)
            qu = qv = np.zeros((cn, cn), np.int32)
        else:
            qy = rng.integers(-3, 4, (n, n)).astype(np.int32)
            qu = rng.integers(-2, 3, (cn, cn)).astype(np.int32)
            qv = rng.integers(-2, 3, (cn, cn)).astype(np.int32)
        return BlockDecision(
            r4=r4, c4=c4, bsize=bsize, y_mode=cc.DC_PRED,
            uv_mode=cc.DC_PRED, tx_type=cc.DCT_DCT, qcoeff_y=qy,
            qcoeff_u=qu, qcoeff_v=qv, is_inter=is_inter, mv=mv,
            ref=mv_pred.LAST_FRAME)

    for frame_is_intra in (True, False):
        blocks = {}
        for r4 in range(0, 16, 4):
            for c4 in range(0, 16, 4):
                if (r4, c4) in ((0, 0), (8, 8)):
                    for i, (dr, dc) in enumerate(
                            ((0, 0), (0, 2), (2, 0), (2, 2))):
                        blocks[(r4 + dr, c4 + dc)] = mk(
                            r4 + dr, c4 + dc, cc.BLOCK_8X8,
                            not frame_is_intra,
                            mv=(8 * i, -8 * i), skip=(i == 3))
                else:
                    blocks[(r4, c4)] = mk(r4, c4, cc.BLOCK_16X16,
                                          not frame_is_intra, mv=(4, 4))
        enc = TileEncoder(W, H, 80, frame_is_intra=frame_is_intra)
        data = enc.encode(blocks, leaf_size=16, use_native=False)
        out = TileDecoder(W, H, 80,
                          frame_is_intra=frame_is_intra).decode(data)
        assert set(out.keys()) == set(blocks.keys())
        for k, b in blocks.items():
            o = out[k]
            assert o.bsize == b.bsize, k
            assert o.is_inter == b.is_inter, k
            if b.is_inter:
                assert o.mv == b.mv, k
            assert np.array_equal(o.qcoeff_y, b.qcoeff_y), k
            assert np.array_equal(o.qcoeff_u, b.qcoeff_u), k
            assert np.array_equal(o.qcoeff_v, b.qcoeff_v), k
