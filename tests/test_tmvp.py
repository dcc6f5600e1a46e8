"""Temporal MV prediction (spec 7.9 motion-field projection + 7.10.2
temporal scan), round 4.

Unit: projection math vs hand values.  E2E: hierarchical GOPs with
use_ref_frame_mvs=1 round-trip the verification decoder bit-exactly
(the stack derivation must match on both sides), and the sequence/frame
header bits carry the flag.
"""
import dataclasses

import numpy as np

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec import mv_pred
from svt_av1_tpu.codec.decoder import Decoder
from svt_av1_tpu.pipeline import presets


def test_mv_projection_math():
    # num/den scaling with the div_mult table and signed rounding
    assert mv_pred.get_mv_projection((64, -64), 1, 2) == (32, -32)
    assert mv_pred.get_mv_projection((100, 0), 2, 3) == (67, 0)
    assert mv_pred.get_mv_projection((-100, 0), 2, 3) == (-67, 0)
    # clamp at +-(1<<14)-1
    assert mv_pred.get_mv_projection((4000, 0), 31, 1)[0] == 16383
    # precision lowering drops the hp bit toward zero
    assert mv_pred.lower_mv_precision((5, -5), False) == (4, -4)
    assert mv_pred.lower_mv_precision((5, -5), True) == (5, -5)


def test_relative_dist_wraps():
    assert mv_pred.get_relative_dist(7, 3, 1) == 2
    assert mv_pred.get_relative_dist(7, 1, 127) == 2   # wraparound
    assert mv_pred.get_relative_dist(7, 127, 1) == -2


def test_projection_fills_field():
    """A LAST frame whose blocks all moved (0, -16) 1/8-pel relative to
    its own LAST projects a nonzero motion field."""
    r8 = c8 = 8
    mvs = np.zeros((r8, c8, 2), np.int16)
    mvs[..., 1] = -16
    refs = np.full((r8, c8), mv_pred.LAST_FRAME, np.int8)
    field = mv_pred.FrameMotionField(
        mvs=mvs, refs=refs, ref_order_hints=(1, 1, 1, 1, 1, 1, 1),
        order_hint=2, is_intra=False)
    # every current ref maps to the LAST frame (hint 2); LAST's saved
    # ALTREF hint (1) != current GOLDEN hint (2), so no overlay skip
    tm = mv_pred.setup_motion_field(
        {mv_pred.LAST_FRAME: field},
        {e: 2 for e in range(1, 8)},
        3, 7, r8 * 2, c8 * 2, allow_hp=False)
    assert (tm.ref_offset > 0).any()
    assert (tm.mfmv[..., 1][tm.ref_offset > 0] == -16).all()


def test_projection_block_offset_shift():
    """get_block_position converts the projected 1/8-pel MV to 8x8-block
    units with >>(4 + MI_SIZE_LOG2) == 6 (md_config_process.c:361), NOT
    >>7: an MV of -128 (1/8-pel) = -16 px must land 2 blocks away."""
    r8 = c8 = 8
    mvs = np.zeros((r8, c8, 2), np.int16)
    refs = np.full((r8, c8), 0, np.int8)   # INTRA everywhere else
    mvs[3, 3] = (0, -128)                  # -16 px horizontal
    refs[3, 3] = mv_pred.LAST_FRAME
    field = mv_pred.FrameMotionField(
        mvs=mvs, refs=refs, ref_order_hints=(1, 1, 1, 1, 1, 1, 1),
        order_hint=2, is_intra=False)
    tm = mv_pred.setup_motion_field(
        {mv_pred.LAST_FRAME: field},
        {e: 2 for e in range(1, 8)},
        3, 7, r8 * 2, c8 * 2, allow_hp=False)
    filled = np.argwhere(tm.ref_offset > 0)
    # LAST projects with dir=2 -> sign_bias=1 -> col = bc - co where
    # co = -((128) >> 6) = -2, so the write lands at (3, 5)
    assert filled.tolist() == [[3, 5]]
    assert tuple(tm.mfmv[3, 5]) == (0, -128)


def _pan_frames(n, h=96, w=128):
    rng = np.random.default_rng(3)
    base = np.kron(rng.integers(30, 220, (h // 4, (w + 2 * n + 32) // 4))
                   .astype(np.uint8), np.ones((4, 4), np.uint8))
    frames = []
    for t in range(n):
        y = base[:, 2 * t:2 * t + w].copy()
        u = np.full((h // 2, w // 2), 110, np.uint8)
        v = np.full((h // 2, w // 2), 135, np.uint8)
        frames.append((y, u, v))
    return frames


def test_tmvp_e2e_roundtrip():
    frames = _pan_frames(8)
    h, w = frames[0][0].shape
    orig = presets.features_for
    presets.features_for = lambda m: dataclasses.replace(
        orig(m), tmvp=True)
    try:
        cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                            enc_mode=6, intra_period_length=15,
                            hierarchical_levels=2, enable_tf=0)
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
    for p in pkts:
        decoded.extend(dec.decode_temporal_unit(p.data))
    assert dec.sp.enable_ref_frame_mvs
    assert len(decoded) == len(disp) == len(frames)
    for i, (p, rec) in enumerate(zip(disp, decoded)):
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)
