"""Masked compound: COMPOUND_WEDGE + COMPOUND_DIFFWTD
(ops/wedge.py, ops/convolve.py, syntax, MD).

Behavioral reference: inter_prediction.c:1436-1520 (spec master mask
tables), :1982-2100 (mask construction), blend_a64_mask.c
svt_aom_lowbd_blend_a64_d16_mask_c (CONV_BUF-domain blend),
C_DEFAULT/inter_prediction_c.c:15-40 (diffwtd d16 mask),
entropy_coding.c:5146-5200 (comp_group_idx / compound_type / wedge /
mask_type syntax).
"""
import numpy as np
import pytest

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec.decoder import Decoder
from svt_av1_tpu.ops.wedge import masks_16, masks_16_uv, wedge_blend


def test_wedge_mask_invariants():
    """Spec-derived mask properties: range, sign complement, the
    vertical wedge boundary position, chroma subsample rounding."""
    assert masks_16.shape == (2, 16, 16, 16)
    assert masks_16.min() >= 0 and masks_16.max() <= 64
    # index [1] is the complement of index [0] (same codebook entry)
    assert np.all(masks_16[0].astype(int) + masks_16[1].astype(int)
                  == 64)
    # codebook entry 6 = (VERTICAL, x_offset 2, 4): the 0/64 transition
    # sits at x = 2 * 16 / 8 = 4 on every row
    v = masks_16[0, 6]
    assert np.all(v[:, 0] == 64) and np.all(v[:, -1] == 0)
    assert np.all(v == v[0][None, :])   # vertical: rows identical
    # chroma = (4 luma taps + 2) >> 2
    m = masks_16.astype(np.int32)
    expect = (m[..., ::2, ::2] + m[..., 1::2, ::2]
              + m[..., ::2, 1::2] + m[..., 1::2, 1::2] + 2) >> 2
    assert np.array_equal(masks_16_uv, expect.astype(np.uint8))


def test_wedge_blend_endpoints():
    p0 = np.full((16, 16), 200, np.int32)
    p1 = np.full((16, 16), 40, np.int32)
    m = masks_16[0, 1].astype(np.int32)
    b = wedge_blend(p0, p1, m)
    assert b[m == 64].min() == b[m == 64].max() == 200
    assert b[m == 0].min() == b[m == 0].max() == 40
    mid = b[(m > 0) & (m < 64)]
    assert mid.min() > 40 and mid.max() < 200


def _smooth(a):
    a = np.pad(a, 1, mode="edge")
    return ((a[:-2, :-2] + a[:-2, 1:-1] + a[:-2, 2:] + a[1:-1, :-2]
             + a[1:-1, 1:-1] + a[1:-1, 2:] + a[2:, :-2] + a[2:, 1:-1]
             + a[2:, 2:]) / 9)


def test_wedge_e2e_wipe_roundtrip():
    """A wipe transition makes wedge the RD winner on boundary blocks
    (one ref per side of the mask); the stream must code
    comp_group_idx/compound_type/wedge syntax and decode bit-exactly
    with the CONV_BUF-domain masked blend."""
    rng = np.random.default_rng(5)
    h = w = 64
    sceneA = _smooth(rng.integers(0, 255, (h, w)).astype(np.float32)) \
        .astype(np.uint8)
    sceneB = _smooth(rng.integers(0, 255, (h, w)).astype(np.float32)) \
        .astype(np.uint8)
    n = 5
    frames = []
    for t in range(n):
        y = sceneA.copy()
        cut = min(w, 13 * t)
        y[:, :cut] = sceneB[:, :cut]
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 135, np.uint8)
        frames.append((y, u, v))
    cfg = EncoderConfig(source_width=w, source_height=h, qp=45,
                        intra_period_length=31, hierarchical_levels=2,
                        enc_mode=6, enable_tf=0)
    enc = Encoder(cfg)
    for i, (y, u, v) in enumerate(frames):
        enc.send_picture(y, u, v, eos=(i == n - 1))
    pkts = []
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    disp = [p for p in pkts if p.displayed]
    dec = Decoder()
    decoded = []
    wedges = 0
    for p in pkts:
        for rec in dec.decode_temporal_unit(p.data):
            decoded.append(rec)
            for d in rec.get("decisions", {}).values():
                if d.is_inter and d.ref2 and d.comp_type:
                    wedges += 1
    assert len(decoded) == n
    for i, (p, rec) in enumerate(zip(disp, decoded)):
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)
    assert wedges > 0, "expected COMPOUND_WEDGE winners on the wipe"


def test_diffwtd_e2e_iris_roundtrip(monkeypatch):
    """COMPOUND_DIFFWTD: with wedge priced out, the difference-derived
    mask wins on an irregular (iris) transition; mask_type syntax codes
    and the d16 diffwtd mask reproduces bit-exactly in the decoder.
    Uses an 80x80 frame so the monkeypatched rate constant is traced
    into a fresh p1 program (the jit cache is keyed by shape)."""
    import svt_av1_tpu.pipeline.gop_fast as gf
    monkeypatch.setattr(gf, "_WEDGE_EXTRA_BITS", 1e7)
    rng = np.random.default_rng(5)
    h = w = 80
    sceneA = _smooth(rng.integers(0, 255, (h, w)).astype(np.float32)) \
        .astype(np.uint8)
    sceneB = _smooth(rng.integers(0, 255, (h, w)).astype(np.float32)) \
        .astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    n = 5
    frames = []
    for t in range(n):
        y = sceneA.copy()
        r = 14 * t
        m = (yy - 40) ** 2 + (xx - 40) ** 2 <= r * r
        y[m] = sceneB[m]
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 135, np.uint8)
        frames.append((y, u, v))
    cfg = EncoderConfig(source_width=w, source_height=h, qp=45,
                        intra_period_length=31, hierarchical_levels=2,
                        enc_mode=6, enable_tf=0)
    enc = Encoder(cfg)
    # pin order hints off: the skip_mode candidate otherwise out-RDs
    # the diffwtd blocks this test needs (skip_mode has its own test)
    enc.sp.enable_order_hint = False
    for i, (y, u, v) in enumerate(frames):
        enc.send_picture(y, u, v, eos=(i == n - 1))
    pkts = []
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    disp = [p for p in pkts if p.displayed]
    dec = Decoder()
    decoded = []
    diffwtd = 0
    for p in pkts:
        for rec in dec.decode_temporal_unit(p.data):
            decoded.append(rec)
            for d in rec.get("decisions", {}).values():
                if d.is_inter and d.ref2 and d.comp_type == 2:
                    diffwtd += 1
    assert len(decoded) == n
    for i, (p, rec) in enumerate(zip(disp, decoded)):
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)
    assert diffwtd > 0, "expected COMPOUND_DIFFWTD winners"
