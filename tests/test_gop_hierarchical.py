"""Hierarchical (random access) GOP: mini-GoP scheduling, multi-ref DPB,
show_existing display, CDF chaining across slots — encoder recon must
equal decoder output frame by frame in display order."""
import numpy as np
import pytest

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec.decoder import Decoder
from svt_av1_tpu.pipeline import gop


def test_minigop_schedule_dyadic():
    ev = gop.minigop_schedule(0, 4)
    kinds = [(e.poc, type(e).__name__) for e in ev]
    assert kinds == [(4, "CodeEvent"), (2, "CodeEvent"), (1, "CodeEvent"),
                     (2, "ShowEvent"), (3, "CodeEvent"), (4, "ShowEvent")]
    c4, c2, c1, _, c3, _ = ev
    assert (c4.last_poc, c4.bwd_poc, c4.shown) == (0, None, False)
    assert (c2.last_poc, c2.bwd_poc, c2.shown) == (0, 4, False)
    assert (c1.last_poc, c1.bwd_poc, c1.shown) == (0, 2, True)
    assert (c3.last_poc, c3.bwd_poc, c3.shown) == (2, 4, True)
    assert not c1.store and not c3.store and c2.store and c4.store


def test_minigop_schedule_nondyadic():
    for n in (1, 2, 3, 5, 6, 7):
        ev = gop.minigop_schedule(10, n)
        shows = [e.poc for e in ev if isinstance(e, gop.ShowEvent)]
        codes = [e.poc for e in ev if isinstance(e, gop.CodeEvent)]
        assert sorted(codes) == list(range(11, 11 + n))
        # display order = shown-at-code + show_existing = 11..10+n
        disp = []
        for e in ev:
            if isinstance(e, gop.CodeEvent) and e.shown:
                disp.append(e.poc)
            elif isinstance(e, gop.ShowEvent):
                disp.append(e.poc)
        assert disp == list(range(11, 11 + n))


def _frames(n, h=64, w=64, seed=3):
    rng = np.random.default_rng(seed)
    base_y = rng.integers(0, 200, (h, w)).astype(np.int32)
    base_u = rng.integers(0, 200, (h // 2, w // 2)).astype(np.int32)
    base_v = rng.integers(0, 200, (h // 2, w // 2)).astype(np.int32)
    out = []
    for t in range(n):
        # smooth global motion + noise: inter prediction is useful
        y = np.clip(np.roll(base_y, t, axis=1)
                    + rng.integers(-3, 4, (h, w)), 0, 255)
        u = np.clip(base_u + rng.integers(-2, 3, base_u.shape), 0, 255)
        v = np.clip(base_v + rng.integers(-2, 3, base_v.shape), 0, 255)
        out.append((y.astype(np.uint8), u.astype(np.uint8),
                    v.astype(np.uint8)))
    return out


@pytest.mark.parametrize("levels,n", [(2, 9), (3, 9)])
def test_hier_roundtrip(levels, n):
    frames = _frames(n)
    cfg = EncoderConfig(source_width=64, source_height=64, qp=30,
                        intra_period_length=31,
                        hierarchical_levels=levels)
    enc = Encoder(cfg)
    for i, (y, u, v) in enumerate(frames):
        enc.send_picture(y, u, v, eos=(i == n - 1))
    pkts = []
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    # every displayed poc exactly once, in order
    disp = [p for p in pkts if p.displayed]
    assert [p.pts for p in disp] == list(range(n))
    # decode and compare display output to encoder recon bit-exactly
    dec = Decoder()
    decoded = []
    for p in pkts:
        decoded.extend(dec.decode_temporal_unit(p.data))
    assert len(decoded) == n
    for i, (p, rec) in enumerate(zip(disp, decoded)):
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)


def test_hier_uses_backward_ref():
    from svt_av1_tpu.codec import mv_pred
    from svt_av1_tpu.pipeline import inter_encoder
    rng = np.random.default_rng(0)
    h = w = 64
    # future ref matches source; past ref is noise -> ALTREF must win
    src = rng.integers(0, 255, (h, w)).astype(np.uint8)
    su = rng.integers(0, 255, (h // 2, w // 2)).astype(np.uint8)
    noise = rng.integers(0, 255, (h, w)).astype(np.uint8)
    past = dict(y=noise, u=su, v=su)
    fut = dict(y=src, u=su, v=su)
    decisions, recon, _gm, _interp = inter_encoder.encode_inter_frame(
        src, su, su, {mv_pred.LAST_FRAME: past,
                      mv_pred.ALTREF_FRAME: fut}, 120)
    refs = {d.ref for d in decisions.values() if d.is_inter}
    assert mv_pred.ALTREF_FRAME in refs


def test_hier_fast_merge32_roundtrip():
    """Pure-translation content: inter blocks go skip with one shared
    MV, the fast path merges 2x2 groups into BLOCK_32X32 skip leaves
    (partition-level rate win), and the bitstream must still decode
    bit-exactly with mask-aware DLF on both sides."""
    rng = np.random.default_rng(9)
    h = w = 64
    base = rng.integers(30, 220, (h, w)).astype(np.uint8)
    u0 = rng.integers(60, 190, (h // 2, w // 2)).astype(np.uint8)
    n = 6
    # static textured background (zero-MV all-skip groups merge) plus a
    # small moving square so DLF edges and non-skip leaves stay live;
    # full-frame translation is too marginal — the inter tx-type search
    # can flip a single borderline block to coded and break every group
    frames = []
    for t in range(n):
        y = base.copy()
        y[4:12, 2 * t:2 * t + 8] = 235
        frames.append((y, u0.copy(), u0.copy()))
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        intra_period_length=31, hierarchical_levels=2,
                        enc_mode=6, enable_dlf_flag=True, cdef_level=1)
    enc = Encoder(cfg)
    assert enc._fast
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
    merged = 0
    for p in pkts:
        for rec in dec.decode_temporal_unit(p.data):
            decoded.append(rec)
            from svt_av1_tpu.codec import constants as cc
            if "decisions" in rec:
                merged += sum(1 for d in rec["decisions"].values()
                              if d.bsize == cc.BLOCK_32X32
                              and d.is_inter)
    assert len(decoded) == n
    for i, (p, rec) in enumerate(zip(disp, decoded)):
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)
    assert merged > 0, "expected 32x32 skip-merge leaves"


def test_hier_fast_filters_roundtrip():
    """The fused fast-GOP path (pipeline/gop_fast.py) with the full
    tool set the quality bench uses — TPL + DLF search + CDEF — must
    stay bit-exact decoder vs recon across a keyframe boundary."""
    n = 10
    frames = _frames(n)
    cfg = EncoderConfig(source_width=64, source_height=64, qp=35,
                        intra_period_length=7, hierarchical_levels=2,
                        enc_mode=6, enable_tpl_la=1,
                        enable_dlf_flag=True, cdef_level=1)
    enc = Encoder(cfg)
    assert enc._fast
    for i, (y, u, v) in enumerate(frames):
        enc.send_picture(y, u, v, eos=(i == n - 1))
    pkts = []
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    disp = [p for p in pkts if p.displayed]
    assert [p.pts for p in disp] == list(range(n))
    dec = Decoder()
    decoded = []
    for p in pkts:
        decoded.extend(dec.decode_temporal_unit(p.data))
    assert len(decoded) == n
    for i, (p, rec) in enumerate(zip(disp, decoded)):
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)


def test_hier_fast_hp_mv_roundtrip(monkeypatch):
    """1/8-pel MVs (allow_high_precision_mv): the pass-A refinement
    ring finds odd MVs on subpel motion, the NMV hp bits code them,
    and the stream decodes bit-exactly."""
    import dataclasses
    import svt_av1_tpu.pipeline.presets as presets
    orig = presets.features_for
    monkeypatch.setattr(
        presets, "features_for",
        lambda m: dataclasses.replace(orig(m), hp_mv=True))

    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    n = 5
    frames = []
    for t in range(n):
        # smooth sinusoid panning 0.6 px/frame: true motion is subpel
        y = np.clip(110 + 70 * np.sin((xx + 0.6 * t) / 5.0)
                    + 40 * np.cos(yy / 7.0), 0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        frames.append((y, u.copy(), u.copy()))
    cfg = EncoderConfig(source_width=w, source_height=h, qp=30,
                        intra_period_length=31, hierarchical_levels=2,
                        enc_mode=6, enable_tf=0)
    enc = Encoder(cfg)
    # pin order hints off: the skip_mode candidate otherwise out-RDs
    # the NEWMV blocks this test needs (skip_mode has its own e2e test)
    enc.sp.enable_order_hint = False
    assert enc._fast and enc._feat.hp_mv
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
    odd = 0
    for p in pkts:
        for rec in dec.decode_temporal_unit(p.data):
            decoded.append(rec)
            for d in rec.get("decisions", {}).values():
                if d.is_inter and ((d.mv[0] | d.mv[1]) & 1):
                    odd += 1
    assert len(decoded) == n
    for i, (p, rec) in enumerate(zip(disp, decoded)):
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)
    assert odd > 0, "expected odd (1/8-pel) MVs on subpel motion"


def test_dynamic_minigop_shrinks_on_activity():
    """High-activity content (strong per-frame histogram change below
    the scene-cut threshold) halves the mini-GoP pyramid
    (pd_process.c dynamic GoP role) and the stream still decodes."""
    rng = np.random.default_rng(11)
    h = w = 64
    frames = []
    base = rng.integers(30, 220, (h, w)).astype(np.uint8)
    for t in range(9):
        # strong flicker: big AHD but stable mean (not a scene cut)
        y = np.clip(base.astype(np.int32)
                    + (40 if t % 2 else -40), 0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 100, np.uint8)
        frames.append((y, u, u.copy()))
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        intra_period_length=31, hierarchical_levels=2,
                        enc_mode=10, enable_tf=0)
    enc = Encoder(cfg)
    for i, (y, u, v) in enumerate(frames):
        enc.send_picture(y, u, v, eos=(i == len(frames) - 1))
    pkts = []
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    disp = [p for p in pkts if p.displayed]
    assert [p.pts for p in disp] == list(range(9))
    dec = Decoder()
    decoded = []
    for p in pkts:
        decoded.extend(dec.decode_temporal_unit(p.data))
    assert len(decoded) == 9
    for i, (p, rec) in enumerate(zip(disp, decoded)):
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)
