"""MV entropy coding round-trip + MV-prediction stack construction."""
import numpy as np

from svt_av1_tpu.codec import mv as mvc
from svt_av1_tpu.codec import mv_pred as mvp
from svt_av1_tpu.codec.entropy import RangeDecoder, RangeEncoder


def test_mv_class_decomposition():
    for z in range(0, 4000):
        c, off = mvc.get_mv_class(z)
        base = (mvc.CLASS0_SIZE << (c + 2)) if c else 0
        assert base + off == z
        if c == 0:
            assert off < 16
        else:
            assert off < base  # next class starts at 2*base


def test_mv_roundtrip_low_precision():
    rng = np.random.default_rng(7)
    nmv_e = mvc.NmvCDFs()
    nmv_d = mvc.NmvCDFs()
    enc = RangeEncoder()
    ref = (0, 0)
    mvs = []
    for _ in range(500):
        raw = (int(rng.integers(-2048, 2049)), int(rng.integers(-2048, 2049)))
        m = mvc.lower_mv_precision(raw)
        assert m[0] % 2 == 0 and m[1] % 2 == 0
        mvc.encode_mv(enc, m, ref, nmv_e)
        mvs.append(m)
        ref = m
    data = enc.done()
    dec = RangeDecoder(data)
    ref = (0, 0)
    for m in mvs:
        got = mvc.decode_mv(dec, ref, nmv_d)
        assert got == m
        ref = m
    assert np.array_equal(nmv_e.joints, nmv_d.joints)
    for k in nmv_e.comps[0]:
        assert np.array_equal(nmv_e.comps[0][k], nmv_d.comps[0][k])


def test_mv_roundtrip_integer_precision():
    nmv_e = mvc.NmvCDFs()
    nmv_d = mvc.NmvCDFs()
    enc = RangeEncoder()
    cases = [(-4096, 4096), (8, -8), (0, 8), (2040, 0), (0, 0)]
    for m in cases:
        mvc.encode_mv(enc, m, (0, 0), nmv_e,
                      precision=mvc.MV_SUBPEL_NONE)
    dec = RangeDecoder(enc.done())
    for m in cases:
        assert mvc.decode_mv(dec, (0, 0), nmv_d,
                             precision=mvc.MV_SUBPEL_NONE) == m


def test_lower_mv_precision_integer():
    assert mvc.lower_mv_precision((13, -13), mvc.MV_SUBPEL_NONE) == (16, -16)
    assert mvc.lower_mv_precision((12, -12), mvc.MV_SUBPEL_NONE) == (8, -8)
    assert mvc.lower_mv_precision((4, -4), mvc.MV_SUBPEL_NONE) == (0, 0)


def _grid(mi=16):
    return mvp.MiGrid(mi, mi)


def test_mv_stack_empty_frame_top_left():
    g = _grid()
    st = mvp.find_mv_stack(g, 0, 0, 4, 4)
    assert len(st.mvs) >= 2
    assert st.mvs[0] == (0, 0) and st.mvs[1] == (0, 0)
    assert st.mode_context == 0


def test_mv_stack_single_above_neighbor():
    g = _grid()
    g.set_block(0, 0, 4, 4, mvp.LAST_FRAME, mvp.NEWMV, 16, -24)
    st = mvp.find_mv_stack(g, 4, 0, 4, 4)
    assert st.mvs[0] == (16, -24)
    # nearest_match == 1 with a NEWMV neighbor -> newmv ctx bits = 2
    assert st.mode_context & mvp.GLOBALMV_OFFSET == 2
    assert (st.mode_context >> mvp.REFMV_OFFSET) == 3


def test_mv_stack_weight_orders_candidates():
    g = _grid()
    # left col: all one MV (tall support); above row: another MV
    g.set_block(4, 0, 4, 4, mvp.LAST_FRAME, mvp.NEARESTMV, 8, 8)
    g.set_block(0, 4, 4, 4, mvp.LAST_FRAME, mvp.NEARESTMV, -8, -8)
    st = mvp.find_mv_stack(g, 4, 4, 4, 4)
    assert set(st.mvs[:2]) == {(8, 8), (-8, -8)}
    # both spatial rows matched at nearest ring
    assert (st.mode_context >> mvp.REFMV_OFFSET) == 5


def test_mv_stack_globalmv_maps_to_zero():
    g = _grid()
    g.set_block(0, 0, 4, 4, mvp.LAST_FRAME, mvp.GLOBALMV, 40, 40)
    st = mvp.find_mv_stack(g, 4, 0, 4, 4)
    assert st.mvs[0] == (0, 0)


def test_mv_stack_clamp():
    g = _grid()
    g.set_block(0, 0, 4, 4, mvp.LAST_FRAME, mvp.NEWMV, -32760, -32760)
    st = mvp.find_mv_stack(g, 4, 0, 4, 4)
    r, c = st.mvs[0]
    # clamped into [to_top - bh*8 - MV_BORDER, ...]
    assert r == -(4 * 4 * 8) - 16 * 8 * 8 - mvp.MV_BORDER + 0 or r > -32760
    assert r >= -(4 * 4 * 8) - 16 * 8 - mvp.MV_BORDER - 16 * 8 * 8


def test_has_top_right_pattern():
    # within a 64x64 SB (sb_mi=16) of 16x16 blocks (bs=4):
    # block at (0,0): TR available; at (4,4): not (odd row+col at bs)
    assert mvp._has_top_right(4, 0, 4, 4, 16, 64) == 1
    assert mvp._has_top_right(4, 4, 4, 4, 16, 64) == 0
    # mi_row == 0: row above is outside the frame -> unavailable
    assert mvp._has_top_right(0, 4, 4, 4, 16, 64) == 0
    assert mvp._has_top_right(8, 0, 4, 4, 16, 64) == 1
    # (12,8)'s TR quadrant (8,12) precedes it in z-order -> available
    assert mvp._has_top_right(12, 8, 4, 4, 16, 64) == 1
    assert mvp._has_top_right(12, 4, 4, 4, 16, 64) == 0
