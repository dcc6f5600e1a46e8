"""Convolve bit-exactness vs reference + ME SSD search sanity."""
import ctypes

import numpy as np
import pytest

from svt_av1_tpu.ops import convolve as cv
from svt_av1_tpu.ops import me

import oracle


class InterpFilterParams(ctypes.Structure):
    _fields_ = [("filter_ptr", ctypes.POINTER(ctypes.c_int16)),
                ("taps", ctypes.c_uint16),
                ("subpel_shifts", ctypes.c_uint16),
                ("interp_filter", ctypes.c_int32)]


class ConvolveParams(ctypes.Structure):
    _fields_ = [("ref", ctypes.c_int32), ("do_average", ctypes.c_int32),
                ("dst", ctypes.c_void_p), ("dst_stride", ctypes.c_int32),
                ("round_0", ctypes.c_int32), ("round_1", ctypes.c_int32),
                ("plane", ctypes.c_int32), ("is_compound", ctypes.c_int32),
                ("use_jnt_comp_avg", ctypes.c_int32),
                ("fwd_offset", ctypes.c_int32),
                ("bck_offset", ctypes.c_int32),
                ("use_dist_wtd_comp_avg", ctypes.c_int32)]


def ref_convolve_2d(lib, window, w, h, sx, sy, kind):
    """window: (h+7, w+7) uint8; integer position at (3,3)."""
    tab = cv.filter_table(kind).astype(np.int16)
    filt = np.ascontiguousarray(tab)
    fp = InterpFilterParams(
        filt.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), 8, 16, kind)
    dst = np.zeros((h, w), dtype=np.uint8)
    cp = ConvolveParams(0, 0, None, 0, 3, 11, 0, 0, 0, 0, 0, 0)
    src = np.ascontiguousarray(window)
    stride = window.shape[1]
    # src pointer at the block's integer position
    src_ptr = src[3:, 3:]
    lib.svt_av1_convolve_2d_sr_c(
        src_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(stride),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(w), ctypes.c_int32(w), ctypes.c_int32(h),
        ctypes.byref(fp), ctypes.byref(fp),
        ctypes.c_int32(sx), ctypes.c_int32(sy), ctypes.byref(cp))
    return dst


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
@pytest.mark.parametrize("kind", [cv.EIGHTTAP_REGULAR, cv.EIGHTTAP_SMOOTH,
                                  cv.MULTITAP_SHARP, cv.BILINEAR])
def test_convolve_2d_bitexact(kind):
    lib = oracle.load()
    rng = np.random.default_rng(kind)
    for (w, h) in [(8, 8), (16, 16), (32, 16), (64, 64)]:
        wins, sxs, sys_, refs = [], [], [], []
        for _ in range(4):
            win = rng.integers(0, 256, (h + 7, w + 7)).astype(np.uint8)
            sx = int(rng.integers(0, 16))
            sy = int(rng.integers(0, 16))
            refs.append(ref_convolve_2d(lib, win, w, h, sx, sy, kind))
            wins.append(win)
            sxs.append(sx)
            sys_.append(sy)
        got = np.asarray(cv.convolve_2d_sr(
            np.stack(wins).astype(np.int32), np.array(sxs, np.int32),
            np.array(sys_, np.int32), w, h, kind, kind))
        for i in range(4):
            assert np.array_equal(got[i], refs[i].astype(np.int32)), \
                (kind, w, h, sxs[i], sys_[i])


def test_ssd_search_matches_numpy():
    rng = np.random.default_rng(0)
    b, h, w, wh, ww = 3, 16, 16, 31, 31
    src = rng.integers(0, 256, (b, h, w)).astype(np.int32)
    win = rng.integers(0, 256, (b, wh, ww)).astype(np.int32)
    # plant an exact match at a known offset
    win[1, 5:5 + h, 9:9 + w] = src[1]
    cost = np.asarray(me.ssd_search(src, win))
    # numpy reference
    for bi in range(b):
        for dy in range(wh - h + 1):
            for dx in range(ww - w + 1):
                ref = ((win[bi, dy:dy + h, dx:dx + w] - src[bi]) ** 2).sum()
                assert abs(cost[bi, dy, dx] - ref) <= 1e-3 * max(ref, 1), \
                    (bi, dy, dx)
    mv_y, mv_x, c = me.best_mv(cost, 0, 0)
    assert (int(mv_y[1]), int(mv_x[1])) == (5, 9)
    assert float(c[1]) == 0.0


def test_variance_and_downsample():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (4, 8, 8)).astype(np.int32)
    mean, var = me.block_variance(x)
    m = np.asarray(mean)
    v = np.asarray(var)
    for i in range(4):
        assert m[i] == x[i].sum() // 64
        assert v[i] == (x[i].astype(np.int64) ** 2).sum() // 64 - m[i] * m[i]
    d = np.asarray(me.downsample2(x))
    assert d.shape == (4, 4, 4)
    assert d[0, 0, 0] == (int(x[0, 0, 0]) + x[0, 0, 1] + x[0, 1, 0]
                          + x[0, 1, 1] + 2) >> 2
