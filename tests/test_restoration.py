"""Wiener restoration filter bit-exactness vs reference."""
import ctypes

import numpy as np
import pytest

from svt_av1_tpu.ops import restoration

import oracle


class ConvolveParams(ctypes.Structure):
    _fields_ = [("ref", ctypes.c_int32), ("do_average", ctypes.c_int32),
                ("dst", ctypes.c_void_p), ("dst_stride", ctypes.c_int32),
                ("round_0", ctypes.c_int32), ("round_1", ctypes.c_int32),
                ("plane", ctypes.c_int32), ("is_compound", ctypes.c_int32),
                ("use_jnt_comp_avg", ctypes.c_int32),
                ("fwd_offset", ctypes.c_int32),
                ("bck_offset", ctypes.c_int32),
                ("use_dist_wtd_comp_avg", ctypes.c_int32)]


def aligned_kernel_table(taps8):
    """InterpKernel[16] in a 256-byte-aligned buffer; kernel at index 0."""
    raw = np.zeros(16 * 8 + 128, dtype=np.int16)
    addr = raw.ctypes.data
    off_bytes = (-addr) % 256
    off = off_bytes // 2
    table = raw[off:off + 16 * 8].reshape(16, 8)
    table[0] = taps8
    return raw, table


def wiener_taps(rng):
    """Legal-ish symmetric 7-tap wiener kernel summing to 128."""
    a, b, c = int(rng.integers(-5, 10)), int(rng.integers(-23, 8)), \
        int(rng.integers(-17, 46))
    center = 128 - 2 * (a + b + c)
    return np.array([a, b, c, center, c, b, a, 0], dtype=np.int16)


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
def test_wiener_bitexact():
    lib = oracle.load()
    fn = lib.svt_av1_wiener_convolve_add_src_c
    fn.restype = None
    rng = np.random.default_rng(0)
    w = h = 16
    wins, fxs, fys, refs = [], [], [], []
    for _ in range(8):
        win = rng.integers(0, 256, (h + 6, w + 7)).astype(np.uint8)
        tx = wiener_taps(rng)
        ty = wiener_taps(rng)
        rawx, tabx = aligned_kernel_table(tx)
        rawy, taby = aligned_kernel_table(ty)
        dst = np.zeros((h, w), dtype=np.uint8)
        cp = ConvolveParams(0, 0, None, 0, restoration.WIENER_ROUND0,
                            restoration.WIENER_ROUND1, 0, 0, 0, 0, 0, 0)
        src = np.ascontiguousarray(win)
        # src pointer at block origin (3, 3)
        sp = src[3:, 3:]
        fn(sp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           ctypes.c_ssize_t(w + 7),
           dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           ctypes.c_ssize_t(w),
           tabx.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
           taby.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
           ctypes.c_int32(w), ctypes.c_int32(h), ctypes.byref(cp))
        wins.append(win.astype(np.int32))
        fxs.append(tx.astype(np.int32))
        fys.append(ty.astype(np.int32))
        refs.append(dst.astype(np.int32))
    got = np.asarray(restoration.wiener_filter(
        np.stack(wins), np.stack(fxs), np.stack(fys), w, h))
    for i in range(8):
        assert np.array_equal(got[i], refs[i]), i


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
@pytest.mark.parametrize("eps", [0, 5, 9, 11, 14])
def test_selfguided_bitexact(eps):
    lib = oracle.load()
    fn = lib.svt_av1_selfguided_restoration_c
    fn.restype = None
    rng = np.random.default_rng(eps)
    w = h = 16
    for trial in range(4):
        ext = rng.integers(0, 256, (h + 6, w + 6)).astype(np.uint8)
        flt0 = np.zeros((h, w), dtype=np.int32)
        flt1 = np.zeros((h, w), dtype=np.int32)
        src = np.ascontiguousarray(ext)
        origin = src[3:, 3:]
        fn(origin.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           ctypes.c_int32(w), ctypes.c_int32(h), ctypes.c_int32(w + 6),
           flt0.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
           flt1.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
           ctypes.c_int32(w), ctypes.c_int32(eps), ctypes.c_int32(8),
           ctypes.c_int32(0))
        g0, g1 = restoration.selfguided_restoration(
            ext[None].astype(np.int32), eps, h, w)
        r0, r1 = [int(v) for v in
                  restoration._sgr_tables()["sgr_params"][eps][:2]]
        if r0 > 0:
            assert np.array_equal(np.asarray(g0)[0], flt0), (eps, trial, 0)
        if r1 > 0:
            assert np.array_equal(np.asarray(g1)[0], flt1), (eps, trial, 1)


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
def test_apply_selfguided_bitexact():
    lib = oracle.load()
    fn = lib.svt_apply_selfguided_restoration_c
    fn.restype = None
    rng = np.random.default_rng(42)
    w = h = 16
    for eps, xqd in [(3, (12, 50)), (11, (0, 60)), (15, (30, 0))]:
        ext = rng.integers(0, 256, (h + 6, w + 6)).astype(np.uint8)
        src = np.ascontiguousarray(ext)
        origin = src[3:, 3:]
        dst = np.zeros((h, w), dtype=np.uint8)
        xq = (ctypes.c_int32 * 2)(*xqd)
        # 2 x RESTORATION_UNITPELS_MAX (~406x398) with slack
        tmp = np.zeros(2 * 420 * 420, dtype=np.int32)
        fn(origin.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           ctypes.c_int32(w), ctypes.c_int32(h), ctypes.c_int32(w + 6),
           ctypes.c_int32(eps), xq,
           dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           ctypes.c_int32(w),
           tmp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
           ctypes.c_int32(8), ctypes.c_int32(0))
        got = np.asarray(restoration.apply_selfguided(
            ext[None].astype(np.int32), eps,
            np.array([xqd[0]]), np.array([xqd[1]]), h, w))[0]
        assert np.array_equal(got, dst.astype(np.int32)), eps
