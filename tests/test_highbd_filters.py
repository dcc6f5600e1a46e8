"""10-bit CDEF and restoration bit-exactness vs the reference C
(highbd kernels use SVT's CONVERT_TO_BYTEPTR convention: the uint8*
argument carries the real uint16 address >> 1)."""
import ctypes
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import oracle  # noqa: E402

from svt_av1_tpu.ops import cdef, restoration  # noqa: E402

CDEF_BSTRIDE = 144  # ALIGN_POWER_OF_TWO(128 + 2*8, 3)
BLOCK_8X8 = 3


def _byteptr(arr: np.ndarray) -> ctypes.c_void_p:
    addr = arr.ctypes.data
    assert addr % 2 == 0
    return ctypes.c_void_p(addr >> 1)


class ConvolveParams(ctypes.Structure):
    _fields_ = [("ref", ctypes.c_int32), ("do_average", ctypes.c_int32),
                ("dst", ctypes.c_void_p), ("dst_stride", ctypes.c_int32),
                ("round_0", ctypes.c_int32), ("round_1", ctypes.c_int32),
                ("plane", ctypes.c_int32), ("is_compound", ctypes.c_int32),
                ("use_jnt_comp_avg", ctypes.c_int32),
                ("fwd_offset", ctypes.c_int32),
                ("bck_offset", ctypes.c_int32),
                ("use_dist_wtd_comp_avg", ctypes.c_int32)]


@pytest.mark.skipif(not oracle.available(), reason="oracle not built")
@pytest.mark.parametrize("pri,sec", [(4, 2), (12, 0), (0, 4), (19, 1)])
def test_cdef_filter_block_10bit(pri, sec):
    """coeff_shift=2 path (10-bit): strengths and damping scale by the
    shift; output through the dst16 pointer."""
    lib = oracle.load()
    fn = lib.svt_cdef_filter_block_c
    fn.restype = None
    cs = 2
    rng = np.random.default_rng(pri * 3 + sec)
    wins, dirs, refs = [], [], []
    for t in range(8):
        win = rng.integers(0, 1024, (12, 12)).astype(np.uint16)
        if t % 3 == 0:
            win[0:2, :] = cdef.CDEF_VERY_LARGE
            win[:, 10:12] = cdef.CDEF_VERY_LARGE
        direction = int(rng.integers(0, 8))
        buf = np.full((12, CDEF_BSTRIDE), cdef.CDEF_VERY_LARGE,
                      dtype=np.uint16)
        buf[:, :12] = win
        dst16 = np.zeros((8, 8), dtype=np.uint16)
        in_ptr = buf[2:, 2:]
        fn(None, dst16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
           ctypes.c_int32(8),
           in_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
           ctypes.c_int32(pri << cs), ctypes.c_int32(sec << cs),
           ctypes.c_int32(direction), ctypes.c_int32(3 + cs),
           ctypes.c_int32(2 + cs), ctypes.c_int32(BLOCK_8X8),
           ctypes.c_int32(cs), ctypes.c_uint8(1))
        wins.append(win.astype(np.int32))
        dirs.append(direction)
        refs.append(dst16.astype(np.int32))
    got = np.asarray(cdef.cdef_filter_block(
        np.stack(wins), np.full(8, pri << cs, np.int32),
        np.full(8, sec << cs, np.int32), np.array(dirs, np.int32),
        3 + cs, 2 + cs, cs, 10))
    for i in range(8):
        assert np.array_equal(got[i], refs[i]), (i, dirs[i])


@pytest.mark.skipif(not oracle.available(), reason="oracle not built")
def test_wiener_10bit_bitexact():
    lib = oracle.load()
    fn = lib.svt_av1_highbd_wiener_convolve_add_src_c
    fn.restype = None
    from test_restoration import aligned_kernel_table, wiener_taps
    rng = np.random.default_rng(1)
    w = h = 16
    wins, fxs, fys, refs = [], [], [], []
    for _ in range(6):
        win = rng.integers(0, 1024, (h + 6, w + 7)).astype(np.uint16)
        tx = wiener_taps(rng)
        ty = wiener_taps(rng)
        _, tabx = aligned_kernel_table(tx)
        _, taby = aligned_kernel_table(ty)
        dst = np.zeros((h, w), dtype=np.uint16)
        # bd=10 keeps the standard wiener rounds (only 12-bit shifts)
        cp = ConvolveParams(0, 0, None, 0, restoration.WIENER_ROUND0,
                            restoration.WIENER_ROUND1, 0, 0, 0, 0, 0, 0)
        src = np.ascontiguousarray(win)
        sp_addr = src[3:, 3:].ctypes.data
        fn(ctypes.c_void_p(sp_addr >> 1), ctypes.c_ssize_t(w + 7),
           _byteptr(dst), ctypes.c_ssize_t(w),
           tabx.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
           taby.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
           ctypes.c_int32(w), ctypes.c_int32(h), ctypes.byref(cp),
           ctypes.c_int32(10))
        wins.append(win.astype(np.int32))
        fxs.append(tx.astype(np.int32))
        fys.append(ty.astype(np.int32))
        refs.append(dst.astype(np.int32))
    got = np.asarray(restoration.wiener_filter(
        np.stack(wins), np.stack(fxs), np.stack(fys), w, h, bd=10))
    for i in range(6):
        assert np.array_equal(got[i], refs[i]), i


@pytest.mark.skipif(not oracle.available(), reason="oracle not built")
def test_apply_selfguided_10bit():
    lib = oracle.load()
    fn = lib.svt_apply_selfguided_restoration_c
    fn.restype = None
    rng = np.random.default_rng(7)
    w = h = 16
    for eps, xqd in [(3, (12, 50)), (11, (0, 60)), (15, (30, 0))]:
        ext = rng.integers(0, 1024, (h + 6, w + 6)).astype(np.uint16)
        src_arr = np.ascontiguousarray(ext)
        origin_addr = src_arr[3:, 3:].ctypes.data
        dst = np.zeros((h, w), dtype=np.uint16)
        xq = (ctypes.c_int32 * 2)(*xqd)
        tmp = np.zeros(2 * 420 * 420, dtype=np.int32)
        fn(ctypes.c_void_p(origin_addr >> 1),
           ctypes.c_int32(w), ctypes.c_int32(h), ctypes.c_int32(w + 6),
           ctypes.c_int32(eps), xq, _byteptr(dst), ctypes.c_int32(w),
           tmp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
           ctypes.c_int32(10), ctypes.c_int32(1))
        got = np.asarray(restoration.apply_selfguided(
            ext[None].astype(np.int32), eps,
            np.array([xqd[0]]), np.array([xqd[1]]), h, w, bd=10))[0]
        assert np.array_equal(got, dst.astype(np.int32)), eps
