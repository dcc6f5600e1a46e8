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
