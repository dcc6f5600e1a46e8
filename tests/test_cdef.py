"""CDEF kernels: bit-exact vs reference scalar (dir search + filter)."""
import ctypes

import numpy as np
import pytest

from svt_av1_tpu.ops import cdef

import oracle

CDEF_BSTRIDE = 144  # ALIGN_POWER_OF_TWO(128 + 2*8, 3)
BLOCK_8X8 = 3
BLOCK_4X4 = 0


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
def test_find_dir_bitexact():
    lib = oracle.load()
    rng = np.random.default_rng(0)
    fn = lib.svt_aom_cdef_find_dir_c
    fn.restype = ctypes.c_uint8
    blocks = []
    refs = []
    for t in range(64):
        img = rng.integers(0, 256, (8, 8)).astype(np.uint16)
        if t % 4 == 0:  # add strongly directional content
            img = (np.arange(8)[:, None] * 30
                   + rng.integers(0, 8, (8, 8))).astype(np.uint16)
        buf = np.zeros((8, CDEF_BSTRIDE), dtype=np.uint16)
        buf[:, :8] = img
        var = ctypes.c_int32(0)
        d = fn(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
               ctypes.c_int32(CDEF_BSTRIDE), ctypes.byref(var),
               ctypes.c_int32(0))
        blocks.append(img.astype(np.int32))
        refs.append((int(d), int(var.value)))
    got_dir, got_var = cdef.cdef_find_dir(np.stack(blocks), 0)
    got_dir = np.asarray(got_dir)
    got_var = np.asarray(got_var)
    for i, (rd, rv) in enumerate(refs):
        assert int(got_dir[i]) == rd, (i, int(got_dir[i]), rd)
        assert int(got_var[i]) == rv, (i, int(got_var[i]), rv)


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
@pytest.mark.parametrize("pri,sec", [(4, 2), (9, 1), (0, 4), (12, 0),
                                     (19, 2)])
def test_filter_block_bitexact(pri, sec):
    lib = oracle.load()
    rng = np.random.default_rng(pri * 7 + sec)
    fn = lib.svt_cdef_filter_block_c
    fn.restype = None
    wins, dirs, refs = [], [], []
    for t in range(16):
        # padded 12x12 window inside a CDEF_BSTRIDE buffer
        win = rng.integers(0, 256, (12, 12)).astype(np.uint16)
        if t % 3 == 0:  # exercise VERY_LARGE borders
            win[0:2, :] = cdef.CDEF_VERY_LARGE
            win[:, 10:12] = cdef.CDEF_VERY_LARGE
        direction = int(rng.integers(0, 8))
        buf = np.full((12, CDEF_BSTRIDE), cdef.CDEF_VERY_LARGE,
                      dtype=np.uint16)
        buf[:, :12] = win
        dst = np.zeros((8, 8), dtype=np.uint8)
        # `in` points at the block start (offset 2,2)
        in_ptr = buf[2:, 2:]
        fn(dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), None,
           ctypes.c_int32(8),
           in_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
           ctypes.c_int32(pri), ctypes.c_int32(sec),
           ctypes.c_int32(direction), ctypes.c_int32(3), ctypes.c_int32(2),
           ctypes.c_int32(BLOCK_8X8), ctypes.c_int32(0),
           ctypes.c_uint8(1))
        wins.append(win.astype(np.int32))
        dirs.append(direction)
        refs.append(dst.astype(np.int32))
    got = np.asarray(cdef.cdef_filter_block(
        np.stack(wins), np.full(16, pri, np.int32),
        np.full(16, sec, np.int32), np.array(dirs, np.int32),
        pri_damping=3, sec_damping=2))
    for i in range(16):
        assert np.array_equal(got[i], refs[i]), (i, dirs[i])


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
@pytest.mark.parametrize("pri,sec", [(4, 2), (7, 1), (0, 4), (2, 0)])
def test_filter_block_4x4_bitexact(pri, sec):
    """Chroma (4:2:0) path: 4x4 blocks, damping-1."""
    lib = oracle.load()
    rng = np.random.default_rng(pri * 11 + sec)
    fn = lib.svt_cdef_filter_block_c
    fn.restype = None
    wins, dirs, refs = [], [], []
    for t in range(16):
        win = rng.integers(0, 256, (8, 8)).astype(np.uint16)
        if t % 3 == 0:
            win[0:2, :] = cdef.CDEF_VERY_LARGE
        direction = int(rng.integers(0, 8))
        buf = np.full((8, CDEF_BSTRIDE), cdef.CDEF_VERY_LARGE,
                      dtype=np.uint16)
        buf[:, :8] = win
        dst = np.zeros((4, 4), dtype=np.uint8)
        in_ptr = buf[2:, 2:]
        fn(dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), None,
           ctypes.c_int32(4),
           in_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
           ctypes.c_int32(pri), ctypes.c_int32(sec),
           ctypes.c_int32(direction), ctypes.c_int32(2), ctypes.c_int32(1),
           ctypes.c_int32(BLOCK_4X4), ctypes.c_int32(0),
           ctypes.c_uint8(1))
        wins.append(win.astype(np.int32))
        dirs.append(direction)
        refs.append(dst.astype(np.int32))
    got = np.asarray(cdef.cdef_filter_block(
        np.stack(wins), np.full(16, pri, np.int32),
        np.full(16, sec, np.int32), np.array(dirs, np.int32),
        pri_damping=2, sec_damping=1, n=4))
    for i in range(16):
        assert np.array_equal(got[i], refs[i]), (i, dirs[i])
