"""Hadamard/SATD bit-exactness vs reference."""
import ctypes

import numpy as np
import pytest

from svt_av1_tpu.ops import satd

import oracle


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
def test_hadamard_8x8_bitexact():
    lib = oracle.load()
    fn = lib.svt_aom_hadamard_8x8_c
    fn.restype = None
    rng = np.random.default_rng(0)
    blocks, refs = [], []
    for _ in range(32):
        d = rng.integers(-255, 256, (8, 8)).astype(np.int16)
        out = np.zeros(64, dtype=np.int32)
        fn(d.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
           ctypes.c_ssize_t(8),
           out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        blocks.append(d.astype(np.int32))
        refs.append(out.reshape(8, 8))
    got = np.asarray(satd.hadamard_8x8(np.stack(blocks)))
    for i in range(32):
        assert np.array_equal(got[i], refs[i]), i
