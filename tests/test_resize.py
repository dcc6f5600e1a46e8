"""Super-res normative upscale bit-exactness vs reference."""
import ctypes

import numpy as np
import pytest

from svt_av1_tpu.ops import resize

import oracle


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
@pytest.mark.parametrize("denom", [9, 10, 12, 14, 16])
def test_superres_upscale_bitexact(denom):
    lib = oracle.load()
    fn = lib.upscale_normative_rect
    fn.restype = None
    rng = np.random.default_rng(denom)
    out_w = 128
    in_w = resize.scaled_width(out_w, denom)
    h = 16
    step, x0 = resize.upscale_step_x0(in_w, out_w)
    # reference needs border columns around the input for padding
    border = 8
    buf = rng.integers(0, 256, (h, in_w + 2 * border)).astype(np.uint8)
    src_full = np.ascontiguousarray(buf)
    inner = src_full[:, border:border + in_w].copy()
    dst = np.zeros((h, out_w), dtype=np.uint8)
    in_ptr = src_full[:, border:]
    fn(in_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       ctypes.c_int32(h), ctypes.c_int32(in_w),
       ctypes.c_int32(in_w + 2 * border),
       dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       ctypes.c_int32(h), ctypes.c_int32(out_w), ctypes.c_int32(out_w),
       ctypes.c_int32(step), ctypes.c_int32(x0),
       ctypes.c_int32(1), ctypes.c_int32(1))
    got = np.asarray(resize.superres_upscale(inner.astype(np.int32), out_w))
    assert np.array_equal(got, dst.astype(np.int32)), denom
