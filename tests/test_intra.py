"""Intra predictor bit-exactness vs reference scalar kernels."""
import ctypes

import numpy as np
import pytest

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.ops import intra

import oracle

SIZES = [(4, 4), (8, 8), (16, 16), (32, 32), (64, 64),
         (4, 8), (8, 4), (8, 16), (16, 8), (16, 32), (32, 16),
         (4, 16), (16, 4), (8, 32), (32, 8), (64, 32), (32, 64),
         (16, 64), (64, 16)]

REF_NAMES = {
    cc.DC_PRED: "dc_predictor",
    cc.V_PRED: "v_predictor",
    cc.H_PRED: "h_predictor",
    cc.SMOOTH_PRED: "smooth_predictor",
    cc.SMOOTH_V_PRED: "smooth_v_predictor",
    cc.SMOOTH_H_PRED: "smooth_h_predictor",
    cc.PAETH_PRED: "paeth_predictor",
}


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
@pytest.mark.parametrize("mode", sorted(REF_NAMES))
def test_intra_bitexact(mode):
    lib = oracle.load()
    rng = np.random.default_rng(mode)
    for (w, h) in SIZES:
        # the reference reads the corner sample at above[-1]: allocate w+1
        # and pass a view offset by one so above[-1] is valid
        full = rng.integers(0, 256, size=w + 1).astype(np.uint8)
        above_ptr = full[1:]
        left = rng.integers(0, 256, size=h).astype(np.uint8)
        corner = full[0]

        name = REF_NAMES[mode]
        fn = getattr(lib, f"svt_aom_{name}_{w}x{h}_c")
        dst = np.zeros((h, w), dtype=np.uint8)
        fn.restype = None
        fn(dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           ctypes.c_ssize_t(w),
           above_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           left.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))

        got = intra.predict(mode, above_ptr[None].astype(np.int32),
                            left[None].astype(np.int32),
                            np.array([corner], dtype=np.int32), h, w)
        got = np.asarray(got)[0]
        assert np.array_equal(got, dst.astype(np.int32)), (mode, w, h)


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
@pytest.mark.parametrize("mode", [cc.D135_PRED, cc.D113_PRED, cc.D157_PRED])
def test_z2_directional_bitexact(mode):
    lib = oracle.load()
    rng = np.random.default_rng(mode)
    angle = intra.MODE_TO_ANGLE[mode]
    dx, dy = intra.get_dx(angle), intra.get_dy(angle)
    for (w, h) in [(4, 4), (8, 8), (16, 16), (32, 32), (8, 16), (16, 8)]:
        full = rng.integers(0, 256, size=w + 1).astype(np.uint8)
        above_ptr = full[1:]
        leftbuf = rng.integers(0, 256, size=h + 1).astype(np.uint8)
        leftbuf[0] = full[0]  # shared corner at left[-1] == above[-1]
        left_ptr = leftbuf[1:]
        corner = full[0]
        dst = np.zeros((h, w), dtype=np.uint8)
        fn = lib.svt_av1_dr_prediction_z2_c
        fn.restype = None
        fn(dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           ctypes.c_ssize_t(w), ctypes.c_int32(w), ctypes.c_int32(h),
           above_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           left_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           ctypes.c_int32(0), ctypes.c_int32(0),
           ctypes.c_int32(dx), ctypes.c_int32(dy))
        got = np.asarray(intra.predict(
            mode, above_ptr[None].astype(np.int32),
            left_ptr[None].astype(np.int32),
            np.array([corner], dtype=np.int32), h, w))[0]
        assert np.array_equal(got, dst.astype(np.int32)), (mode, w, h)


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
@pytest.mark.parametrize("mode", [cc.D45_PRED, cc.D67_PRED, cc.D203_PRED])
def test_z1_z3_directional_bitexact(mode):
    lib = oracle.load()
    rng = np.random.default_rng(mode)
    angle = intra.MODE_TO_ANGLE[mode]
    dx, dy = intra.get_dx(angle), intra.get_dy(angle)
    for (w, h) in [(4, 4), (8, 8), (16, 16), (32, 32), (16, 8)]:
        n_ext = w + h
        above = rng.integers(0, 256, size=n_ext).astype(np.uint8)
        left = rng.integers(0, 256, size=n_ext).astype(np.uint8)
        dst = np.zeros((h, w), dtype=np.uint8)
        if mode == cc.D203_PRED:
            fn = lib.svt_av1_dr_prediction_z3_c
        else:
            fn = lib.svt_av1_dr_prediction_z1_c
        fn.restype = None
        fn(dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           ctypes.c_ssize_t(w), ctypes.c_int32(w), ctypes.c_int32(h),
           above.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           left.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           ctypes.c_int32(0), ctypes.c_int32(dx), ctypes.c_int32(dy))
        ext = np.concatenate([above, above[-1:]]).astype(np.int32)
        lext = np.concatenate([left, left[-1:]]).astype(np.int32)
        if mode == cc.D203_PRED:
            got = np.asarray(intra.z3_pred(lext[None], h, w, angle))[0]
        else:
            got = np.asarray(intra.z1_pred(ext[None], h, w, angle))[0]
        assert np.array_equal(got, dst.astype(np.int32)), (mode, w, h)
