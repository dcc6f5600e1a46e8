"""Loop filter bit-exactness vs reference lpf kernels."""
import ctypes

import numpy as np
import pytest

from svt_av1_tpu.ops import dlf

import oracle


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
@pytest.mark.parametrize("flen", [4, 6, 8, 14])
@pytest.mark.parametrize("level", [4, 12, 32, 63])
def test_filter_lines_bitexact(flen, level):
    lib = oracle.load()
    rng = np.random.default_rng(flen * 100 + level)
    blimit_v, limit_v, thresh_v = dlf.loop_filter_thresholds(level, 0)
    blimit = np.array([blimit_v], dtype=np.uint8)
    limit = np.array([limit_v], dtype=np.uint8)
    thresh = np.array([thresh_v], dtype=np.uint8)
    fn = getattr(lib, f"svt_aom_lpf_horizontal_{flen}_c")
    fn.restype = None

    all_lines = []
    all_refs = []
    for trial in range(32):
        # 14 rows x 4 cols patch; horizontal edge between rows 6|7
        patch = rng.integers(0, 256, (14, 4)).astype(np.uint8)
        if trial % 3 == 0:
            # smooth content to trigger the wide (flat) paths
            base = int(rng.integers(30, 220))
            patch = np.clip(base + rng.integers(-1, 2, (14, 4)), 0,
                            255).astype(np.uint8)
        ref = patch.copy()
        s_ptr = ref[7:, :]  # q0 row
        fn(s_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           ctypes.c_int32(4),
           blimit.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           limit.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           thresh.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        for c in range(4):
            all_lines.append(patch[:, c].astype(np.int32))
            all_refs.append(ref[:, c].astype(np.int32))

    got = np.asarray(dlf.filter_lines(np.stack(all_lines), blimit_v,
                                      limit_v, thresh_v, flen))
    for i in range(len(all_lines)):
        assert np.array_equal(got[i], all_refs[i]), (flen, level, i)


def test_plane_uniform_smoke():
    # smooth plane with a step at a 16-aligned edge: the filter engages
    plane = np.full((64, 64), 80, dtype=np.int32)
    plane[:, 16:] = 90
    plane[32:, :] = 70
    out = np.asarray(dlf.loop_filter_plane_uniform(plane, 16, 24, 0, 14))
    assert out.shape == plane.shape
    # interior far from edges untouched
    assert np.array_equal(out[0:8, 0:8], plane[0:8, 0:8])
    assert not np.array_equal(out, plane)


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
@pytest.mark.parametrize("flen", [4, 6, 8, 14])
@pytest.mark.parametrize("level", [8, 40])
def test_filter_lines_highbd_bitexact(flen, level):
    """10-bit variants (svt_aom_highbd_lpf_*_c)."""
    lib = oracle.load()
    rng = np.random.default_rng(flen * 31 + level)
    blimit_v, limit_v, thresh_v = dlf.loop_filter_thresholds(level, 0)
    blimit = np.array([blimit_v], dtype=np.uint8)
    limit = np.array([limit_v], dtype=np.uint8)
    thresh = np.array([thresh_v], dtype=np.uint8)
    fn = getattr(lib, f"svt_aom_highbd_lpf_horizontal_{flen}_c")
    fn.restype = None

    all_lines = []
    all_refs = []
    for trial in range(24):
        patch = rng.integers(0, 1024, (14, 4)).astype(np.uint16)
        if trial % 3 == 0:
            base = int(rng.integers(100, 900))
            patch = np.clip(base + rng.integers(-4, 5, (14, 4)), 0,
                            1023).astype(np.uint16)
        ref = patch.copy()
        s_ptr = ref[7:, :]
        fn(s_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
           ctypes.c_int32(4),
           blimit.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           limit.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           thresh.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
           ctypes.c_int32(10))
        for c in range(4):
            all_lines.append(patch[:, c].astype(np.int32))
            all_refs.append(ref[:, c].astype(np.int32))

    got = np.asarray(dlf.filter_lines(np.stack(all_lines), blimit_v,
                                      limit_v, thresh_v, flen, bd=10))
    for i in range(len(all_lines)):
        assert np.array_equal(got[i], all_refs[i]), (flen, level, i)


def test_dlf_10bit_e2e():
    """10-bit encode with DLF on: decode equals encoder recon."""
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder
    rng = np.random.default_rng(3)
    h, w = 64, 64
    y = rng.integers(0, 1024, (h, w)).astype(np.uint16)
    u = rng.integers(0, 1024, (h // 2, w // 2)).astype(np.uint16)
    v = rng.integers(0, 1024, (h // 2, w // 2)).astype(np.uint16)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        encoder_bit_depth=10, enable_dlf_flag=True)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    pkt = enc.get_packet()
    rec = Decoder().decode_temporal_unit(pkt.data)[0]
    for p in ("y", "u", "v"):
        assert np.array_equal(rec[p], pkt.recon[p]), p
