"""Film grain synthesis bit-exactness vs reference (overlap off)."""
import ctypes

import numpy as np
import pytest

from svt_av1_tpu.codec import film_grain as fg

import oracle


class AomFilmGrain(ctypes.Structure):
    _fields_ = [
        ("apply_grain", ctypes.c_int32),
        ("update_parameters", ctypes.c_int32),
        ("scaling_points_y", (ctypes.c_int32 * 2) * 14),
        ("num_y_points", ctypes.c_int32),
        ("scaling_points_cb", (ctypes.c_int32 * 2) * 10),
        ("num_cb_points", ctypes.c_int32),
        ("scaling_points_cr", (ctypes.c_int32 * 2) * 10),
        ("num_cr_points", ctypes.c_int32),
        ("scaling_shift", ctypes.c_int32),
        ("ar_coeff_lag", ctypes.c_int32),
        ("ar_coeffs_y", ctypes.c_int32 * 24),
        ("ar_coeffs_cb", ctypes.c_int32 * 25),
        ("ar_coeffs_cr", ctypes.c_int32 * 25),
        ("ar_coeff_shift", ctypes.c_int32),
        ("cb_mult", ctypes.c_int32),
        ("cb_luma_mult", ctypes.c_int32),
        ("cb_offset", ctypes.c_int32),
        ("cr_mult", ctypes.c_int32),
        ("cr_luma_mult", ctypes.c_int32),
        ("cr_offset", ctypes.c_int32),
        ("overlap_flag", ctypes.c_int32),
        ("clip_to_restricted_range", ctypes.c_int32),
        ("bit_depth", ctypes.c_int32),
        ("chroma_scaling_from_luma", ctypes.c_int32),
        ("grain_scale_shift", ctypes.c_int32),
        ("random_seed", ctypes.c_uint16),
        ("ignore_ref", ctypes.c_int32),
    ]


def make_params(rng):
    p = fg.FilmGrainParams(
        random_seed=int(rng.integers(1, 65536)),
        scaling_points_y=[(0, 24), (64, 36), (160, 30), (255, 44)],
        scaling_points_cb=[(0, 16), (128, 20), (255, 28)],
        scaling_points_cr=[(0, 12), (255, 18)],
        ar_coeff_lag=2,
        ar_coeffs_y=[int(v) for v in rng.integers(-30, 31, 24)] ,
        ar_coeffs_cb=[int(v) for v in rng.integers(-30, 31, 25)],
        ar_coeffs_cr=[int(v) for v in rng.integers(-30, 31, 25)],
    )
    return p


def to_ctypes(p: fg.FilmGrainParams) -> AomFilmGrain:
    c = AomFilmGrain()
    c.apply_grain = 1
    c.update_parameters = 1
    for i, (x, v) in enumerate(p.scaling_points_y):
        c.scaling_points_y[i][0] = x
        c.scaling_points_y[i][1] = v
    c.num_y_points = p.num_y_points
    for i, (x, v) in enumerate(p.scaling_points_cb):
        c.scaling_points_cb[i][0] = x
        c.scaling_points_cb[i][1] = v
    c.num_cb_points = p.num_cb_points
    for i, (x, v) in enumerate(p.scaling_points_cr):
        c.scaling_points_cr[i][0] = x
        c.scaling_points_cr[i][1] = v
    c.num_cr_points = p.num_cr_points
    c.scaling_shift = p.scaling_shift
    c.ar_coeff_lag = p.ar_coeff_lag
    for i, v in enumerate(p.ar_coeffs_y):
        c.ar_coeffs_y[i] = v
    for i, v in enumerate(p.ar_coeffs_cb):
        c.ar_coeffs_cb[i] = v
    for i, v in enumerate(p.ar_coeffs_cr):
        c.ar_coeffs_cr[i] = v
    c.ar_coeff_shift = p.ar_coeff_shift
    c.cb_mult, c.cb_luma_mult, c.cb_offset = p.cb_mult, p.cb_luma_mult, \
        p.cb_offset
    c.cr_mult, c.cr_luma_mult, c.cr_offset = p.cr_mult, p.cr_luma_mult, \
        p.cr_offset
    c.overlap_flag = int(p.overlap_flag)
    c.clip_to_restricted_range = int(p.clip_to_restricted_range)
    c.bit_depth = p.bit_depth
    c.chroma_scaling_from_luma = int(p.chroma_scaling_from_luma)
    c.grain_scale_shift = p.grain_scale_shift
    c.random_seed = p.random_seed
    return c


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
def test_add_film_grain_bitexact():
    lib = oracle.load()
    fn = lib.svt_av1_add_film_grain_run
    fn.restype = None
    rng = np.random.default_rng(3)
    p = make_params(rng)
    w, h = 96, 64
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    ry, ru, rv = y.copy(), u.copy(), v.copy()
    c = to_ctypes(p)
    fn(ctypes.byref(c),
       ry.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       ru.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       rv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       ctypes.c_int32(h), ctypes.c_int32(w),
       ctypes.c_int32(w), ctypes.c_int32(w // 2),
       ctypes.c_int32(0), ctypes.c_int32(1), ctypes.c_int32(1))
    gy, gu, gv = fg.apply_film_grain(p, y, u, v)
    assert np.array_equal(gy, ry), "luma mismatch"
    assert np.array_equal(gu, ru), "cb mismatch"
    assert np.array_equal(gv, rv), "cr mismatch"


def test_film_grain_signaling_roundtrip():
    """Grain params survive the frame-header write/read; decode recon is
    unaffected (grain is applied at display time)."""
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    u = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    v = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    cfg = EncoderConfig(source_width=64, source_height=64, qp=40,
                        film_grain_denoise_strength=8)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    pkt = enc.get_packet()
    dec = Decoder()
    rec = dec.decode_temporal_unit(pkt.data)[0]
    assert np.array_equal(rec["y"], pkt.recon["y"])
    # the display path can synthesize grain from the parsed params
    gy, gu, gv = fg.apply_film_grain(
        fg.default_grain_params(8), rec["y"], rec["u"], rec["v"])
    assert not np.array_equal(gy, rec["y"])


def test_noise_model_estimation():
    """noise_model.c:2279 analog: flat blocks -> FFT-wiener denoise ->
    AR fit -> scaling points; clean sources yield no params."""
    from svt_av1_tpu.pipeline import noise_model as nm
    rng = np.random.default_rng(11)
    h, w = 192, 256
    yy, xx = np.mgrid[0:h, 0:w]
    clean = np.clip(90 + 70 * np.sin(xx / 45.0) + 40 * np.cos(yy / 37.0),
                    0, 255)
    white = rng.normal(0, 6, (h + 4, w + 4))
    noise = (white[2:-2, 2:-2] + 0.5 * white[1:-3, 2:-2]
             + 0.3 * white[2:-2, 1:-3])
    src = np.clip(clean + noise, 0, 255).astype(np.uint8)
    u = np.clip(128 + rng.normal(0, 3, (h // 2, w // 2)), 0,
                255).astype(np.uint8)
    v = np.clip(128 + rng.normal(0, 3, (h // 2, w // 2)), 0,
                255).astype(np.uint8)
    p, den = nm.estimate_grain_params(src, u, v, denoise=True)
    assert p is not None
    assert len(p.scaling_points_y) >= 2
    xs = [a for a, _ in p.scaling_points_y]
    assert xs == sorted(xs) and len(set(xs)) == len(xs)
    assert all(-128 <= c <= 127 for c in p.ar_coeffs_y)
    # denoising must reduce distance to the clean plate
    assert (np.std(den["y"].astype(float) - clean)
            < np.std(src.astype(float) - clean))
    p2, _ = nm.estimate_grain_params(
        np.clip(clean, 0, 255).astype(np.uint8), None, None)
    assert p2 is None


def test_estimated_grain_signaling_roundtrip():
    """Estimated params survive header write/parse and synthesis runs."""
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder
    rng = np.random.default_rng(5)
    h, w = 128, 128
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.clip(100 + 60 * np.sin(xx / 33.0), 0, 255)
    y = np.clip(base + rng.normal(0, 5, (h, w)), 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        film_grain_denoise_strength=8)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    pkt = enc.get_packet()
    rec = Decoder().decode_temporal_unit(pkt.data)[0]
    assert np.array_equal(rec["y"], pkt.recon["y"])
