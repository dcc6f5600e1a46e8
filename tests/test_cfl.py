"""CfL (chroma-from-luma) — round 2.

Kernel exactness vs the reference formulas (intra_prediction.c:420
cfl_luma_subsampling_420, :448 subtract_average; C_DEFAULT/cfl_c.c
get_scaled_luma_q0), signaling round-trip, and an e2e gain check on
luma-correlated chroma.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.ops import intra


def _ref_ac(luma, h, w):
    sub = np.zeros((h, w), np.int64)
    for j in range(h):
        for i in range(w):
            s = (int(luma[2 * j, 2 * i]) + int(luma[2 * j, 2 * i + 1])
                 + int(luma[2 * j + 1, 2 * i])
                 + int(luma[2 * j + 1, 2 * i + 1]))
            sub[j, i] = s << 1
    avg = (sub.sum() + (h * w) // 2) >> int(np.log2(h * w))
    return sub - avg


def _ref_predict(dc, ac, alpha, bd):
    out = np.zeros_like(dc)
    for j in range(dc.shape[0]):
        for i in range(dc.shape[1]):
            v = alpha * int(ac[j, i])
            scaled = -((-v + 32) >> 6) if v < 0 else (v + 32) >> 6
            out[j, i] = min(max(int(dc[j, i]) + scaled, 0),
                            (1 << bd) - 1)
    return out


@pytest.mark.parametrize("bd", [8, 10])
def test_cfl_kernels_match_reference_formulas(bd):
    rng = np.random.default_rng(bd)
    h = w = 8
    luma = rng.integers(0, 1 << bd, (2 * h, 2 * w)).astype(np.int32)
    dc = rng.integers(0, 1 << bd, (h, w)).astype(np.int32)
    ac = np.asarray(intra.cfl_ac_420(jnp.asarray(luma)[None], h, w))[0]
    assert np.array_equal(ac, _ref_ac(luma, h, w))
    for alpha in (-16, -5, -1, 1, 7, 16):
        got = np.asarray(intra.cfl_predict(
            jnp.asarray(dc)[None], jnp.asarray(ac)[None], alpha, bd))[0]
        assert np.array_equal(got, _ref_predict(dc, ac, alpha, bd)), alpha


def test_cfl_e2e_gain_and_roundtrip():
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder
    from svt_av1_tpu.pipeline import presets

    rng = np.random.default_rng(0)
    w, h = 128, 96
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(110 + 60 * np.sin(xx / 23.0) * np.cos(yy / 17.0)
                + rng.normal(0, 2, (h, w)), 0, 255).astype(np.uint8)
    u = np.clip(90 + 0.5 * (y[::2, ::2].astype(np.float64) - 110), 0,
                255).astype(np.uint8)
    v = np.clip(160 - 0.4 * (y[::2, ::2].astype(np.float64) - 110), 0,
                255).astype(np.uint8)

    orig = presets.features_for

    def run(use_cfl):
        presets.features_for = lambda m: dataclasses.replace(
            orig(m), cfl=use_cfl, varpart=False)
        try:
            cfg = EncoderConfig(source_width=w, source_height=h, qp=32,
                                enc_mode=6)
            enc = Encoder(cfg)
            enc.send_picture(y, u, v, eos=True)
            pkt = enc.get_packet()
            dec = Decoder()
            rec = dec.decode_temporal_unit(pkt.data)[0]
            for pl in ("y", "u", "v"):
                assert np.array_equal(rec[pl], pkt.recon[pl]), pl
            ncfl = sum(1 for d in rec["decisions"].values()
                       if d.uv_mode == cc.UV_CFL_PRED)
            mse_u = np.mean((pkt.recon["u"][:h // 2, :w // 2]
                             .astype(np.float64) - u) ** 2)
            return len(pkt.data), mse_u, ncfl
        finally:
            presets.features_for = orig

    sz0, mse0, _ = run(False)
    sz1, mse1, ncfl = run(True)
    assert ncfl > 0, "CfL never chosen on correlated chroma"
    # must improve at least one axis without degrading the other much
    assert mse1 <= mse0 * 1.02 and sz1 <= sz0 * 1.05, \
        (sz0, sz1, mse0, mse1)
