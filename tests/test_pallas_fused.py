"""Pallas fused fwd-txfm+quant kernel matches the unfused ops path
(interpret mode on CPU; compiled on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.ops import quant, transforms as tf
from svt_av1_tpu.ops.pallas import fused_txq


def test_fused_matches_unfused():
    rng = np.random.default_rng(0)
    b = 100  # exercises padding to TILE_B
    resid = rng.integers(-200, 200, (b, 16, 16)).astype(np.int32)
    qindex = 120

    interpret = jax.devices()[0].platform == "cpu"
    coef, qc, dqc = fused_txq.fwd_txfm_quant_16x16(
        resid, qindex, interpret=interpret)
    qc = np.asarray(qc)
    dqc = np.asarray(dqc)

    coeffs = tf.fwd_txfm2d(resid, cc.DCT_DCT, cc.TX_16X16)
    qp = quant.make_quant_params(qindex)
    qc_ref, dqc_ref = quant.quantize(coeffs, qp, cc.TX_16X16)
    assert np.array_equal(np.asarray(coef), np.asarray(coeffs))
    assert np.array_equal(qc, np.asarray(qc_ref))
    assert np.array_equal(dqc, np.asarray(dqc_ref))


def test_fused_qp_variant_matches():
    rng = np.random.default_rng(1)
    resid = rng.integers(-200, 200, (70, 16, 16)).astype(np.int32)
    qp = quant.make_quant_params(100)
    interpret = jax.devices()[0].platform == "cpu"
    coef, qc, dqc = fused_txq.fwd_txfm_quant_16x16_qp(
        jnp.asarray(resid), qp, interpret=interpret)
    coeffs = tf.fwd_txfm2d(resid, cc.DCT_DCT, cc.TX_16X16)
    qc_ref, dqc_ref = quant.quantize(coeffs, qp, cc.TX_16X16)
    assert np.array_equal(np.asarray(coef), np.asarray(coeffs))
    assert np.array_equal(np.asarray(qc), np.asarray(qc_ref))
    assert np.array_equal(np.asarray(dqc), np.asarray(dqc_ref))
