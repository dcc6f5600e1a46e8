"""RDOQ (ops/rdoq.py) properties:

1. model-cost monotonicity: the optimized levels never cost more than
   the uniform-quantizer levels under the rate/distortion model RDOQ
   prices with;
2. normative dequant: returned dqcoeff matches quant.dequantize of the
   returned levels exactly;
3. e2e conformance: an encode with rdoq enabled still round-trips the
   verification decoder bit-exactly.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.codec.rate_est import rdoq_tables_for_qindex
from svt_av1_tpu.ops import quant, rdoq, transforms as tf


def _model_cost(c_abs_scan, l_scan, dqv_scan, tbl, lam, s2, nn):
    level_tbl = np.asarray(tbl[:64])
    eob_tbl = np.asarray(tbl[64:64 + nn + 1])
    dq = l_scan * dqv_scan
    nz = np.nonzero(l_scan)[0]
    eob = int(nz.max()) + 1 if nz.size else 0
    keep = s2 * (c_abs_scan - dq) ** 2 + lam * level_tbl[
        np.minimum(l_scan, 63)]
    zero = s2 * c_abs_scan ** 2
    return (keep[:eob].sum() + zero[eob:].sum() + lam * eob_tbl[eob])


@pytest.mark.parametrize("qindex", [60, 140, 200])
def test_model_cost_never_increases(qindex):
    rng = np.random.default_rng(qindex)
    b, n = 8, 16
    resid = rng.integers(-60, 61, (b, n, n)).astype(np.int32)
    qp = quant.make_quant_params(qindex)
    coeffs = tf.fwd_txfm2d(jnp.asarray(resid), cc.DCT_DCT, cc.TX_16X16)
    qpj = quant.QuantParams(*[jnp.asarray(a) for a in qp])
    qc, dq = quant.quantize(coeffs, qpj, cc.TX_16X16)
    qstep = quant.dc_q(qindex) / 8.0
    lam = np.float32(0.7 * qstep * qstep)
    tbl = jnp.asarray(rdoq_tables_for_qindex(qindex)["rq_y"])
    s2 = np.float32(tf.coeff_sse_scale(cc.TX_16X16, cc.DCT_DCT))
    q2, dq2 = rdoq.optimize_levels(
        coeffs, qc, quant.dequant_field(qp, n, n), cc.TX_16X16,
        cc.DCT_DCT, tbl, lam, s2)

    scan = rdoq._scan_for(cc.TX_16X16, cc.DCT_DCT)
    dqv = np.asarray(quant.dequant_field(qp, n, n)).reshape(-1)[scan]
    for i in range(b):
        c_s = np.abs(np.asarray(coeffs[i]).reshape(-1)[scan]).astype(
            np.float64)
        l0 = np.abs(np.asarray(qc[i]).reshape(-1)[scan])
        l1 = np.abs(np.asarray(q2[i]).reshape(-1)[scan])
        c0 = _model_cost(c_s, l0, dqv, tbl, lam, s2, n * n)
        c1 = _model_cost(c_s, l1, dqv, tbl, lam, s2, n * n)
        assert c1 <= c0 + 1e-3, (i, c0, c1)


def test_dequant_matches_normative():
    rng = np.random.default_rng(3)
    b, n = 4, 16
    resid = rng.integers(-80, 81, (b, n, n)).astype(np.int32)
    qp = quant.make_quant_params(100)
    coeffs = tf.fwd_txfm2d(jnp.asarray(resid), cc.DCT_DCT, cc.TX_16X16)
    qpj = quant.QuantParams(*[jnp.asarray(a) for a in qp])
    qc, _ = quant.quantize(coeffs, qpj, cc.TX_16X16)
    tbl = jnp.asarray(rdoq_tables_for_qindex(100)["rq_y"])
    s2 = np.float32(tf.coeff_sse_scale(cc.TX_16X16, cc.DCT_DCT))
    q2, dq2 = rdoq.optimize_levels(
        coeffs, qc, quant.dequant_field(qp, n, n), cc.TX_16X16,
        cc.DCT_DCT, tbl, np.float32(300.0), s2)
    ref = quant.dequantize(q2, qpj, cc.TX_16X16)
    assert np.array_equal(np.asarray(dq2), np.asarray(ref))


def test_e2e_roundtrip_with_rdoq():
    import dataclasses
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder
    from svt_av1_tpu.pipeline import presets

    w = h = 64
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(96 + 60 * np.sin(xx / 17.0) + 50 * np.cos(yy / 23.0)
                + rng.integers(-6, 7, (h, w)), 0, 255).astype(np.uint8)
    u = np.full((32, 32), 120, np.uint8)
    v = np.full((32, 32), 130, np.uint8)

    orig = presets.features_for
    presets.features_for = lambda m: dataclasses.replace(
        orig(m), rdoq=True, varpart=False)
    try:
        cfg = EncoderConfig(source_width=w, source_height=h, qp=35,
                            enc_mode=6)
        enc = Encoder(cfg)
        enc.send_picture(y, u, v, eos=True)
        pkt = enc.get_packet()
        dec = Decoder()
        rec = dec.decode_temporal_unit(pkt.data)[0]
        assert np.array_equal(rec["y"], pkt.recon["y"])
        assert np.array_equal(rec["u"], pkt.recon["u"])
        assert np.array_equal(rec["v"], pkt.recon["v"])
    finally:
        presets.features_for = orig
