"""Context-exact MD coefficient rate model vs the real range coder.

txb_bits_exact must predict, coefficient-context by coefficient-context,
the bits the entropy coder emits for a quantized block under a FIXED
CDF state (update=False).  Tolerances cover only the DC-sign mean
pricing (<=0.5 bit) and od_ec tell rounding.
"""
import numpy as np
import pytest

import jax

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.codec.cdf import FrameCDFs
from svt_av1_tpu.codec.coeff import encode_txb
from svt_av1_tpu.codec.entropy import RangeEncoder
from svt_av1_tpu.codec.rate_est import exact_coef_tables, _sym_bits
from svt_av1_tpu.ops.coef_rate import txb_bits_exact


def _rand_blocks(rng, n, count):
    """Blocks spanning the regimes: all-zero, DC-only, sparse low-level,
    dense, large levels (golomb), negatives."""
    out = []
    out.append(np.zeros((n, n), np.int32))
    dc = np.zeros((n, n), np.int32)
    dc[0, 0] = -3
    out.append(dc)
    for _ in range(count):
        density = rng.uniform(0.02, 0.6)
        mask = rng.random((n, n)) < density
        # low-frequency biased magnitudes
        yy, xx = np.mgrid[0:n, 0:n]
        scale = 30.0 / (1.0 + yy + xx)
        mag = np.round(rng.exponential(scale)).astype(np.int32)
        sign = rng.choice([-1, 1], (n, n))
        out.append((mask * mag * sign).astype(np.int32))
    big = np.zeros((n, n), np.int32)
    big[0, 0] = 400
    big[0, 1] = -20
    big[1, 0] = 15
    out.append(big)
    return out


CASES = [(16, 0, cc.TX_16X16, 0), (8, 1, cc.TX_8X8, 7),
         (32, 0, cc.TX_32X32, 0), (8, 0, cc.TX_8X8, 0),
         (4, 1, cc.TX_4X4, 7)]


@pytest.mark.parametrize("n,plane,tx_size,skip_ctx", CASES)
def test_exact_vs_coder(n, plane, tx_size, skip_ctx):
    rng = np.random.default_rng(7 * n + plane)
    qindex = 60
    cdfs = FrameCDFs(qindex)
    t = exact_coef_tables(cdfs, tx_size, plane)
    if plane == 1:
        # the builder averages chroma skip rows 7..9; pin to the test ctx
        t = t._replace(skip=_sym_bits(cdfs.txb_skip[
            __import__("svt_av1_tpu.codec.tables", fromlist=["x"]
                       ).txs_ctx(tx_size)][skip_ctx], 2))
    blocks = _rand_blocks(rng, n, 24)
    qabs = np.stack([np.abs(b) for b in blocks])
    pred = np.asarray(jax.jit(
        lambda q: txb_bits_exact(q, t, n))(qabs))

    errs, meas = [], []
    for i, b in enumerate(blocks):
        enc = RangeEncoder()
        t0 = enc.tell_bits()
        encode_txb(enc, cdfs, b, tx_size, cc.DCT_DCT, plane,
                   txb_skip_ctx=skip_ctx, dc_sign_ctx=0, update=False)
        measured = enc.tell_bits() - t0
        meas.append(measured)
        errs.append(measured - float(pred[i]))
    errs, meas = np.array(errs), np.array(meas)
    # per-block: <= max(2 bits, 1%) — covers DC-sign mean pricing and
    # the coder's state-dependent rounding
    assert np.all(np.abs(errs) <= np.maximum(2.0, 0.01 * meas)), errs
    assert abs(np.mean(errs)) < 0.75 + 0.002 * np.mean(meas), errs


def test_exact_adapted_state():
    """Tables from an adapted CDF state stay exact (the per-frame
    refresh path)."""
    rng = np.random.default_rng(3)
    qindex = 80
    cdfs = FrameCDFs(qindex)
    # adapt the state by coding warm-up blocks WITH update
    enc = RangeEncoder()
    for b in _rand_blocks(rng, 16, 10):
        encode_txb(enc, cdfs, b, cc.TX_16X16, cc.DCT_DCT, 0,
                   txb_skip_ctx=0, dc_sign_ctx=0, update=True)
    t = exact_coef_tables(cdfs, cc.TX_16X16, 0)
    blocks = _rand_blocks(rng, 16, 12)
    qabs = np.stack([np.abs(b) for b in blocks])
    pred = np.asarray(txb_bits_exact(qabs, t, 16))
    errs = []
    for i, b in enumerate(blocks):
        e2 = RangeEncoder()
        t0 = e2.tell_bits()
        encode_txb(e2, cdfs, b, cc.TX_16X16, cc.DCT_DCT, 0,
                   txb_skip_ctx=0, dc_sign_ctx=0, update=False)
        errs.append((e2.tell_bits() - t0) - float(pred[i]))
    errs = np.array(errs)
    assert np.max(np.abs(errs)) < 3.0, errs
    assert abs(np.mean(errs)) < 0.75, errs
