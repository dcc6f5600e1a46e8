"""Transform tests.

* inverse: bit-exact vs reference svt_av1_inv_txfm2d_add_<WxH>_c over random
  coefficients, every legal (tx_size, tx_type) pair.
* forward: inverse(forward(x)) must reconstruct x closely (the forward is a
  calibrated non-normative design; see ops/transforms.py).
"""
import ctypes

import numpy as np
import pytest

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.ops import transforms as tf

import oracle


def legal_tx_types(tx_size):
    """tx types whose 1-D transforms exist for the given dims.

    ADST only exists for <=16-point; 64-point only DCT / (rect) IDTX per
    spec; we enumerate by available 1-D networks."""
    w, h = int(cc.tx_size_wide[tx_size]), int(cc.tx_size_high[tx_size])
    if max(w, h) > 32:
        return [cc.DCT_DCT]  # 64-point sizes are DCT-only per spec
    out = []
    for t in range(cc.TX_TYPES):
        vt, ht = cc.tx_type_1d[t]
        ok = True
        for kind, n in ((vt, h), (ht, w)):
            if kind in (cc.TX1D_ADST, cc.TX1D_FLIPADST) and n > 16:
                ok = False
        if ok:
            out.append(t)
    return out


def ref_inv_add(lib, coeffs, pred, tx_size, tx_type, bd=8):
    w, h = int(cc.tx_size_wide[tx_size]), int(cc.tx_size_high[tx_size])
    kw, kh = min(w, 32), min(h, 32)
    # reference consumes the coded (kh x kw) region row-major
    inp = np.zeros(kh * kw, dtype=np.int32)
    inp[:] = coeffs[:kh, :kw].reshape(-1)
    out = pred.astype(np.uint16).copy()
    fname = f"svt_av1_inv_txfm2d_add_{w}x{h}_c"
    fn = getattr(lib, fname)
    args = [inp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            ctypes.c_int32(w),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            ctypes.c_int32(w),
            ctypes.c_int32(tx_type)]
    if w != h:
        # rectangular variants take an extra TxSize argument
        args.append(ctypes.c_int32(tx_size))
        # and most (not 4x8/8x4/4x16/16x4) also take an eob argument
        if (w, h) not in ((4, 8), (8, 4), (4, 16), (16, 4)):
            args.append(ctypes.c_int32(w * h))
    args.append(ctypes.c_int32(bd))
    fn(*args)
    return out


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
@pytest.mark.parametrize("tx_size", range(cc.TX_SIZES_ALL))
def test_inv_txfm_bitexact(tx_size):
    lib = oracle.load()
    rng = np.random.default_rng(tx_size)
    w, h = int(cc.tx_size_wide[tx_size]), int(cc.tx_size_high[tx_size])
    kw, kh = min(w, 32), min(h, 32)
    for tx_type in legal_tx_types(tx_size):
        # realistic coefficient magnitudes plus extremes
        coeffs = np.zeros((h, w), dtype=np.int32)
        coeffs[:kh, :kw] = rng.integers(-(1 << 15), 1 << 15, size=(kh, kw))
        pred = rng.integers(0, 256, size=(h, w)).astype(np.int32)
        ref = ref_inv_add(lib, coeffs, pred, tx_size, tx_type)
        got = tf.inv_txfm2d_add(coeffs[None], pred[None], tx_type, tx_size,
                                bd=8)
        got = np.asarray(got)[0]
        assert np.array_equal(got, ref.astype(np.int32)), (
            f"tx_size={tx_size} tx_type={tx_type}\n"
            f"diff at {np.argwhere(got != ref)[:5]}")


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
def test_inv_txfm_bitexact_10bit():
    lib = oracle.load()
    rng = np.random.default_rng(99)
    tx_size = cc.TX_16X16
    for tx_type in (cc.DCT_DCT, cc.ADST_ADST, cc.IDTX):
        coeffs = rng.integers(-(1 << 17), 1 << 17, size=(16, 16)).astype(np.int32)
        pred = rng.integers(0, 1024, size=(16, 16)).astype(np.int32)
        ref = ref_inv_add(lib, coeffs, pred, tx_size, tx_type, bd=10)
        got = np.asarray(tf.inv_txfm2d_add(coeffs[None], pred[None], tx_type,
                                           tx_size, bd=10))[0]
        assert np.array_equal(got, ref.astype(np.int32)), tx_type


@pytest.mark.parametrize("tx_size", [cc.TX_4X4, cc.TX_8X8, cc.TX_16X16,
                                     cc.TX_32X32, cc.TX_64X64, cc.TX_8X16,
                                     cc.TX_16X8, cc.TX_4X16, cc.TX_32X8])
def test_fwd_inv_roundtrip(tx_size):
    """inverse(forward(x)) ~= x: mean abs error under 1 (integer rounding)."""
    rng = np.random.default_rng(5)
    w, h = int(cc.tx_size_wide[tx_size]), int(cc.tx_size_high[tx_size])
    for tx_type in (legal_tx_types(tx_size)[:4] + [cc.IDTX]
                    if cc.IDTX in legal_tx_types(tx_size)
                    else legal_tx_types(tx_size)[:4]):
        pred = rng.integers(0, 256, size=(2, h, w)).astype(np.int32)
        if max(w, h) > 32:
            # 64-point axes normatively discard high frequencies — use
            # smooth (low-frequency) residuals for the round-trip check
            yy, xx = np.mgrid[0:h, 0:w]
            resid = (40 * np.sin(2 * np.pi * yy / h)
                     * np.cos(2 * np.pi * xx / w)).astype(np.int32)[None]
            resid = np.repeat(resid, 2, axis=0)
            src = np.clip(pred + resid, 0, 255)
        else:
            src = np.clip(pred + rng.integers(-64, 64, size=(2, h, w)),
                          0, 255)
        resid = src - pred
        coeffs = np.asarray(tf.fwd_txfm2d(resid, tx_type, tx_size))
        full = np.zeros((2, h, w), dtype=np.int32)
        full[:, :coeffs.shape[1], :coeffs.shape[2]] = coeffs
        recon = np.asarray(tf.inv_txfm2d_add(full, pred, tx_type, tx_size))
        err = np.abs(recon - src).mean()
        assert err < 1.0, (tx_size, tx_type, err)
