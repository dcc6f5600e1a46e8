"""Shared definitions for the committed golden vectors (tests/golden/).

Each case has a deterministic input generator (regenerated identically by
the test and by tools/gen_golden.py) and an oracle reference evaluator
(used only at generation time, on a machine with the reference build).
The committed outputs make the normative bit-exactness tests independent
of the oracle: they are spec-fixed functions whose outputs never change.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# -- inverse transforms ------------------------------------------------------


def legal_tx_types(tx_size):
    from svt_av1_tpu.codec import constants as cc
    w, h = int(cc.tx_size_wide[tx_size]), int(cc.tx_size_high[tx_size])
    if max(w, h) > 32:
        return [cc.DCT_DCT]
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


def inv_txfm_input(tx_size: int, tx_type: int, bd: int = 8):
    """(coeffs (h,w) int32, pred (h,w) int32) — deterministic."""
    from svt_av1_tpu.codec import constants as cc
    rng = np.random.default_rng(1000 * (tx_size + 1) + 7 * tx_type + bd)
    w, h = int(cc.tx_size_wide[tx_size]), int(cc.tx_size_high[tx_size])
    kw, kh = min(w, 32), min(h, 32)
    lim = 1 << (15 if bd == 8 else 17)
    coeffs = np.zeros((h, w), dtype=np.int32)
    coeffs[:kh, :kw] = rng.integers(-lim, lim, size=(kh, kw))
    pred = rng.integers(0, 1 << bd, size=(h, w)).astype(np.int32)
    return coeffs, pred


def inv_txfm_cases():
    from svt_av1_tpu.codec import constants as cc
    for tx_size in range(cc.TX_SIZES_ALL):
        for tx_type in legal_tx_types(tx_size):
            yield tx_size, tx_type, 8
    for tx_type in (cc.DCT_DCT, cc.ADST_ADST, cc.IDTX):
        yield cc.TX_16X16, tx_type, 10


# -- intra predictors --------------------------------------------------------

INTRA_SIZES = [(4, 4), (8, 8), (16, 16), (32, 32), (64, 64),
               (8, 4), (4, 8), (16, 8), (8, 16), (32, 16), (16, 32)]


def intra_ref_names():
    from svt_av1_tpu.codec import constants as cc
    return {
        cc.DC_PRED: "dc_predictor",
        cc.V_PRED: "v_predictor",
        cc.H_PRED: "h_predictor",
        cc.SMOOTH_PRED: "smooth_predictor",
        cc.SMOOTH_V_PRED: "smooth_v_predictor",
        cc.SMOOTH_H_PRED: "smooth_h_predictor",
        cc.PAETH_PRED: "paeth_predictor",
    }


def intra_input(mode: int, w: int, h: int):
    """(above (w,), left (h,), corner scalar) uint8 — deterministic."""
    rng = np.random.default_rng(500 + mode * 31 + w * 3 + h)
    full = rng.integers(0, 256, size=w + 1).astype(np.uint8)
    left = rng.integers(0, 256, size=h).astype(np.uint8)
    return full[1:].copy(), left, int(full[0])


# -- range coder -------------------------------------------------------------


def range_coder_ops(seed: int, n_ops: int = 400):
    """Deterministic mixed symbol/bool op sequence.

    Returns list of ("sym", s, icdf, nsyms) / ("bool", v, f) tuples.
    icdf rows follow the AV1 inverse-CDF convention (32768-cdf,
    strictly decreasing, final 0)."""
    rng = np.random.default_rng(9000 + seed)
    ops = []
    for _ in range(n_ops):
        if rng.random() < 0.3:
            ops.append(("bool", int(rng.integers(0, 2)),
                        int(rng.integers(1, 32767))))
        else:
            nsyms = int(rng.integers(2, 17))
            # random strictly-increasing cdf -> inverse cdf
            cuts = np.sort(rng.choice(np.arange(1, 32768), size=nsyms - 1,
                                      replace=False))
            cdf = np.concatenate([cuts, [32768]])
            icdf = (32768 - cdf).astype(np.uint16)
            s = int(rng.integers(0, nsyms))
            ops.append(("sym", s, icdf, nsyms))
    return ops


# -- oracle reference evaluators (generation time only) ----------------------


def oracle_inv_txfm(lib, coeffs, pred, tx_size, tx_type, bd=8):
    from svt_av1_tpu.codec import constants as cc
    w, h = int(cc.tx_size_wide[tx_size]), int(cc.tx_size_high[tx_size])
    kw, kh = min(w, 32), min(h, 32)
    inp = np.zeros(kh * kw, dtype=np.int32)
    inp[:] = coeffs[:kh, :kw].reshape(-1)
    out = pred.astype(np.uint16).copy()
    fn = getattr(lib, f"svt_av1_inv_txfm2d_add_{w}x{h}_c")
    args = [inp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            ctypes.c_int32(w),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            ctypes.c_int32(w),
            ctypes.c_int32(tx_type)]
    if w != h:
        args.append(ctypes.c_int32(tx_size))
        if (w, h) not in ((4, 8), (8, 4), (4, 16), (16, 4)):
            args.append(ctypes.c_int32(w * h))
    args.append(ctypes.c_int32(bd))
    fn.restype = None
    fn(*args)
    return out.astype(np.int32)


def oracle_intra(lib, mode, w, h):
    above, left, corner = intra_input(mode, w, h)
    full = np.concatenate([[corner], above]).astype(np.uint8)
    above_ptr = full[1:]
    fn = getattr(lib, f"svt_aom_{intra_ref_names()[mode]}_{w}x{h}_c")
    dst = np.zeros((h, w), dtype=np.uint8)
    fn.restype = None
    fn(dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       ctypes.c_ssize_t(w),
       above_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       left.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return dst
