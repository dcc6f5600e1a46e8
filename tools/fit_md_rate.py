#!/usr/bin/env python
"""Calibrate MD rate tables against the REAL entropy coder.

Context-averaged CDF costs misprice coefficient blocks badly (a zero in
a zero neighborhood costs ~0.1 bits, not the 1.7-bit context average).
This tool measures exact default-CDF txb bits with the actual coder
(codec/coeff.encode_txb, update=False) over MD-produced coefficient
blocks at several qindexes, then least-squares fits the feature model
used by pipeline/intra_encoder._txb_bits:

    bits ~= base + sum_l count(l) * c[l] + zeros_before_eob * c[0]
            + eob_cls_cost[pt(eob)]

Writes codec/data/md_rate_fit.npz with per-q-bucket luma/chroma tables;
codec/rate_est.py prefers them over the analytic approximation.
"""
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from svt_av1_tpu.codec import coeff as coeff_mod
from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.codec.cdf import FrameCDFs, get_q_ctx
from svt_av1_tpu.codec.entropy import RangeEncoder

MAX_LEVEL = 63


def measure_bits(qcoeff, tx_size, plane_type, cdfs):
    enc = RangeEncoder()
    coeff_mod.encode_txb(enc, cdfs, qcoeff, tx_size, cc.DCT_DCT,
                         plane_type, 0, 0, update=False)
    return enc.tell_bits()


def measure_bits_adapted(blocks, tx_size, plane_type, cdfs):
    """Per-txb marginal bits with LIVE CDF adaptation over the block
    sequence (frame coding order) — what the emitted stream actually
    pays.  Static default-CDF costs overprice levels ~2x once the coder
    adapts; RDOQ must price with these."""
    enc = RangeEncoder()
    c = cdfs.clone()
    out = []
    prev = 0.0
    for q in blocks:
        coeff_mod.encode_txb(enc, c, q, tx_size, cc.DCT_DCT,
                             plane_type, 0, 0, update=True)
        t = enc.tell_bits()
        out.append(t - prev)
        prev = t
    return np.asarray(out, np.float64)


def features(qcoeff, scan_pos, npt):
    aq = np.abs(qcoeff).reshape(-1)
    pos = scan_pos.reshape(-1)
    nz = aq > 0
    eob = int((pos[nz] + 1).max()) if nz.any() else 0
    f = np.zeros(1 + (MAX_LEVEL + 1) + npt)
    f[0] = 1.0
    if eob == 0:
        return f, 0
    lv = np.clip(aq, 0, MAX_LEVEL)
    cnt = np.bincount(lv[nz], minlength=MAX_LEVEL + 1)
    f[1 + 1:1 + MAX_LEVEL + 1] = cnt[1:]
    f[1] = eob - nz.sum()          # zeros before eob
    pt = (1 if eob == 1 else 2 if eob == 2
          else int(np.floor(np.log2(eob - 1))) + 2)
    f[1 + MAX_LEVEL + 1 + pt - 1] = 1.0
    return f, eob


def scan_pos_of(tx_size):
    from svt_av1_tpu.codec import tables as tb
    scan = np.asarray(tb.get_scan(tx_size, cc.DCT_DCT))
    pos = np.zeros(scan.shape[0], np.int32)
    pos[scan] = np.arange(scan.shape[0], dtype=np.int32)
    return pos


def gather_blocks(qindex):
    """MD-distribution coefficient blocks at this qindex."""
    from svt_av1_tpu.pipeline import intra_encoder as ie
    rng = np.random.default_rng(qindex)
    H, W = 128, 128
    frames = []
    yy, xx = np.mgrid[0:H, 0:W]
    for t in range(6):
        y = (96 + 60 * np.sin(xx / (11 + 2 * t) + t)
             + 50 * np.cos(yy / (17 + t)) + rng.integers(-9, 10, (H, W)))
        y = np.clip(y, 0, 255).astype(np.uint8)
        u = np.clip(128 + 50 * np.sin(xx[::2, ::2] / 13.0 + t), 0,
                    255).astype(np.uint8)
        v = np.clip(128 + 50 * np.cos(yy[::2, ::2] / 9.0), 0,
                    255).astype(np.uint8)
        frames.append((y, u, v))
    res = ie.encode_intra_frames(frames, qindex, as_arrays=True)
    qys, qus = [], []
    for (ym, um, qy, qu, qv, gh, gw), _ in res:
        qys.append(qy.astype(np.int32).reshape(-1, 16, 16))
        qus.append(qu.astype(np.int32).reshape(-1, 8, 8))
        qus.append(qv.astype(np.int32).reshape(-1, 8, 8))
    return np.concatenate(qys), np.concatenate(qus)


def fit(blocks, tx_size, plane_type, cdfs, npt, adapted=False):
    sp = scan_pos_of(tx_size).reshape(blocks.shape[1:])
    X, y = [], []
    if adapted:
        bits_all = measure_bits_adapted(blocks, tx_size, plane_type,
                                        cdfs)
    for bi, q in enumerate(blocks):
        f, eob = features(q, sp, npt)
        if eob == 0:
            continue
        X.append(f)
        y.append(bits_all[bi] if adapted
                 else measure_bits(q, tx_size, plane_type, cdfs))
    X = np.array(X)
    y = np.array(y, np.float64)
    # ridge for unobserved levels
    lam = 1e-3
    A = X.T @ X + lam * np.eye(X.shape[1])
    w = np.linalg.solve(A, X.T @ y)
    base = w[0]
    coef = np.zeros(MAX_LEVEL + 1, np.float32)
    coef[0] = max(w[1], 0.01)
    prev = 0.5
    for lvl in range(1, MAX_LEVEL + 1):
        c = w[1 + lvl]
        if np.count_nonzero(X[:, 1 + lvl]) < 8:
            c = prev + 0.6      # sparse data: extrapolate monotonically
        coef[lvl] = max(c, prev + 0.01)
        prev = coef[lvl]
    eob_cls = w[1 + MAX_LEVEL + 1:]
    n = int(np.sqrt(blocks.shape[1] * blocks.shape[2]))
    eob_tbl = np.zeros(blocks.shape[1] * blocks.shape[2] + 1, np.float32)
    for eob in range(1, len(eob_tbl)):
        pt = (1 if eob == 1 else 2 if eob == 2
              else int(np.floor(np.log2(eob - 1))) + 2)
        eob_tbl[eob] = max(eob_cls[pt - 1] + base, 0.0)
    resid = y - X @ w
    print(f"  tx{tx_size} plane{plane_type}: {len(y)} txbs, "
          f"rms err {np.sqrt(np.mean(resid ** 2)):.2f} bits "
          f"(mean {np.mean(y):.1f})")
    return coef, eob_tbl


def main():
    adapted = "--adapted" in sys.argv
    out = {}
    for qindex in (15, 40, 90, 180):
        bucket = get_q_ctx(qindex)
        cdfs = FrameCDFs(qindex)
        print(f"qindex {qindex} (bucket {bucket}):")
        qys, qus = gather_blocks(qindex)
        cy, ey = fit(qys, cc.TX_16X16, 0, cdfs, 9, adapted=adapted)
        cu, eu = fit(qus, cc.TX_8X8, 1, cdfs, 7, adapted=adapted)
        out[f"b{bucket}_coef_y"] = cy
        out[f"b{bucket}_eob_y"] = ey
        out[f"b{bucket}_coef_uv"] = cu
        out[f"b{bucket}_eob_uv"] = eu
    name = ("md_rate_fit_adapted.npz" if adapted else "md_rate_fit.npz")
    path = os.path.join(ROOT, "svt_av1_tpu", "codec", "data", name)
    np.savez_compressed(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
