"""DLF stage: per-frame filter level search + apply.

Behavioral reference: dlf_process.c:106-131 (full-image distortion eval
per candidate level).  The reference bisects over levels per plane; here
each candidate is ONE whole-frame vectorized filter pass (ops/dlf.py),
so a small candidate ladder around the qindex heuristic is searched
exhaustively and each plane picks its min-SSE level independently
(Y, U, V levels are signaled separately in the frame header).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from svt_av1_tpu.ops import dlf

BLK = 16
CBLK = 8


def default_filter_level(qindex: int) -> int:
    """qindex -> deblock level heuristic (search refines around it)."""
    return int(np.clip((qindex * 3) // 32, 0, 63)) >> 1


def _ladder(d: int) -> Tuple[int, ...]:
    cands = {0, d // 2, d, d + (d // 2) + 1, min(63, 2 * d + 1)}
    return tuple(sorted(cands))


def _sse(a: np.ndarray, b: np.ndarray) -> float:
    d = a.astype(np.int64) - b.astype(np.int64)
    return float((d * d).sum())


def _search_plane(src: np.ndarray, rec: np.ndarray, step: int,
                  levels: Tuple[int, ...], sharpness: int, q_thresh: int,
                  bd: int):
    """Returns (best_level, best_filtered_plane_or_None)."""
    best_lvl, best_sse, best_out = 0, _sse(src, rec), None
    x = rec.astype(np.int32)
    for lvl in levels:
        if lvl == 0:
            continue
        f = np.asarray(dlf.loop_filter_plane_uniform(
            x, step, lvl, sharpness, q_thresh, bd))
        s = _sse(src, f.astype(rec.dtype))
        if s < best_sse:
            best_lvl, best_sse, best_out = lvl, s, f
    return best_lvl, best_out


def maps_from_decisions(decisions, mi_rows: int, mi_cols: int):
    """Per-mi tx/block extent + skip maps for the mask-aware deblocker
    (set_lpf_parameters inputs, deblocking_filter.c:147-157).

    Luma maps at the 4-px mi grid; chroma maps at the 4-chroma-px grid
    (= 8 luma px).  Tx extents come from the coded coefficient shapes
    (our leaf tx == the coded qcoeff array); a skip inter block's tx
    extent is its block extent (get_transform_size with is_skip).

    Returns dict(y=(txw, txh, bw, bh, skip), uv=(txw, txh, bw, bh,
    skip)) of int32/bool arrays."""
    ly = [np.ones((mi_rows, mi_cols), np.int32) for _ in range(4)]
    lsk = np.zeros((mi_rows, mi_cols), bool)
    cr, cc_ = mi_rows // 2, mi_cols // 2
    luv = [np.ones((cr, cc_), np.int32) for _ in range(4)]
    csk = np.zeros((cr, cc_), bool)
    for (r4, c4), d in decisions.items():
        n4 = d.qcoeff_y.shape  # luma tx (rows, cols) in px / 4
        from svt_av1_tpu.codec import constants as cc
        bw4 = int(cc.block_size_wide[d.bsize]) >> 2
        bh4 = int(cc.block_size_high[d.bsize]) >> 2
        skip = bool(d.skip) and bool(d.is_inter)
        tw4 = bw4 if skip else max(1, n4[1] // 4)
        th4 = bh4 if skip else max(1, n4[0] // 4)
        sl = (slice(r4, r4 + bh4), slice(c4, c4 + bw4))
        ly[0][sl] = tw4
        ly[1][sl] = th4
        ly[2][sl] = bw4
        ly[3][sl] = bh4
        lsk[sl] = skip
        # chroma: the block covers b4/2 chroma mi; tx from qcoeff_u
        cw4, ch4 = bw4 // 2, bh4 // 2
        r2, c2 = r4 // 2, c4 // 2
        slc = (slice(r2, r2 + ch4), slice(c2, c2 + cw4))
        if d.qcoeff_u is not None:
            ctw = cw4 if skip else max(1, d.qcoeff_u.shape[1] // 4)
            cth = ch4 if skip else max(1, d.qcoeff_u.shape[0] // 4)
        else:
            ctw, cth = cw4, ch4
        luv[0][slc] = ctw
        luv[1][slc] = cth
        luv[2][slc] = cw4
        luv[3][slc] = ch4
        csk[slc] = skip
    return dict(y=(ly[0], ly[1], ly[2], ly[3], lsk),
                uv=(luv[0], luv[1], luv[2], luv[3], csk))


def flens_from_maps(maps):
    """Vertical/horizontal per-mi filter-length maps for both plane
    groups (edge_flens over the direction-appropriate extents)."""
    txw, txh, bw, bh, sk = maps["y"]
    y_v = np.asarray(dlf.edge_flens(txw, bw, sk, True))
    y_h = np.asarray(dlf.edge_flens(txh.T, bh.T, sk.T, True)).T
    ctxw, ctxh, cbw, cbh, csk = maps["uv"]
    uv_v = np.asarray(dlf.edge_flens(ctxw, cbw, csk, False))
    uv_h = np.asarray(dlf.edge_flens(ctxh.T, cbh.T, csk.T, False)).T
    return dict(y_v=y_v, y_h=y_h, uv_v=uv_v, uv_h=uv_h)


def apply_masked(recon: Dict[str, np.ndarray], fp, flens,
                 bd: int = 8) -> Dict[str, np.ndarray]:
    """Mask-aware deblock of all planes (encoder and verification
    decoder share this; svt_av1_loop_filter_frame role)."""
    out = dict(recon)
    dt = recon["y"].dtype
    ly = fp.filter_level[0]
    if ly > 0:
        y = dlf.loop_filter_plane_masked(
            recon["y"].astype(np.int32), flens["y_v"], flens["y_h"],
            ly, fp.sharpness, True, bd)
        out["y"] = np.asarray(y).astype(dt)
    lu, lv = fp.filter_level_uv
    if lu > 0:
        u = dlf.loop_filter_plane_masked(
            recon["u"].astype(np.int32), flens["uv_v"], flens["uv_h"],
            lu, fp.sharpness, False, bd)
        out["u"] = np.asarray(u).astype(dt)
    if lv > 0:
        v = dlf.loop_filter_plane_masked(
            recon["v"].astype(np.int32), flens["uv_v"], flens["uv_h"],
            lv, fp.sharpness, False, bd)
        out["v"] = np.asarray(v).astype(dt)
    return out


def search_and_apply_masked(src: Dict[str, np.ndarray],
                            recon: Dict[str, np.ndarray], fp, flens,
                            bd: int = 8) -> Dict[str, np.ndarray]:
    """Per-plane level search with the mask-aware filter (mixed-size
    frames; dlf_process.c:106-131 role)."""
    qindex = fp.base_q_idx
    d = default_filter_level(qindex)
    out = dict(recon)
    dt = recon["y"].dtype

    def search(plane, vk, hk, levels, is_luma):
        srcp = src[plane]
        rec = recon[plane].astype(np.int32)
        best_lvl, best_sse, best_out = 0, _sse(srcp, recon[plane]), None
        for lvl in levels:
            if lvl == 0:
                continue
            f = np.asarray(dlf.loop_filter_plane_masked(
                rec, flens[vk], flens[hk], lvl, fp.sharpness, is_luma,
                bd))
            s = _sse(srcp, f.astype(dt))
            if s < best_sse:
                best_lvl, best_sse, best_out = lvl, s, f
        return best_lvl, best_out

    ly, fy = search("y", "y_v", "y_h", _ladder(d), True)
    fp.filter_level = (ly, ly)
    if fy is not None:
        out["y"] = fy.astype(dt)
    if ly == 0:
        # chroma levels are only coded when a luma level is nonzero
        # (uncompressed-header syntax) — the decoder would read 0
        fp.filter_level_uv = (0, 0)
        return out
    duv = max(0, d - 2)
    lu, fu = search("u", "uv_v", "uv_h", _ladder(duv), False)
    lv, fv = search("v", "uv_v", "uv_h", _ladder(duv), False)
    fp.filter_level_uv = (lu, lv)
    if fu is not None:
        out["u"] = fu.astype(dt)
    if fv is not None:
        out["v"] = fv.astype(dt)
    return out


def search_and_apply(src: Dict[str, np.ndarray],
                     recon: Dict[str, np.ndarray], fp,
                     bd: int = 8) -> Dict[str, np.ndarray]:
    """Search per-plane filter levels (min SSE vs source), record them in
    the frame header fields, and return the filtered recon."""
    qindex = fp.base_q_idx
    d = default_filter_level(qindex)
    out = dict(recon)
    dt = recon["y"].dtype

    ly, fy = _search_plane(src["y"], recon["y"], BLK, _ladder(d),
                           fp.sharpness, 14, bd)
    fp.filter_level = (ly, ly)
    if fy is not None:
        out["y"] = fy.astype(dt)

    if ly == 0:
        # chroma levels are only coded when a luma level is nonzero
        # (uncompressed-header syntax) — the decoder would read 0
        fp.filter_level_uv = (0, 0)
        return out
    duv = max(0, d - 2)
    luv_levels = _ladder(duv)
    lu, fu = _search_plane(src["u"], recon["u"], CBLK, luv_levels,
                           fp.sharpness, 6, bd)
    lv, fv = _search_plane(src["v"], recon["v"], CBLK, luv_levels,
                           fp.sharpness, 6, bd)
    fp.filter_level_uv = (lu, lv)
    if fu is not None:
        out["u"] = fu.astype(dt)
    if fv is not None:
        out["v"] = fv.astype(dt)
    return out
