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
