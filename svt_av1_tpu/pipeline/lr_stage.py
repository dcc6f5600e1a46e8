"""Loop-restoration frame stage: stripe-based normative apply + SGR
search.

Behavioral reference: restoration.c (svt_av1_loop_restoration_filter_
frame, setup_processing_stripe_boundary, save_tile_row_boundary_lines)
and restoration_pick.c (get_proj_subspace / encode_xq).  Single tile.

The frame splits into 64-row processing stripes offset by 8 (chroma:
32/4); each stripe's 3 rows of vertical context come from the DEBLOCKED
frame (2 saved rows, outer one duplicated), while the frame top/bottom
use edge replication of the CDEF output.  Horizontal context is edge
replication of the CDEF frame rows themselves.

Round-1 encoder search: per restoration unit, SWITCHABLE between
RESTORE_NONE and RESTORE_SGRPROJ (all 16 ep classes, projection
coefficients solved by least squares).  Wiener decode/apply is
supported; its tap solver lands next round.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax.numpy as jnp

from svt_av1_tpu.codec import lr as lr_mod
from svt_av1_tpu.ops import restoration as rst

STRIPE = 64
OFFSET = 8
CTX_VERT = 2
BORDER = 3


def save_boundaries(deblocked: Dict[str, np.ndarray]) -> Dict:
    """Per-plane saved stripe-boundary rows from the deblocked frame."""
    out = {}
    for plane, ss in (("y", 0), ("u", 1), ("v", 1)):
        p = np.asarray(deblocked[plane]).astype(np.int32)
        H = p.shape[0]
        sh = STRIPE >> ss
        off = OFFSET >> ss
        above = {}
        below = {}
        k = 0
        while True:
            y0 = max(0, k * sh - off)
            if y0 >= H:
                break
            y1 = min((k + 1) * sh - off, H)
            if k > 0:
                above[k] = p[y0 - CTX_VERT:y0].copy()
            if y1 < H:
                below[k] = p[y1:y1 + CTX_VERT].copy()
            k += 1
        out[plane] = (above, below)
    return out


def _stripe_chunks(v_start: int, v_end: int, H: int, ss: int):
    """Chunks of a restoration unit aligned to processing stripes:
    yields (y, h, copy_above, copy_below, stripe_index)."""
    sh = STRIPE >> ss
    off = OFFSET >> ss
    y = v_start
    while y < v_end:
        stripe = (y + off) // sh
        nominal = sh - (off if stripe == 0 else 0)
        h = min(nominal, v_end - y)
        copy_above = y != 0
        copy_below = (y + nominal) < H
        yield y, h, copy_above, copy_below, stripe
        y += h


def _unit_ranges(length: int, unit: int) -> List[Tuple[int, int]]:
    """RU spans along one axis (last unit absorbs < unit/2 remainder)."""
    out = []
    x = 0
    while x < length:
        rem = length - x
        w = rem if rem < unit * 3 // 2 else unit
        out.append((x, w))
        x += w
    return out


def _v_ranges(length: int, unit: int, ss: int) -> List[Tuple[int, int]]:
    """Vertical RU spans, shifted up by the stripe offset."""
    off = OFFSET >> ss
    spans = _unit_ranges(length, unit)
    out = []
    for i, (y, h) in enumerate(spans):
        v0 = max(0, y - off)
        v1 = y + h - (off if (y + h) < length else 0)
        out.append((v0, v1 - v0))
    return out


def _window(plane: np.ndarray, bounds, y: int, x: int, h: int, w: int,
            copy_above: bool, copy_below: bool, stripe: int,
            extra_w: int) -> np.ndarray:
    """(h + 6, w + 6 + extra_w) int32 filter input: CDEF rows with the
    stripe-boundary substitution and edge-replicated padding."""
    above, below = bounds
    H, W = plane.shape
    rows = []
    for i in range(-BORDER, h + BORDER):
        yy = y + i
        if i < 0 and copy_above:
            src = above[stripe][max(i + CTX_VERT, 0)]
        elif i >= h and copy_below:
            src = below[stripe][min(i - h, CTX_VERT - 1)]
        else:
            src = plane[min(max(yy, 0), H - 1)]
        rows.append(src)
    m = np.stack(rows)
    cols = np.clip(np.arange(x - BORDER, x + w + BORDER + extra_w),
                   0, W - 1)
    return m[:, cols]


def _filter_unit(plane, bounds, u: lr_mod.RestUnitInfo, plane_idx: int,
                 v0: int, uh: int, x: int, w: int, out: np.ndarray,
                 bd: int) -> None:
    H = plane.shape[0]
    ss = 1 if plane_idx else 0
    for (y, h, ca, cb, stripe) in _stripe_chunks(v0, v0 + uh, H, ss):
        if u.rtype == lr_mod.RESTORE_WIENER:
            win = _window(plane, bounds, y, x, h, w, ca, cb, stripe, 1)
            fx = u.wiener.taps8(horiz=True)[None]
            fy = u.wiener.taps8(horiz=False)[None]
            res = np.asarray(rst.wiener_filter(win[None], fx, fy, w, h,
                                               bd=bd))[0]
        elif u.rtype == lr_mod.RESTORE_SGRPROJ:
            win = _window(plane, bounds, y, x, h, w, ca, cb, stripe, 0)
            res = np.asarray(rst.apply_selfguided(
                win[None], u.sgrproj.ep,
                np.array([u.sgrproj.xqd[0]]), np.array([u.sgrproj.xqd[1]]),
                h, w, bd=bd))[0]
        else:
            continue
        out[y:y + h, x:x + w] = res


def apply_lr(cdef_recon: Dict[str, np.ndarray], bounds_all: Dict,
             lr_info: List[lr_mod.PlaneLrInfo], bd: int = 8
             ) -> Dict[str, np.ndarray]:
    out_frame = dict(cdef_recon)
    for plane_idx, plane_name in enumerate(("y", "u", "v")):
        info = lr_info[plane_idx]
        if info.frame_type == lr_mod.RESTORE_NONE:
            continue
        plane = np.asarray(cdef_recon[plane_name]).astype(np.int32)
        H, W = plane.shape
        ss = 1 if plane_idx else 0
        out = plane.copy()
        vspans = _v_ranges(H, info.unit_size, ss)
        hspans = _unit_ranges(W, info.unit_size)
        for ur, (v0, uh) in enumerate(vspans):
            for uc, (x, w) in enumerate(hspans):
                u = info.units[ur][uc]
                if u.rtype != lr_mod.RESTORE_NONE:
                    _filter_unit(plane, bounds_all[plane_name], u,
                                 plane_idx, v0, uh, x, w, out, bd)
        dt = np.uint8 if bd == 8 else np.uint16
        out_frame[plane_name] = out.astype(dt)
    return out_frame


def _solve_xq(u, flt0, flt1, s, r0: int, r1: int) -> Tuple[int, int]:
    """Least-squares projection (restoration_pick.c get_proj_subspace +
    encode_xq): returns quantized (xqd0, xqd1)."""
    d = (s - u).astype(np.float64).reshape(-1)
    f0 = (flt0 - u).astype(np.float64).reshape(-1) if r0 else None
    f1 = (flt1 - u).astype(np.float64).reshape(-1) if r1 else None
    x0 = x1 = 0.0
    if r0 and r1:
        h00 = float(f0 @ f0)
        h11 = float(f1 @ f1)
        h01 = float(f0 @ f1)
        c0 = float(f0 @ d)
        c1 = float(f1 @ d)
        det = h00 * h11 - h01 * h01
        if abs(det) > 1e-8:
            x0 = (h11 * c0 - h01 * c1) / det
            x1 = (h00 * c1 - h01 * c0) / det
    elif r0:
        h00 = float(f0 @ f0)
        if h00 > 1e-8:
            x0 = float(f0 @ d) / h00
    elif r1:
        h11 = float(f1 @ f1)
        if h11 > 1e-8:
            x1 = float(f1 @ d) / h11
    q = 1 << 7  # SGRPROJ_PRJ_BITS
    xq0 = int(round(x0 * q))
    xq1 = int(round(x1 * q))
    if not r0:
        xqd0 = 0
        xqd1 = int(np.clip(q - xq1, lr_mod.SGRPROJ_PRJ_MIN1,
                           lr_mod.SGRPROJ_PRJ_MAX1))
    elif not r1:
        xqd0 = int(np.clip(xq0, lr_mod.SGRPROJ_PRJ_MIN0,
                           lr_mod.SGRPROJ_PRJ_MAX0))
        xqd1 = int(np.clip(q - xqd0, lr_mod.SGRPROJ_PRJ_MIN1,
                           lr_mod.SGRPROJ_PRJ_MAX1))
    else:
        xqd0 = int(np.clip(xq0, lr_mod.SGRPROJ_PRJ_MIN0,
                           lr_mod.SGRPROJ_PRJ_MAX0))
        xqd1 = int(np.clip(q - xqd0 - xq1, lr_mod.SGRPROJ_PRJ_MIN1,
                           lr_mod.SGRPROJ_PRJ_MAX1))
    return xqd0, xqd1


def _wiener_stats(dgd: np.ndarray, src: np.ndarray, y0: int, x0: int,
                  h: int, w: int, win: int):
    """Exact auto/cross-correlation stats for the separable Wiener solve
    (restoration_pick.c svt_av1_compute_stats semantics: means removed,
    windows read the edge-extended degraded frame).  Returns
    (H (win²,win²), M (win²,)) as one BLAS Gram product."""
    half = win // 2
    pad = np.pad(dgd, half, mode="edge").astype(np.float64)
    avg = dgd[y0:y0 + h, x0:x0 + w].astype(np.float64).mean()
    s = (src[y0:y0 + h, x0:x0 + w].astype(np.float64) - avg).reshape(-1)
    cols = []
    for k in range(win):
        for l in range(win):
            cols.append((pad[y0 + k:y0 + k + h, x0 + l:x0 + l + w]
                         - avg).reshape(-1))
    Y = np.stack(cols, axis=1)            # (h*w, win*win)
    return Y.T @ Y, Y.T @ s


def _solve_wiener(dgd: np.ndarray, src: np.ndarray, y0: int, x0: int,
                  h: int, w: int, chroma: bool):
    """Alternating separable Wiener solve with symmetric, sum-one taps;
    returns quantized (vfilter3, hfilter3) or None if degenerate."""
    win = 5 if chroma else 7
    half = win // 2
    Hm, Mv = _wiener_stats(dgd, src, y0, x0, h, w, win)
    H4 = Hm.reshape(win, win, win, win)   # [k, l, k2, l2]
    M2 = Mv.reshape(win, win)             # [k, l]

    a = np.zeros(win)
    b = np.zeros(win)
    a[:] = 1.0 / win
    b[:] = 1.0 / win

    def solve_half(other, vert: bool):
        """LS for symmetric taps u0..u_{half-1}, center = 1 - 2*sum(u)."""
        if vert:
            # unknown over k: G[k,k2] = sum_{l,l2} b_l b_l2 H[k,l,k2,l2]
            G = np.einsum("l,m,klxm->kx", other, other, H4)
            cvec = M2 @ other
        else:
            G = np.einsum("l,m,lkmx->kx", other, other, H4)
            cvec = other @ M2
        nh = half
        A = np.zeros((nh, nh))
        rhs = np.zeros(nh)
        # basis vectors: e_i = delta_i + delta_{win-1-i} - 2*delta_half
        # around the base point a0 = delta_half (center tap 1)
        base_vec = np.zeros(win)
        base_vec[half] = 1.0
        basis = []
        for i in range(nh):
            e = np.zeros(win)
            e[i] = 1.0
            e[win - 1 - i] = 1.0
            e[half] = -2.0
            basis.append(e)
        for i in range(nh):
            rhs[i] = basis[i] @ (cvec - G @ base_vec)
            for j in range(nh):
                A[i, j] = basis[i] @ G @ basis[j]
        try:
            u = np.linalg.solve(A, rhs)
        except np.linalg.LinAlgError:
            return None
        return base_vec + sum(u[i] * basis[i] for i in range(nh))

    for _ in range(10):
        nb = solve_half(a, vert=False)
        if nb is None:
            return None
        b = nb
        na = solve_half(b, vert=True)
        if na is None:
            return None
        a = na

    def quantize(t, chroma_):
        taps = []
        full = np.zeros(3)
        if chroma_:
            full[0] = 0.0
            full[1] = t[0]
            full[2] = t[1]
        else:
            full[:] = t[:3]
        for i in range(3):
            minv, maxv, _, _ = lr_mod.WIENER_TAPS[i]
            q = int(np.clip(round(full[i] * 128), minv, maxv))
            taps.append(q)
        if chroma_:
            taps[0] = 0
        return tuple(taps)

    vf = quantize(a[:3] if not chroma else a[:2], chroma)
    hf = quantize(b[:3] if not chroma else b[:2], chroma)
    return vf, hf


def search_lr(src: Dict[str, np.ndarray], cdef_recon: Dict[str, np.ndarray],
              bounds_all: Dict, lr_info: List[lr_mod.PlaneLrInfo],
              bd: int = 8, eps_set=tuple(range(16))) -> None:
    """Fill lr_info units: per RU pick NONE vs best SGRPROJ by SSE."""
    for plane_idx, plane_name in enumerate(("y", "u", "v")):
        info = lr_info[plane_idx]
        if info.frame_type == lr_mod.RESTORE_NONE:
            continue
        plane = np.asarray(cdef_recon[plane_name]).astype(np.int32)
        sp = np.asarray(src[plane_name]).astype(np.int32)
        H, W = plane.shape
        ss = 1 if plane_idx else 0
        vspans = _v_ranges(H, info.unit_size, ss)
        hspans = _unit_ranges(W, info.unit_size)
        bounds = bounds_all[plane_name]
        for ur, (v0, uh) in enumerate(vspans):
            for uc, (x, w) in enumerate(hspans):
                region_sse0 = float(np.sum(
                    (plane[v0:v0 + uh, x:x + w]
                     - sp[v0:v0 + uh, x:x + w]).astype(np.int64) ** 2))
                best = (region_sse0, lr_mod.RestUnitInfo())
                for ep in eps_set:
                    r0, r1 = lr_mod._sgr_r(ep)
                    # gather filters + data over the unit's chunks
                    flt0s, flt1s, us_, ss_ = [], [], [], []
                    chunks = list(_stripe_chunks(v0, v0 + uh, H, ss))
                    for (y, h, ca, cb, stripe) in chunks:
                        win = _window(plane, bounds, y, x, h, w, ca, cb,
                                      stripe, 0)
                        f0, f1 = rst.selfguided_restoration(
                            win[None], ep, h, w, bd)
                        flt0s.append(np.asarray(f0)[0])
                        flt1s.append(np.asarray(f1)[0])
                        dat = win[BORDER:BORDER + h, BORDER:BORDER + w]
                        us_.append(dat << 4)
                        ss_.append(sp[y:y + h, x:x + w] << 4)
                    ucat = np.concatenate([a.reshape(-1) for a in us_])
                    scat = np.concatenate([a.reshape(-1) for a in ss_])
                    f0cat = np.concatenate(
                        [a.reshape(-1) for a in flt0s])
                    f1cat = np.concatenate(
                        [a.reshape(-1) for a in flt1s])
                    xqd = _solve_xq(ucat, f0cat, f1cat, scat, r0, r1)
                    cand = lr_mod.RestUnitInfo(
                        rtype=lr_mod.RESTORE_SGRPROJ,
                        sgrproj=lr_mod.SgrprojInfo(ep, xqd))
                    # candidate SSE via the real apply
                    tmp = plane.copy()
                    _filter_unit(plane, bounds, cand, plane_idx, v0, uh,
                                 x, w, tmp, bd)
                    sse = float(np.sum(
                        (tmp[v0:v0 + uh, x:x + w]
                         - sp[v0:v0 + uh, x:x + w]).astype(np.int64) ** 2))
                    if sse < best[0]:
                        best = (sse, cand)
                wf = _solve_wiener(plane, sp, v0, x, uh, w,
                                   chroma=plane_idx > 0)
                if wf is not None:
                    cand = lr_mod.RestUnitInfo(
                        rtype=lr_mod.RESTORE_WIENER,
                        wiener=lr_mod.WienerInfo(wf[0], wf[1]))
                    tmp = plane.copy()
                    _filter_unit(plane, bounds, cand, plane_idx, v0, uh,
                                 x, w, tmp, bd)
                    sse = float(np.sum(
                        (tmp[v0:v0 + uh, x:x + w]
                         - sp[v0:v0 + uh, x:x + w]).astype(np.int64) ** 2))
                    if sse < best[0]:
                        best = (sse, cand)
                info.units[ur][uc] = best[1]
