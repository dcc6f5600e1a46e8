"""Deblocking (loop) filter — AV1 spec §7.14, JAX batched.

Behavioral reference: deblocking_common.c (filter4/6/8/14 + masks) and
deblocking_filter.c (level/threshold derivation).  TPU redesign: instead
of per-edge scalar calls, all edges of a plane are filtered as one
batched gather → mask/filter → scatter pass (vertical edges, then
horizontal), which is exact because AV1 edge spacing (>= 8 px for the
filters' reach) makes same-direction edges independent.

This module provides the line filters over (L, taps) sample batches and
a whole-plane driver for the uniform-transform-grid case produced by the
round-1 intra pipeline (16x16 luma / 8x8 chroma).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def loop_filter_thresholds(level: int, sharpness: int = 0
                           ) -> Tuple[int, int, int]:
    """(blimit, limit, hev_thresh) per spec threshold derivation."""
    lim = level >> ((sharpness > 0) + (sharpness > 4))
    if sharpness > 0:
        lim = min(lim, 9 - sharpness)
    lim = max(lim, 1)
    return 2 * (level + 2) + lim, lim, level >> 4


def _sc(x, shift=0):
    """signed char clamp, scaled for high bit depth (bd-8 shift)."""
    return jnp.clip(x, -128 << shift, (128 << shift) - 1)


def _r3(x):
    return (x + 4) >> 3


def _r4(x):
    return (x + 8) >> 4


def filter_lines(lines: jnp.ndarray, blimit: int, limit: int, thresh: int,
                 filter_len: int, bd: int = 8) -> jnp.ndarray:
    """Filter a batch of edge-perpendicular pixel lines.

    lines: (L, 14) int32, samples p6..p0 (cols 0..6) then q0..q6
           (cols 7..13); the edge sits between cols 6 and 7.
    filter_len in {4, 6, 8, 14}.  Returns filtered (L, 14).
    Bit-exact with svt_aom_lpf_*_{4,6,8,14}_c and the highbd variants
    (thresholds/clamps scaled by bd-8)."""
    sh = bd - 8
    blimit <<= sh
    limit <<= sh
    thresh <<= sh
    flat_th = 1 << sh
    x = jnp.asarray(lines).astype(jnp.int32)
    p = {i: x[:, 6 - i] for i in range(7)}
    q = {i: x[:, 7 + i] for i in range(7)}
    ad = lambda a, b: jnp.abs(a - b)

    # ---- masks ----
    hev = (ad(p[1], p[0]) > thresh) | (ad(q[1], q[0]) > thresh)
    outer = ad(p[0], q[0]) * 2 + ad(p[1], q[1]) // 2 > blimit
    if filter_len == 4:
        mask = ~((ad(p[1], p[0]) > limit) | (ad(q[1], q[0]) > limit)
                 | outer)
    elif filter_len == 6:
        mask = ~((ad(p[2], p[1]) > limit) | (ad(p[1], p[0]) > limit)
                 | (ad(q[1], q[0]) > limit) | (ad(q[2], q[1]) > limit)
                 | outer)
    else:
        mask = ~((ad(p[3], p[2]) > limit) | (ad(p[2], p[1]) > limit)
                 | (ad(p[1], p[0]) > limit) | (ad(q[1], q[0]) > limit)
                 | (ad(q[2], q[1]) > limit) | (ad(q[3], q[2]) > limit)
                 | outer)

    # ---- filter4 (always computed; used where not flat) ----
    off = 128 << sh
    ps1, ps0 = p[1] - off, p[0] - off
    qs0, qs1 = q[0] - off, q[1] - off
    f = jnp.where(hev, _sc(ps1 - qs1, sh), 0)
    f = jnp.where(mask, _sc(f + 3 * (qs0 - ps0), sh), 0)
    f1 = _sc(f + 4, sh) >> 3
    f2 = _sc(f + 3, sh) >> 3
    n_q0 = _sc(qs0 - f1, sh) + off
    n_p0 = _sc(ps0 + f2, sh) + off
    fo = jnp.where(hev, 0, (f1 + 1) >> 1)
    n_q1 = _sc(qs1 - fo, sh) + off
    n_p1 = _sc(ps1 + fo, sh) + off

    out = x
    out = out.at[:, 5].set(n_p1)
    out = out.at[:, 6].set(n_p0)
    out = out.at[:, 7].set(n_q0)
    out = out.at[:, 8].set(n_q1)
    if filter_len == 4:
        return out

    if filter_len == 6:
        flat = ~((ad(p[1], p[0]) > flat_th) | (ad(q[1], q[0]) > flat_th)
                 | (ad(p[2], p[0]) > flat_th) | (ad(q[2], q[0]) > flat_th))
        wide = flat & mask
        w_p1 = (p[2] * 3 + p[1] * 2 + p[0] * 2 + q[0] + 4) >> 3
        w_p0 = (p[2] + p[1] * 2 + p[0] * 2 + q[0] * 2 + q[1] + 4) >> 3
        w_q0 = (p[1] + p[0] * 2 + q[0] * 2 + q[1] * 2 + q[2] + 4) >> 3
        w_q1 = (p[0] + q[0] * 2 + q[1] * 2 + q[2] * 3 + 4) >> 3
        out = out.at[:, 5].set(jnp.where(wide, w_p1, out[:, 5]))
        out = out.at[:, 6].set(jnp.where(wide, w_p0, out[:, 6]))
        out = out.at[:, 7].set(jnp.where(wide, w_q0, out[:, 7]))
        out = out.at[:, 8].set(jnp.where(wide, w_q1, out[:, 8]))
        return out

    flat = ~((ad(p[1], p[0]) > flat_th) | (ad(q[1], q[0]) > flat_th)
             | (ad(p[2], p[0]) > flat_th) | (ad(q[2], q[0]) > flat_th)
             | (ad(p[3], p[0]) > flat_th) | (ad(q[3], q[0]) > flat_th))
    wide = flat & mask
    w_p2 = (p[3] * 3 + 2 * p[2] + p[1] + p[0] + q[0] + 4) >> 3
    w_p1 = (p[3] * 2 + p[2] + 2 * p[1] + p[0] + q[0] + q[1] + 4) >> 3
    w_p0 = (p[3] + p[2] + p[1] + 2 * p[0] + q[0] + q[1] + q[2] + 4) >> 3
    w_q0 = (p[2] + p[1] + p[0] + 2 * q[0] + q[1] + q[2] + q[3] + 4) >> 3
    w_q1 = (p[1] + p[0] + q[0] + 2 * q[1] + q[2] + q[3] * 2 + 4) >> 3
    w_q2 = (p[0] + q[0] + q[1] + 2 * q[2] + q[3] * 3 + 4) >> 3
    out = out.at[:, 4].set(jnp.where(wide, w_p2, out[:, 4]))
    out = out.at[:, 5].set(jnp.where(wide, w_p1, out[:, 5]))
    out = out.at[:, 6].set(jnp.where(wide, w_p0, out[:, 6]))
    out = out.at[:, 7].set(jnp.where(wide, w_q0, out[:, 7]))
    out = out.at[:, 8].set(jnp.where(wide, w_q1, out[:, 8]))
    out = out.at[:, 9].set(jnp.where(wide, w_q2, out[:, 9]))
    if filter_len == 8:
        return out

    # filter14: second flatness test over the wide support
    flat2 = ~((ad(p[4], p[0]) > flat_th) | (ad(q[4], q[0]) > flat_th)
              | (ad(p[5], p[0]) > flat_th) | (ad(q[5], q[0]) > flat_th)
              | (ad(p[6], p[0]) > flat_th) | (ad(q[6], q[0]) > flat_th))
    vwide = flat2 & flat & mask
    o = {}
    o[5] = (p[6] * 7 + p[5] * 2 + p[4] * 2 + p[3] + p[2] + p[1] + p[0]
            + q[0] + 8) >> 4
    o[4] = (p[6] * 5 + p[5] * 2 + p[4] * 2 + p[3] * 2 + p[2] + p[1] + p[0]
            + q[0] + q[1] + 8) >> 4
    o[3] = (p[6] * 4 + p[5] + p[4] * 2 + p[3] * 2 + p[2] * 2 + p[1] + p[0]
            + q[0] + q[1] + q[2] + 8) >> 4
    o[2] = (p[6] * 3 + p[5] + p[4] + p[3] * 2 + p[2] * 2 + p[1] * 2 + p[0]
            + q[0] + q[1] + q[2] + q[3] + 8) >> 4
    o[1] = (p[6] * 2 + p[5] + p[4] + p[3] + p[2] * 2 + p[1] * 2 + p[0] * 2
            + q[0] + q[1] + q[2] + q[3] + q[4] + 8) >> 4
    o[0] = (p[6] + p[5] + p[4] + p[3] + p[2] + p[1] * 2 + p[0] * 2
            + q[0] * 2 + q[1] + q[2] + q[3] + q[4] + q[5] + 8) >> 4
    oq = {}
    oq[0] = (p[5] + p[4] + p[3] + p[2] + p[1] + p[0] * 2 + q[0] * 2
             + q[1] * 2 + q[2] + q[3] + q[4] + q[5] + q[6] + 8) >> 4
    oq[1] = (p[4] + p[3] + p[2] + p[1] + p[0] + q[0] * 2 + q[1] * 2
             + q[2] * 2 + q[3] + q[4] + q[5] + q[6] * 2 + 8) >> 4
    oq[2] = (p[3] + p[2] + p[1] + p[0] + q[0] + q[1] * 2 + q[2] * 2
             + q[3] * 2 + q[4] + q[5] + q[6] * 3 + 8) >> 4
    oq[3] = (p[2] + p[1] + p[0] + q[0] + q[1] + q[2] * 2 + q[3] * 2
             + q[4] * 2 + q[5] + q[6] * 4 + 8) >> 4
    oq[4] = (p[1] + p[0] + q[0] + q[1] + q[2] + q[3] * 2 + q[4] * 2
             + q[5] * 2 + q[6] * 5 + 8) >> 4
    oq[5] = (p[0] + q[0] + q[1] + q[2] + q[3] + q[4] * 2 + q[5] * 2
             + q[6] * 7 + 8) >> 4
    for i in range(6):
        out = out.at[:, 6 - i].set(jnp.where(vwide, o[i], out[:, 6 - i]))
        out = out.at[:, 7 + i].set(jnp.where(vwide, oq[i], out[:, 7 + i]))
    return out


def loop_filter_plane_uniform(plane: jnp.ndarray, step: int, level: int,
                              sharpness: int, filter_len: int, bd: int = 8
                              ) -> jnp.ndarray:
    """Filter a plane whose tx/block grid is uniform with pitch ``step``
    (round-1 pipeline: luma step 16 / len 14, chroma step 8 / len 6).

    Vertical edges first (spec order), then horizontal."""
    if level == 0:
        return plane
    blimit, limit, thresh = loop_filter_thresholds(level, sharpness)
    h, w = plane.shape
    x = jnp.asarray(plane).astype(jnp.int32)

    # vertical edges at columns step, 2*step, ...  Writes are a
    # scatter-ADD of deltas, not a window .set: gather windows are 14
    # wide while chroma edges sit 8 apart, so a window overlaps its
    # neighbor's modified span and a .set would write stale gathered
    # values over the neighbor's filtered pixels.  The spec's
    # flen <= spacing rule keeps MODIFIED spans disjoint, so at most
    # one edge contributes a nonzero delta per pixel (exact).
    edges = np.arange(step, w, step)
    if len(edges):
        cols = edges[:, None] + np.arange(-7, 7)[None]  # (E, 14)
        lines = x[:, cols].transpose(1, 0, 2).reshape(-1, 14)
        f = filter_lines(lines, blimit, limit, thresh, filter_len, bd)
        d = (f - lines).reshape(len(edges), h, 14).transpose(1, 0, 2)
        x = x.at[:, cols].add(d)

    # horizontal edges at rows step, 2*step, ...
    redges = np.arange(step, h, step)
    if len(redges):
        rows = redges[:, None] + np.arange(-7, 7)[None]
        lines = x[rows, :].transpose(0, 2, 1).reshape(-1, 14)
        f = filter_lines(lines, blimit, limit, thresh, filter_len, bd)
        d = (f - lines).reshape(len(redges), w, 14).transpose(0, 2, 1)
        x = x.at[rows, :].add(d)
    return x


# --------------------------------------------------------------------------
# mask-aware (mixed tx/block size) plane filtering
# --------------------------------------------------------------------------

def edge_flens(tx_ext, blk_ext, skip, is_luma: bool):
    """Per-mi filter length for the edge at each mi's LEADING (left for
    vertical / top for horizontal) boundary along one direction.

    Behavioral reference: set_lpf_parameters
    (deblocking_filter.c:160-280) with a uniform nonzero filter level
    (no delta_lf, no segment deltas — our encoder's signaling).

    tx_ext / blk_ext: (n_r, n_c) int arrays — effective transform /
    prediction-block extent ALONG the direction in mi units (a skip
    inter block's tx extent must already equal its block extent, per
    get_transform_size); pass transposed arrays (and transpose the
    result) for horizontal edges.  skip: coded-skip AND inter — intra
    skip blocks still deblock.

    Returns (n_r, n_c) int32 flen in {0, 4, 6, 8, 14}; column 0 (frame
    edge) is 0."""
    tx_ext = jnp.asarray(tx_ext, jnp.int32)
    blk_ext = jnp.asarray(blk_ext, jnp.int32)
    skip = jnp.asarray(skip, bool)
    n_c = tx_ext.shape[1]
    c = jnp.arange(n_c, dtype=jnp.int32)[None, :]
    tx_edge = (c % tx_ext) == 0
    pu_edge = (c % blk_ext) == 0
    prev_tx = jnp.concatenate([tx_ext[:, :1], tx_ext[:, :-1]], axis=1)
    prev_skip = jnp.concatenate([skip[:, :1], skip[:, :-1]], axis=1)
    # deblocking_filter.c:260: both-skip (inter) edges filter only on a
    # prediction-block boundary
    on = tx_edge & (~(skip & prev_skip) | pu_edge) & (c > 0)
    min_t = jnp.minimum(tx_ext, prev_tx)
    if is_luma:
        flen = jnp.where(min_t <= 1, 4, jnp.where(min_t == 2, 8, 14))
    else:
        flen = jnp.where(min_t <= 1, 4, 6)
    return jnp.where(on, flen, 0).astype(jnp.int32)


def _filter_edges_masked(x, epos, flen_line, blimit, limit, thresh,
                         lens, bd):
    """Filter the vertical edges at static column positions ``epos``
    with per-line filter lengths (0 = off).  Exact under overlap: only
    the span a filter actually modifies produces a nonzero delta, and
    the spec's flen <= min(tx extents) rule makes modified spans of
    adjacent edges disjoint, so one scatter-add applies them all."""
    h, w = x.shape
    cols = jnp.clip(np.asarray(epos)[None, :, None]
                    + np.arange(-7, 7)[None, None, :], 0, w - 1)
    rows = jnp.arange(h)[:, None, None]
    lines = x[rows, cols]                      # (h, nE, 14)
    flat = lines.reshape(-1, 14)
    sel = flen_line.reshape(-1, 1)
    out = flat
    for fl in lens:
        f = filter_lines(flat, blimit, limit, thresh, fl, bd)
        out = jnp.where(sel == fl, f, out)
    delta = (out - flat).reshape(h, -1, 14)
    return x.at[rows, cols].add(delta)


def loop_filter_plane_masked(plane, flen_v, flen_h, level: int,
                             sharpness: int, is_luma: bool, bd: int = 8,
                             mi: int = 4):
    """Mask-aware plane deblock for mixed tx/block sizes.

    flen_v: (h//mi, w//mi) per-mi filter length for the vertical edge at
    each mi's left boundary (from edge_flens); flen_h: the same for the
    top boundary.  Uniform level (our signaling); vertical edges filter
    first over the whole plane, then horizontal (spec order)."""
    if level == 0:
        return plane
    blimit, limit, thresh = loop_filter_thresholds(level, sharpness)
    lens = (4, 8, 14) if is_luma else (4, 6)
    x = jnp.asarray(plane).astype(jnp.int32)
    h, w = x.shape
    n_r, n_c = flen_v.shape
    epos_v = np.arange(1, n_c) * mi
    if len(epos_v):
        fl = jnp.repeat(jnp.asarray(flen_v)[:, 1:], mi, axis=0)
        x = _filter_edges_masked(x, epos_v, fl, blimit, limit, thresh,
                                 lens, bd)
    epos_h = np.arange(1, n_r) * mi
    if len(epos_h):
        fl = jnp.repeat(jnp.asarray(flen_h)[1:, :], mi, axis=1).T
        x = _filter_edges_masked(x.T, epos_h, fl, blimit, limit, thresh,
                                 lens, bd).T
    return x
