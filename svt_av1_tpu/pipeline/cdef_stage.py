"""CDEF frame stage: strength search (encoder) + normative apply.

Behavioral reference: cdef_process.c svt_av1_cdef_frame / cdef_seg_search
and cdef.c svt_cdef_filter_fb.  TPU redesign: the whole frame filters as
ONE batch of 8x8 (luma) / 4x4 (chroma) blocks — direction search is two
MXU einsums, the filter is vectorized gathers (ops/cdef.py) — instead of
the reference's per-64x64 segment threads.

Round-1 signaling: cdef_bits = 0 (one frame-uniform strength pair per
plane, no per-SB index bits).  Skip rule (enc_cdef.c:267): an 8x8 block
filters iff ANY of its four 4x4 MIs is non-skip; damping = 3 +
(base_q_idx >> 6), chroma damping one less (cdef.c:filter_fb)."""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.ops import cdef as cdef_ops

# encoder search candidates: (pri_y, sec_y, pri_uv, sec_uv), header
# domain (sec coded 0..3; coded 3 applies as 4)
SEARCH_SET = ((0, 0, 0, 0), (1, 0, 1, 0), (2, 1, 2, 1), (4, 1, 4, 1),
              (4, 2, 4, 2), (6, 2, 6, 2), (8, 2, 8, 2), (12, 3, 10, 3))


def _adjust_strength(strength, var):
    """adjust_strength (cdef.c:130), vectorized: luma primary strength
    scaled by the 8x8 directional variance."""
    v6 = var >> 6
    i = jnp.minimum(cdef_ops._msb(jnp.maximum(v6, 1)), 12)
    i = jnp.where(v6 > 0, i, 0)
    adj = (strength * (4 + i) + 8) >> 4
    return jnp.where(var > 0, adj, 0)


def _pad_vl(plane, n=2):
    """Pad with CDEF_VERY_LARGE (== spec unavailable samples)."""
    return jnp.pad(plane, n, constant_values=cdef_ops.CDEF_VERY_LARGE)


def _windows(padded, ys, xs, n):
    offs = jnp.arange(n + 4)
    rows = ys[:, None, None] + offs[None, :, None]
    cols = xs[:, None, None] + offs[None, None, :]
    return padded[rows, cols]


@functools.lru_cache(maxsize=None)
def _jit_apply(h, w, damping, bd):
    gh8, gw8 = h // 8, w // 8
    nb = gh8 * gw8
    cs = bd - 8

    def apply(rec_y, rec_u, rec_v, skip8, pri_y, sec_y, pri_uv, sec_uv):
        # pri_y/sec_y/pri_uv/sec_uv: per-8x8-block (nb,) strength arrays
        # (frame-uniform callers pass broadcast-filled arrays)
        ys = (jnp.arange(nb) // gw8 * 8).astype(jnp.int32)
        xs = (jnp.arange(nb) % gw8 * 8).astype(jnp.int32)
        blocks = rec_y[ys[:, None, None] + jnp.arange(8)[None, :, None],
                       xs[:, None, None] + jnp.arange(8)[None, None, :]]
        dirs, var = cdef_ops.cdef_find_dir(blocks, cs)
        pri = _adjust_strength(pri_y << cs, var)
        sec = sec_y << cs
        wins = _windows(_pad_vl(rec_y), ys, xs, 8)
        fy = cdef_ops.cdef_filter_block(wins, pri, sec, dirs,
                                        damping + cs, damping + cs,
                                        cs, bd, n=8)
        keep = skip8.reshape(nb)[:, None, None]
        fy = jnp.where(keep, blocks, fy)
        out_y = rec_y.at[ys[:, None, None] + jnp.arange(8)[None, :, None],
                         xs[:, None, None]
                         + jnp.arange(8)[None, None, :]].set(fy)
        # chroma 4:2:0: 4x4 blocks at the same grid, luma directions,
        # unadjusted strengths, damping - 1
        cys = ys // 2
        cxs = xs // 2
        pri_c = pri_uv << cs
        sec_c = sec_uv << cs
        outs = []
        for rc in (rec_u, rec_v):
            cwins = _windows(_pad_vl(rc), cys, cxs, 4)
            fc = cdef_ops.cdef_filter_block(
                cwins, pri_c, sec_c, dirs, damping - 1 + cs,
                damping - 1 + cs, cs, bd, n=4)
            cur = rc[cys[:, None, None] + jnp.arange(4)[None, :, None],
                     cxs[:, None, None] + jnp.arange(4)[None, None, :]]
            fc = jnp.where(keep, cur, fc)
            outs.append(
                rc.at[cys[:, None, None] + jnp.arange(4)[None, :, None],
                      cxs[:, None, None]
                      + jnp.arange(4)[None, None, :]].set(fc))
        return out_y, outs[0], outs[1]

    return jax.jit(apply)


def cdef_damping(base_q_idx: int) -> int:
    return 3 + (base_q_idx >> 6)


def _block_strengths(h, w, strengths, sb_idx):
    """Per-8x8-block (nb,) strength arrays from header-domain strength
    set(s).  sb_idx: per-64x64 index map (or None for frame-uniform);
    an SB with no coded cdef_idx (-1) filters with strength 0."""
    gh8, gw8 = h // 8, w // 8
    if sb_idx is None:
        sets = np.array([strengths], np.int32)
        idx8 = np.zeros((gh8, gw8), np.int32)
    else:
        sets = np.concatenate([np.asarray(strengths, np.int32)
                               .reshape(-1, 4),
                               np.zeros((1, 4), np.int32)])  # -1 -> 0
        idx8 = np.asarray(sb_idx, np.int32)[
            (np.arange(gh8) // 8)[:, None], (np.arange(gw8) // 8)[None]]
    per = sets[idx8.reshape(-1)]                      # (nb, 4)
    pri_y, sec_y, pri_uv, sec_uv = (per[:, i] for i in range(4))
    return (pri_y, sec_y + (sec_y == 3), pri_uv, sec_uv + (sec_uv == 3))


def cdef_apply(recon: Dict[str, np.ndarray], skip16: np.ndarray,
               strengths, damping: int, bd: int = 8,
               sb_idx=None, skip8=None) -> Dict[str, np.ndarray]:
    """Normative CDEF apply over a post-deblock recon.

    damping: the SIGNALED cdef_damping (3..6) from the frame header.
    skip16: (gh, gw) bool per 16x16 block (our uniform leaf grid); an
    8x8 filters iff its covering block is non-skip.
    strengths: one header-domain 4-tuple (frame-uniform), or — with
    sb_idx — a sequence of 2^cdef_bits 4-tuples indexed per SB."""
    h, w = recon["y"].shape
    fn = _jit_apply(h, w, damping, bd)
    if skip8 is None:
        skip8 = np.repeat(np.repeat(skip16, 2, 0), 2, 1)
    pri_y, sec_y, pri_uv, sec_uv = _block_strengths(h, w, strengths,
                                                    sb_idx)
    y, u, v = fn(jnp.asarray(recon["y"].astype(np.int32)),
                 jnp.asarray(recon["u"].astype(np.int32)),
                 jnp.asarray(recon["v"].astype(np.int32)),
                 jnp.asarray(skip8),
                 jnp.asarray(pri_y), jnp.asarray(sec_y),
                 jnp.asarray(pri_uv), jnp.asarray(sec_uv))
    dt = np.uint8 if bd == 8 else np.uint16
    out = dict(recon)
    out["y"] = np.asarray(y).astype(dt)
    out["u"] = np.asarray(u).astype(dt)
    out["v"] = np.asarray(v).astype(dt)
    return out


def _sb_sse(src: Dict[str, np.ndarray], filt: Dict[str, np.ndarray]
            ) -> np.ndarray:
    """Per-64x64-SB SSE (y + u + v), (sb_rows, sb_cols) float64."""
    h, w = src["y"].shape
    gr, gc = (h + 63) // 64, (w + 63) // 64
    out = np.zeros((gr, gc), np.float64)
    for p, step in (("y", 64), ("u", 32), ("v", 32)):
        d = (filt[p].astype(np.int64) - src[p].astype(np.int64)) ** 2
        ph, pw = d.shape
        pad = np.zeros((gr * step, gc * step), np.float64)
        pad[:ph, :pw] = d
        out += pad.reshape(gr, step, gc, step).sum(axis=(1, 3))
    return out


def coded_sb_map(skip16: np.ndarray) -> np.ndarray:
    """(sb_rows, sb_cols) bool: SBs that code a cdef_idx (>= 1 non-skip
    16x16 block)."""
    gr, gc = (skip16.shape[0] + 3) // 4, (skip16.shape[1] + 3) // 4
    pad = np.ones((gr * 4, gc * 4), bool)
    pad[:skip16.shape[0], :skip16.shape[1]] = skip16
    return ~pad.reshape(gr, 4, gc, 4).all(axis=(1, 3))


def select_sb_sets(sse: np.ndarray, coded: np.ndarray, lam: float,
                   cands, max_bits: int = 3):
    """finish_cdef_search analog: given the per-SB/per-candidate SSE
    matrix, pick cdef_bits (0..max_bits) and the strength subset
    minimizing SSE + lambda * signaling bits.

    Returns (cdef_bits, strength_list, sb_idx_map)."""
    from itertools import combinations
    ncoded = int(coded.sum())
    best = None
    for bits in range(max_bits + 1):
        n_sets = 1 << bits
        if n_sets > len(cands):
            break
        # exhaustive subset search (<= C(8,4)=70 subsets)
        for sub in combinations(range(len(cands)), n_sets):
            pick = sse[:, list(sub)]
            total = float(pick.min(axis=1).sum())
            hdr_bits = 12 * n_sets
            cost = total + lam * (ncoded * bits + hdr_bits)
            if best is None or cost < best[0]:
                idx = pick.argmin(axis=1).astype(np.int32)
                best = (cost, bits, sub, idx)
    _, bits, sub, idx = best
    idx_map = idx.reshape(coded.shape)
    idx_map = np.where(coded, idx_map, -1).astype(np.int32)
    return bits, tuple(cands[i] for i in sub), idx_map


def cdef_search_sb(src: Dict[str, np.ndarray],
                   recon: Dict[str, np.ndarray], skip16: np.ndarray,
                   base_q_idx: int, bd: int = 8,
                   max_candidates: int = len(SEARCH_SET)):
    """Per-SB strength search (cdef_seg_search + finish_cdef_search
    analog): per-SB SSE for every candidate strength set, then pick
    cdef_bits (0..3) and the strength subset minimizing
    SSE + lambda * signaling bits.

    Returns (cdef_bits, strength_list, sb_idx_map)."""
    from svt_av1_tpu.ops import quant
    cands = SEARCH_SET[:max_candidates]
    damping = cdef_damping(base_q_idx)
    sse = []
    for cand in cands:
        filt = cdef_apply(recon, skip16, cand, damping, bd)
        sse.append(_sb_sse(src, filt).reshape(-1))
    sse = np.stack(sse, axis=1)                 # (nsb, ncand)
    coded = coded_sb_map(skip16)
    qstep = quant.dc_q(base_q_idx, bd=bd) / 8.0
    lam = 0.7 * qstep * qstep
    return select_sb_sets(sse, coded, lam, cands)


def cdef_search(src: Dict[str, np.ndarray], recon: Dict[str, np.ndarray],
                skip16: np.ndarray, base_q_idx: int, bd: int = 8,
                max_candidates: int = len(SEARCH_SET)
                ) -> Tuple[int, int, int, int]:
    """Frame-uniform strength search: min SSE vs source over SEARCH_SET.
    Returns header-domain strengths (sec coded 0..3; 3 means 4)."""
    best = None
    for cand in SEARCH_SET[:max_candidates]:
        filt = cdef_apply(recon, skip16, cand, cdef_damping(base_q_idx),
                          bd)
        sse = 0.0
        for p in ("y", "u", "v"):
            d = (filt[p].astype(np.int64) - src[p].astype(np.int64))
            sse += float((d * d).sum())
        if best is None or sse < best[0]:
            best = (sse, cand)
    return best[1]
