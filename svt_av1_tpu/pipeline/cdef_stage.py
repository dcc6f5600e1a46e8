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
        ys = (jnp.arange(nb) // gw8 * 8).astype(jnp.int32)
        xs = (jnp.arange(nb) % gw8 * 8).astype(jnp.int32)
        blocks = rec_y[ys[:, None, None] + jnp.arange(8)[None, :, None],
                       xs[:, None, None] + jnp.arange(8)[None, None, :]]
        dirs, var = cdef_ops.cdef_find_dir(blocks, cs)
        pri = _adjust_strength(jnp.full(nb, pri_y << cs, jnp.int32), var)
        sec = jnp.full(nb, sec_y << cs, jnp.int32)
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
        pri_c = jnp.full(nb, pri_uv << cs, jnp.int32)
        sec_c = jnp.full(nb, sec_uv << cs, jnp.int32)
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


def cdef_apply(recon: Dict[str, np.ndarray], skip16: np.ndarray,
               strengths: Tuple[int, int, int, int], damping: int,
               bd: int = 8) -> Dict[str, np.ndarray]:
    """Normative CDEF apply over a post-deblock recon.

    damping: the SIGNALED cdef_damping (3..6) from the frame header.
    skip16: (gh, gw) bool per 16x16 block (our uniform leaf grid); an
    8x8 filters iff its covering block is non-skip."""
    h, w = recon["y"].shape
    fn = _jit_apply(h, w, damping, bd)
    skip8 = np.repeat(np.repeat(skip16, 2, 0), 2, 1)
    pri_y, sec_y, pri_uv, sec_uv = strengths
    y, u, v = fn(jnp.asarray(recon["y"].astype(np.int32)),
                 jnp.asarray(recon["u"].astype(np.int32)),
                 jnp.asarray(recon["v"].astype(np.int32)),
                 jnp.asarray(skip8),
                 np.int32(pri_y), np.int32(sec_y + (sec_y == 3)),
                 np.int32(pri_uv), np.int32(sec_uv + (sec_uv == 3)))
    dt = np.uint8 if bd == 8 else np.uint16
    out = dict(recon)
    out["y"] = np.asarray(y).astype(dt)
    out["u"] = np.asarray(u).astype(dt)
    out["v"] = np.asarray(v).astype(dt)
    return out


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
