"""Hierarchical motion estimation (open-loop HME/ME), TPU-batched.

Redesign of the reference's open-loop ME (motion_estimation.c:
prehme/hme_level0/1/2 + fullpel search, run by ~20 threads over segment
grids; Docs/Appendix-Open-Loop-Motion-Estimation.md): here every level
is one batched device call over ALL search blocks of the frame:

  level 2 (1/16 res): dense SSD search over a wide window (MXU conv)
  level 1 (1/4  res): dense refinement around the level-2 winner
  level 0 (full res): dense refinement around the level-1 winner

Candidate costs use SSD (the conv-form cost; see ops/me.ssd_search).
Returns integer MVs per 16x16 block, the input to the inter MD stage
(next milestone: subpel refinement via ops/convolve + MV costing).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.ops import me as me_ops

BLK = 16


def _block_grid(plane: jnp.ndarray, blk: int):
    h, w = plane.shape
    gh, gw = h // blk, w // blk
    blocks = plane.reshape(gh, blk, gw, blk).transpose(0, 2, 1, 3)
    return blocks.reshape(gh * gw, blk, blk), gh, gw


def _gather_windows(ref: jnp.ndarray, cys, cxs, blk: int, rad: int):
    """(B, blk+2*rad, blk+2*rad) windows centered at (cys, cxs) with edge
    clamping."""
    size = blk + 2 * rad
    offs = jnp.arange(size)
    rows = jnp.clip(cys[:, None] - rad + offs[None], 0, ref.shape[0] - 1)
    cols = jnp.clip(cxs[:, None] - rad + offs[None], 0, ref.shape[1] - 1)
    return ref[rows[:, :, None], cols[:, None, :]]


def _search_level(src_blocks, ref, base_y, base_x, blk: int, rad: int):
    """Dense SSD search of radius ``rad`` around (base_y, base_x) block
    positions.  Returns (mv_y, mv_x) relative to the co-located pos."""
    wins = _gather_windows(ref, base_y, base_x, blk, rad)
    cost = me_ops.ssd_search(src_blocks, wins)
    b = cost.shape[0]
    flat = cost.reshape(b, -1)
    idx = jnp.argmin(flat, axis=1)
    span = 2 * rad + 1
    mv_y = idx // span - rad
    mv_x = idx % span - rad
    return mv_y, mv_x


def hme_core(h, w, rad2, rad1, rad0):
    """Traceable whole-frame HME: returns run(src, ref) -> (mv_y, mv_x,
    ssd) over the (h//16, w//16) grid.  h/w must be multiples of 64.
    Composable into larger fused programs (pipeline/gop_fast.py)."""
    def run(src, ref):
        # pyramid
        src4 = me_ops.downsample2(me_ops.downsample2(src))
        ref4 = me_ops.downsample2(me_ops.downsample2(ref))
        # coarse level (pre-HME + hme_level0 role): 1/8-res 8x8 blocks
        # (64x64 superblocks at full res) over a wide window — restores
        # the long pan/zoom reach the 1/4-level alone lacks
        seed2_y = seed2_x = None
        if rad1 > 0:
            src8 = me_ops.downsample2(src4)
            ref8 = me_ops.downsample2(ref4)
            sb8, g8h, g8w = _block_grid(src8, 8)
            cy8 = (jnp.arange(g8h * g8w) // g8w) * 8
            cx8 = (jnp.arange(g8h * g8w) % g8w) * 8
            myA, mxA = _search_level(sb8, ref8, cy8, cx8, 8, rad1)
            seed2_y = myA * 2
            seed2_x = mxA * 2
        # level 2 on 1/4-res 16x16 blocks == 64x64 superblocks at full res
        sb4, g4h, g4w = _block_grid(src4, BLK)
        cy = (jnp.arange(g4h * g4w) // g4w) * BLK
        cx = (jnp.arange(g4h * g4w) % g4w) * BLK
        if seed2_y is not None:
            # same SB grid at both coarse levels
            cy = cy + seed2_y
            cx = cx + seed2_x
        my2, mx2 = _search_level(sb4, ref4, cy, cx, BLK, rad2)
        if seed2_y is not None:
            my2 = my2 + seed2_y
            mx2 = mx2 + seed2_x
        # upscale level-2 MVs (per 64x64) to 16x16 grid at full res
        gh, gw = h // BLK, w // BLK
        by = jnp.arange(gh * gw) // gw
        bx = jnp.arange(gh * gw) % gw
        # level 0: full-res per-16-block refinement around MULTIPLE
        # superblock seeds — the block's own SB plus its 4 neighbor
        # SBs.  A 64-SB straddling an object/background boundary locks
        # its coarse MV to the majority motion; blocks carrying the
        # minority content recover theirs from an adjacent SB's seed
        # (the multi-predictor fullpel search role of
        # motion_estimation.c open_loop_me_fullpel_search_sblock:781).
        blocks, _, _ = _block_grid(src, BLK)
        best_ssd = None
        mv_y = mv_x = None
        for dy, dx in ((0, 0), (0, -1), (0, 1), (-1, 0), (1, 0)):
            sb_r = jnp.clip(by // 4 + dy, 0, g4h - 1)
            sb_c = jnp.clip(bx // 4 + dx, 0, g4w - 1)
            sb_i = sb_r * g4w + sb_c
            seed_y = my2[sb_i] * 4
            seed_x = mx2[sb_i] * 4
            base_y = by * BLK + seed_y
            base_x = bx * BLK + seed_x
            my0, mx0 = _search_level(blocks, ref, base_y, base_x, BLK,
                                     rad0)
            cy = seed_y + my0
            cx = seed_x + mx0
            wins = _gather_windows(ref, by * BLK + cy, bx * BLK + cx,
                                   BLK, 0)
            ssd = jnp.sum((wins - blocks) ** 2, axis=(1, 2))
            if best_ssd is None:
                best_ssd, mv_y, mv_x = ssd, cy, cx
            else:
                take = ssd < best_ssd
                best_ssd = jnp.where(take, ssd, best_ssd)
                mv_y = jnp.where(take, cy, mv_y)
                mv_x = jnp.where(take, cx, mv_x)
        return (mv_y.reshape(gh, gw), mv_x.reshape(gh, gw),
                best_ssd.reshape(gh, gw))
    return run


@functools.lru_cache(maxsize=None)
def _jit_hme(h, w, rad2, rad1, rad0):
    return jax.jit(hme_core(h, w, rad2, rad1, rad0))


def hierarchical_me(src: np.ndarray, ref: np.ndarray,
                    rad2: int = 8, rad0: int = 7, rad1: int = 8
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Open-loop ME: per-16x16 integer MVs src->ref.

    Returns (mv_y, mv_x, ssd) as (gh, gw) arrays.  Effective search
    range: +-(8*rad1 + 4*rad2 + rad0) full-res pels (the 1/8-res coarse
    level carries the reference's pre-HME/level-0 long reach).  Dims
    that are not multiples of 64 are edge-padded for the pyramid; the
    MV grid is cropped back."""
    h, w = src.shape
    assert h % BLK == 0 and w % BLK == 0
    h64 = (h + 63) & ~63
    w64 = (w + 63) & ~63
    if (h64, w64) != (h, w):
        pads = ((0, h64 - h), (0, w64 - w))
        src = np.pad(src, pads, mode="edge")
        ref = np.pad(ref, pads, mode="edge")
    run = _jit_hme(h64, w64, rad2, rad1, rad0)
    mv_y, mv_x, ssd = run(jnp.asarray(src.astype(np.int32)),
                          jnp.asarray(ref.astype(np.int32)))
    gh, gw = h // BLK, w // BLK
    return (np.asarray(mv_y)[:gh, :gw], np.asarray(mv_x)[:gh, :gw],
            np.asarray(ssd)[:gh, :gw])
