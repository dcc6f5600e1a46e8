"""Motion search primitives (TPU-first).

The reference's open-loop HME/ME (motion_estimation.c: pre-HME + 3-level
hierarchical SAD search per 64x64, ~20 threads) is re-designed for the
MXU: block-matching cost over a dense candidate grid is computed as a
cross-correlation (conv) plus window energy — SSD(c) = ||ref_c||^2
- 2<src, ref_c> + ||src||^2 — so the dominant term is a batched conv
that XLA tiles onto the systolic array, instead of per-candidate SAD
loops.  SAD is also provided (VPU) for parity with reference costing.

All functions are batched over blocks; the HME pyramid drives them per
level (pipeline/me.py, next milestone).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sad(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sum of absolute differences over trailing 2 dims: (..., h, w) -> (...)."""
    return jnp.sum(jnp.abs(a.astype(jnp.int32) - b.astype(jnp.int32)),
                   axis=(-2, -1))


def block_variance(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mean, variance) over trailing 2 dims (integer semantics like the
    reference picture-analysis 8x8 stats)."""
    xf = x.astype(jnp.int64) if x.dtype == jnp.int64 else x.astype(jnp.int32)
    n = x.shape[-1] * x.shape[-2]
    s = jnp.sum(xf, axis=(-2, -1))
    ss = jnp.sum(xf * xf, axis=(-2, -1))
    mean = s // n
    var = ss // n - mean * mean
    return mean, var


def ssd_search(src_blocks: jnp.ndarray, windows: jnp.ndarray) -> jnp.ndarray:
    """Dense block-matching SSD over all integer offsets.

    src_blocks: (B, h, w) blocks; windows: (B, H, W) search areas.
    Returns (B, H-h+1, W-w+1) SSD cost maps.  The cross term runs as a
    grouped conv (one filter per batch element) on the MXU.
    """
    b, h, w = src_blocks.shape
    _, wh, ww = windows.shape
    win = windows.astype(jnp.float32)[None]        # (1, B, H, W) NCHW
    filt = src_blocks.astype(jnp.float32)[:, None]  # (B, 1, h, w) OIHW
    cross = jax.lax.conv_general_dilated(
        win, filt, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=b,
        preferred_element_type=jnp.float32)[0]      # (B, H-h+1, W-w+1)
    # window energy: exact int32 separable box sum (a generic conv here
    # may take an inexact (FFT) path on some backends)
    ref_sq = _box_sum(windows.astype(jnp.int32) ** 2, h, w)
    src_sq = jnp.sum(filt * filt, axis=(1, 2, 3))
    return ref_sq.astype(jnp.float32) - 2.0 * cross + src_sq[:, None, None]


def _box_sum(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Sliding (h, w) window sums over trailing 2 dims, VALID padding.

    log-time shifted adds along each axis; exact integer arithmetic."""
    def axis_sum(v, n, axis):
        total = None
        span = 1
        acc = v
        # binary decomposition of n shifted partial sums
        sums = {1: v}
        while span * 2 <= n:
            acc = acc + jnp.roll(acc, -span, axis=axis)
            span *= 2
            sums[span] = acc
        # compose n = sum of powers of two
        out = None
        offset = 0
        for p in sorted(sums, reverse=True):
            if n & p:
                part = jnp.roll(sums[p], -offset, axis=axis)
                out = part if out is None else out + part
                offset += p
        length = v.shape[axis] - n + 1
        return jax.lax.slice_in_dim(out, 0, length, axis=axis)

    return axis_sum(axis_sum(x, h, -2), w, -1)


def best_mv(cost_map: jnp.ndarray, origin_y: int, origin_x: int
            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """argmin over a cost map -> (mv_y, mv_x, cost); origin is the offset
    of cost_map[0, 0] relative to the co-located position."""
    b = cost_map.shape[0]
    flat = cost_map.reshape(b, -1)
    idx = jnp.argmin(flat, axis=1)
    wy = cost_map.shape[2]
    mv_y = idx // wy + origin_y
    mv_x = idx % wy + origin_x
    return mv_y, mv_x, jnp.take_along_axis(flat, idx[:, None], 1)[:, 0]


def downsample2(x: jnp.ndarray) -> jnp.ndarray:
    """2x decimation by averaging (HME pyramid; reference
    svt_aom_downsample_2d semantics: box average with rounding)."""
    h, w = x.shape[-2], x.shape[-1]
    x = x.astype(jnp.int32)
    y = (x[..., 0:h:2, 0:w:2] + x[..., 0:h:2, 1:w:2]
         + x[..., 1:h:2, 0:w:2] + x[..., 1:h:2, 1:w:2] + 2) >> 2
    return y
