"""Super-resolution / resize kernels (JAX, batched).

Normative horizontal super-res upscale (AV1 spec §7.16; behavioral
reference: super_res.c av1_convolve_horiz_rs_c / upscale_normative_rect)
redesigned for TPU: the output-column sampling grid (source index +
subpel phase) is static per geometry, so the whole upscale is a
precomputed gather + 8-tap weighted sum, batched over rows and frames.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

RS_SCALE_SUBPEL_BITS = 14
RS_SUBPEL_BITS = 6
RS_SCALE_EXTRA_BITS = RS_SCALE_SUBPEL_BITS - RS_SUBPEL_BITS
RS_SCALE_EXTRA_OFF = 1 << (RS_SCALE_EXTRA_BITS - 1)
RS_SCALE_SUBPEL_MASK = (1 << RS_SCALE_SUBPEL_BITS) - 1
RS_SUBPEL_MASK = (1 << RS_SUBPEL_BITS) - 1
UPSCALE_TAPS = 8
FILTER_BITS = 7
SCALE_NUMERATOR = 8

_DATA = os.path.join(os.path.dirname(__file__), "..", "codec", "data",
                     "av1_resize_filters.npz")


@functools.lru_cache(maxsize=1)
def _filters() -> np.ndarray:
    return np.load(_DATA)["resize_filter_normative"].astype(np.int32)


def scaled_width(width: int, denom: int) -> int:
    """calculate_scaled_size_helper for super-res denominators 9..16."""
    if denom == SCALE_NUMERATOR:
        return width
    min_dim = min(16, width)
    return max((width * SCALE_NUMERATOR + denom // 2) // denom, min_dim)


def upscale_step_x0(in_w: int, out_w: int) -> Tuple[int, int]:
    step = ((in_w << RS_SCALE_SUBPEL_BITS) + out_w // 2) // out_w
    err = out_w * step - (in_w << RS_SCALE_SUBPEL_BITS)
    x0 = (-((out_w - in_w) << (RS_SCALE_SUBPEL_BITS - 1)) + out_w // 2) \
        // out_w + RS_SCALE_EXTRA_OFF - err // 2
    return step, x0 & RS_SCALE_SUBPEL_MASK


@functools.lru_cache(maxsize=None)
def _upscale_plan(in_w: int, out_w: int):
    """(base_idx (out_w,), taps (out_w, 8)) with border replication folded
    into clamped indices."""
    step, x0 = upscale_step_x0(in_w, out_w)
    filt = _filters()
    xs = x0 + step * np.arange(out_w)
    # src pointer starts at input - 1 - (taps/2 - 1) = input - 4
    base = (xs >> RS_SCALE_SUBPEL_BITS) - 4
    phase = (xs & RS_SCALE_SUBPEL_MASK) >> RS_SCALE_EXTRA_BITS
    taps = filt[phase]                                  # (out_w, 8)
    idx = base[:, None] + np.arange(UPSCALE_TAPS)[None]  # (out_w, 8)
    idx = np.clip(idx, 0, in_w - 1)                      # border replicate
    return idx.astype(np.int32), taps.astype(np.int32)


def superres_upscale(plane: jnp.ndarray, out_w: int, bd: int = 8
                     ) -> jnp.ndarray:
    """Normative horizontal upscale: (..., H, in_w) -> (..., H, out_w),
    bit-exact with upscale_normative_rect (frame-wide, borders
    replicated)."""
    in_w = plane.shape[-1]
    idx, taps = _upscale_plan(in_w, out_w)
    x = jnp.asarray(plane).astype(jnp.int32)
    g = x[..., idx]                                      # (..., H, out_w, 8)
    s = jnp.sum(g * jnp.asarray(taps), axis=-1)
    out = (s + (1 << (FILTER_BITS - 1))) >> FILTER_BITS
    return jnp.clip(out, 0, (1 << bd) - 1)
