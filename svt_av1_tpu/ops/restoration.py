"""Loop restoration — Wiener filter (AV1 spec §7.17.4), JAX batched.

Behavioral reference: convolve.c svt_aom_convolve_add_src_{horiz,vert}_hip
/ svt_av1_wiener_convolve_add_src_c.  The Wiener path is a 7-tap
separable filter with an "add source" term and asymmetric rounding
offsets; batched here over restoration units as shifted MACs (VPU).

Self-guided (SGR) restoration and the stats/search stage land with the
restoration pipeline stage; this module provides the normative apply
kernel.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

FILTER_BITS = 7
WIENER_ROUND0 = 3
WIENER_ROUND1 = 2 * FILTER_BITS - WIENER_ROUND0


def _rp2(x, n):
    return (x + (1 << (n - 1))) >> n


def wiener_filter(windows: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray,
                  w: int, h: int, bd: int = 8) -> jnp.ndarray:
    """Apply the Wiener filter to a batch of restoration windows.

    windows: (B, h+6, w+7) int32 source samples; output block origin maps
             to windows[:, 3, 3] (8 taps are read per position even
             though tap [7] is zero).
    fx, fy:  (B, 8) int32 filter taps (tap [3] is the center; [7] == 0).
    Returns (B, h, w) int32, bit-exact with
    svt_av1_wiener_convolve_add_src_c."""
    x = jnp.asarray(windows).astype(jnp.int32)
    fx = jnp.asarray(fx).astype(jnp.int32)
    fy = jnp.asarray(fy).astype(jnp.int32)
    im_h = h + 6
    # horizontal: sum_k fx[k]*src[c+k] + (center << 7) + (1 << 14)
    acc = jnp.zeros((x.shape[0], im_h, w), jnp.int32)
    for k in range(8):
        acc = acc + fx[:, k][:, None, None] * x[:, :im_h, k:k + w]
    center_h = x[:, :im_h, 3:3 + w]
    acc = acc + (center_h << FILTER_BITS) + (1 << (bd + FILTER_BITS - 1))
    clamp_hi = (1 << (bd + FILTER_BITS - WIENER_ROUND0 + 1)) - 1
    im = jnp.clip(_rp2(acc, WIENER_ROUND0), 0, clamp_hi)
    # one zero pad row: the 8th (zero) tap still indexes a row
    im = jnp.concatenate([im, jnp.zeros((x.shape[0], 1, w), jnp.int32)],
                         axis=1)
    # vertical: sum_k fy[k]*im[r+k] + (center << 7) - (1 << (8 + r1 - 1))
    acc2 = jnp.zeros((x.shape[0], h, w), jnp.int32)
    for k in range(8):
        acc2 = acc2 + fy[:, k][:, None, None] * im[:, k:k + h, :]
    center_v = im[:, 3:3 + h, :]
    acc2 = acc2 + (center_v << FILTER_BITS) - (1 << (bd + WIENER_ROUND1 - 1))
    return jnp.clip(_rp2(acc2, WIENER_ROUND1), 0, (1 << bd) - 1)
