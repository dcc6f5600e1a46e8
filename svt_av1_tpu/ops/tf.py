"""Temporal filtering (alt-ref / MCTF) core, JAX batched.

Algorithmic parity with the reference's planewise non-local-mean filter
(temporal_filtering.c svt_av1_apply_temporal_filter_planewise_medium_c;
Docs/Appendix-Alt-Refs.md): each 32x32 block of the filtered frame is a
per-pixel weighted average of the co-located motion-compensated blocks
from neighboring frames, with weights decaying in the subblock matching
error, the MV distance factor, and a noise-adaptive decay factor.

This stage is an *encoder-side* denoiser (not normative), so we use
float weights (jnp.exp) rather than the reference's fixed-point
exp table — functionally equivalent filtering.

Batched over (blocks x frames); the MC predictions come from the ME +
convolve kernels (pipeline/me.py, ops/convolve.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

TF_WEIGHT_SCALE = 1000
TF_WINDOW_BLOCK_BALANCE_WEIGHT = 5
BLK = 32
SUB = 16


def subblock_weights(center: jnp.ndarray, preds: jnp.ndarray,
                     block_errors: jnp.ndarray, mvs: jnp.ndarray,
                     decay_factor, mv_dist_th) -> jnp.ndarray:
    """Per-subblock filter weights.

    center: (B, 32, 32) source block; preds: (B, F, 32, 32) MC predictions
    from F alt frames; block_errors: (B, F, 4) subblock ME errors (fp8
    domain like the reference, i.e. SSE>>shift); mvs: (B, F, 4, 2).
    Returns weights (B, F, 4) in [0, TF_WEIGHT_SCALE]."""
    c = center.astype(jnp.float32)[:, None]
    p = preds.astype(jnp.float32)
    # window error per 16x16 quadrant (mean squared diff * 256)
    d2 = (c - p) ** 2
    quads = [d2[..., :SUB, :SUB], d2[..., :SUB, SUB:],
             d2[..., SUB:, :SUB], d2[..., SUB:, SUB:]]
    win_err = jnp.stack([q.mean(axis=(-2, -1)) * 256.0 for q in quads],
                        axis=-1)                      # (B, F, 4)
    combined = (win_err * TF_WINDOW_BLOCK_BALANCE_WEIGHT
                + block_errors.astype(jnp.float32)) \
        / (TF_WINDOW_BLOCK_BALANCE_WEIGHT + 1)
    dist = jnp.sqrt((mvs.astype(jnp.float32) ** 2).sum(-1))
    d_factor = jnp.maximum(dist / jnp.maximum(mv_dist_th / 10.0, 1.0), 1.0)
    scaled = jnp.minimum(combined / 256.0 * d_factor
                         / jnp.maximum(decay_factor, 1e-6), 7.0)
    return jnp.exp(-scaled) * TF_WEIGHT_SCALE


def temporal_filter(center: jnp.ndarray, preds: jnp.ndarray,
                    block_errors: jnp.ndarray, mvs: jnp.ndarray,
                    decay_factor=1.0, mv_dist_th=16.0,
                    center_weight: int = TF_WEIGHT_SCALE) -> jnp.ndarray:
    """Filter a batch of 32x32 blocks against F MC predictions.

    Returns the filtered blocks (B, 32, 32) int32 (rounded weighted
    average incl. the center frame at full weight, reference
    svt_aom_apply_filtering_central semantics)."""
    w = subblock_weights(center, preds, block_errors, mvs,
                         decay_factor, mv_dist_th)     # (B, F, 4)
    # expand subblock weights to pixels
    b, f, _ = w.shape
    wq = w.reshape(b, f, 2, 2)
    wpix = jnp.repeat(jnp.repeat(wq, SUB, axis=2), SUB, axis=3)
    accum = (center.astype(jnp.float32) * center_weight
             + (preds.astype(jnp.float32) * wpix).sum(axis=1))
    count = center_weight + wpix.sum(axis=1)
    return jnp.clip(jnp.round(accum / count), 0, 255).astype(jnp.int32)
