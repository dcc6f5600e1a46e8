"""Hadamard transform / SATD cost (JAX, batched).

Behavioral reference: C_DEFAULT/picture_operators_c.c
svt_aom_hadamard_8x8_c + satd accumulation.  Used by MD fast-cost stages
(SATD approximates transform-domain rate better than SAD).

TPU design: the 8-point Hadamard butterfly with its specific output
permutation is a fixed 8x8 +/-1 matrix, so hadamard_8x8 is two MXU
matmuls per block batch: coeff = P H (X) H^T with the permutation folded
into the matrix.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=1)
def _h8() -> np.ndarray:
    """8x8 matrix M with out = M @ in matching hadamard_col8 (including
    its output ordering)."""
    m = np.zeros((8, 8), dtype=np.int32)
    # derive by symbolic evaluation of the butterfly
    for k in range(8):
        x = np.zeros(8, dtype=np.int32)
        x[k] = 1
        b = np.array([x[0] + x[1], x[0] - x[1], x[2] + x[3], x[2] - x[3],
                      x[4] + x[5], x[4] - x[5], x[6] + x[7], x[6] - x[7]])
        c = np.array([b[0] + b[2], b[1] + b[3], b[0] - b[2], b[1] - b[3],
                      b[4] + b[6], b[5] + b[7], b[4] - b[6], b[5] - b[7]])
        out = np.zeros(8, dtype=np.int32)
        out[0] = c[0] + c[4]
        out[7] = c[1] + c[5]
        out[3] = c[2] + c[6]
        out[4] = c[3] + c[7]
        out[2] = c[0] - c[4]
        out[6] = c[1] - c[5]
        out[1] = c[2] - c[6]
        out[5] = c[3] - c[7]
        m[:, k] = out
    return m


def hadamard_8x8(diff: jnp.ndarray) -> jnp.ndarray:
    """(B, 8, 8) int residuals -> (B, 8, 8) int32 Hadamard coefficients,
    bit-exact with svt_aom_hadamard_8x8_c (column pass then row pass,
    output stored row-major per the reference's buffer2 layout)."""
    m = jnp.asarray(_h8())
    x = jnp.asarray(diff).astype(jnp.int32)
    # pass 1 (columns): buffer[j, o] = (M @ x[:, j])[o]
    t = jnp.einsum("ok,bkj->bjo", m, x)
    # pass 2: buffer2[i, o] = (M @ buffer[:, i])[o]
    out = jnp.einsum("ok,bki->bio", m, t)
    # int32 math == the reference's int16 path for in-range (9-bit)
    # residuals (the C's documented dynamic ranges never wrap)
    return out


def satd(diff: jnp.ndarray) -> jnp.ndarray:
    """Sum of absolute Hadamard-transformed differences over (B, 8, 8)
    residual blocks -> (B,)."""
    return jnp.sum(jnp.abs(hadamard_8x8(diff)), axis=(1, 2))
