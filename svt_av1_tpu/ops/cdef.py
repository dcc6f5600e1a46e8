"""CDEF: constrained directional enhancement filter (JAX, batched).

Normative filter (AV1 spec §7.15; behavioral reference: cdef.c
svt_aom_cdef_find_dir_c / svt_cdef_filter_block_c).  TPU redesign:

  * direction search: the 8 directional partial-sum projections are
    precomputed 0/1 matrices, so all partials for a batch of 8x8 blocks
    are two einsums (MXU) instead of per-pixel scatter loops;
  * the filter is pure gather + elementwise over a padded (B, 12, 12)
    window batch (VPU).

Frame assembly (strength search over segments, boundary handling with
CDEF_VERY_LARGE) lives in the pipeline stage that wires this in.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

CDEF_VERY_LARGE = 0x7F7F
# direction offsets (dy, dx) per direction 0..7 and tap k in {0,1}
# (spec Cdef_Directions)
CDEF_DIRECTIONS = np.array([
    [(-1, 1), (-2, 2)],
    [(0, 1), (-1, 2)],
    [(0, 1), (0, 2)],
    [(0, 1), (1, 2)],
    [(1, 1), (2, 2)],
    [(1, 0), (2, 1)],
    [(1, 0), (2, 0)],
    [(1, 0), (2, -1)]], dtype=np.int32)

PRI_TAPS = np.array([[4, 2], [3, 3]], dtype=np.int32)
SEC_TAPS = np.array([[2, 1], [2, 1]], dtype=np.int32)

_DIV_TABLE = np.array([0, 840, 420, 280, 210, 168, 140, 120, 105],
                      dtype=np.int64)


@functools.lru_cache(maxsize=1)
def _partial_projections() -> np.ndarray:
    """(8, 15, 64) 0/1 projection tensors: P[d, p, i*8+j] = 1 iff pixel
    (i, j) contributes to partial[d][p] (spec direction partials)."""
    P = np.zeros((8, 15, 64), dtype=np.float32)
    for i in range(8):
        for j in range(8):
            px = i * 8 + j
            P[0, i + j, px] = 1
            P[1, i + j // 2, px] = 1
            P[2, i, px] = 1
            P[3, 3 + i - j // 2, px] = 1
            P[4, 7 + i - j, px] = 1
            P[5, 3 - i // 2 + j, px] = 1
            P[6, j, px] = 1
            P[7, i // 2 + j, px] = 1
    return P


@functools.lru_cache(maxsize=1)
def _cost_weights() -> np.ndarray:
    """(8, 15) per-partial cost weights (div_table pattern per spec)."""
    W = np.zeros((8, 15), dtype=np.float32)
    for d in (2, 6):
        W[d, :8] = _DIV_TABLE[8]
    for d in (0, 4):
        for i in range(7):
            W[d, i] = _DIV_TABLE[i + 1]
            W[d, 14 - i] = _DIV_TABLE[i + 1]
        W[d, 7] = _DIV_TABLE[8]
    for d in (1, 3, 5, 7):
        for j in range(5):
            W[d, 3 + j] = _DIV_TABLE[8]
        for j in range(3):
            W[d, j] = _DIV_TABLE[2 * j + 2]
            W[d, 10 - j] = _DIV_TABLE[2 * j + 2]
    return W


def cdef_find_dir(blocks: jnp.ndarray, coeff_shift: int = 0
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Direction search for a batch of 8x8 blocks.

    blocks: (B, 8, 8) int32 pixels.  Returns (dir (B,), var (B,)),
    bit-exact with svt_aom_cdef_find_dir_c."""
    b = blocks.shape[0]
    x = ((blocks.astype(jnp.int32) >> coeff_shift) - 128).reshape(b, 64)
    P = jnp.asarray(_partial_projections())          # (8, 15, 64)
    partials = jnp.einsum("dpi,bi->bdp", P, x.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
    W = jnp.asarray(_cost_weights())                 # (8, 15)
    cost = jnp.sum(partials * partials * W[None], axis=2)  # (B, 8) f32
    # partials <= 8*127, squared*840 <= ~8.7e8: exact in f32? 8.7e8 > 2^24;
    # accumulate costs in int64-free exact form via float64 unavailable —
    # recompute in int32 pieces: weights*partial^2 fits int64 only.  Use
    # integer math: partial fits int16, square fits int32; weighted sum
    # can reach ~2^33 — split into two int32 accumulators by weight.
    pi = partials.astype(jnp.int32)
    sq = pi * pi                                     # <= (1016)^2 ~ 2^20
    Wi = jnp.asarray(_cost_weights().astype(np.int32))
    prod = sq * Wi[None]                             # <= 2^20 * 840 ~ 2^30
    hi = jnp.sum(prod >> 16, axis=2)
    lo = jnp.sum(prod & 0xFFFF, axis=2)              # <= 15*2^16 ~ 2^20
    cost_hi = hi + (lo >> 16)
    cost_lo = lo & 0xFFFF
    # compare (hi, lo) lexicographically via float combine (exact: hi
    # < 2^18, so hi*2^16 + lo < 2^34 fits float64... use two-key argmax)
    best_dir = jnp.argmax(cost_hi * 65536.0 + cost_lo, axis=1)
    cost_f = cost_hi.astype(jnp.float32) * 65536.0 + cost_lo
    bi = jnp.arange(b)
    best_cost = cost_f[bi, best_dir]
    ortho = cost_f[bi, (best_dir + 4) & 7]
    var = ((best_cost - ortho) / 1024.0).astype(jnp.int32)
    return best_dir.astype(jnp.int32), var


def _constrain(diff, threshold, shift):
    """Vectorized spec constrain(); shift precomputed from damping."""
    mag = jnp.minimum(jnp.abs(diff),
                      jnp.maximum(0, threshold - (jnp.abs(diff) >> shift)))
    return jnp.sign(diff) * mag


def _msb(x):
    """floor(log2(x)) for x >= 1, elementwise, integer-exact."""
    out = jnp.zeros_like(x)
    for k in range(1, 16):
        out = jnp.where(x >= (1 << k), k, out)
    return out


def cdef_filter_block(windows: jnp.ndarray, pri_strength, sec_strength,
                      direction, pri_damping: int, sec_damping: int,
                      coeff_shift: int = 0, bd: int = 8,
                      n: int = 8) -> jnp.ndarray:
    """Filter a batch of n x n blocks (n=8 luma, n=4 chroma 4:2:0).

    windows: (B, n+4, n+4) int32 padded input (block at [2:2+n, 2:2+n];
             out-of-frame samples = CDEF_VERY_LARGE).
    pri_strength/sec_strength/direction: (B,) int32.
    Bit-exact with svt_cdef_filter_block_c."""
    b = windows.shape[0]
    x = windows[:, 2:2 + n, 2:2 + n]
    tap_sel = (pri_strength >> coeff_shift) & 1
    pri_taps = jnp.asarray(PRI_TAPS)[tap_sel]     # (B, 2)
    sec_taps = jnp.asarray(SEC_TAPS)[tap_sel]
    pri_sh = jnp.maximum(
        0, pri_damping - jnp.where(pri_strength > 0,
                                   _msb(jnp.maximum(pri_strength, 1)), 0))
    sec_sh = jnp.maximum(
        0, sec_damping - jnp.where(sec_strength > 0,
                                   _msb(jnp.maximum(sec_strength, 1)), 0))

    dirs = jnp.asarray(CDEF_DIRECTIONS)           # (8, 2, 2)
    sum_ = jnp.zeros((b, n, n), jnp.int32)
    mx = x
    mn = x

    def shifted(dy, dx):
        """(B, n, n) gather at offset (dy, dx); dy/dx are (B,) traced."""
        rr = jnp.arange(n)[None, :, None] + dy[:, None, None] + 2
        cols = jnp.arange(n)[None, None, :] + dx[:, None, None] + 2
        return windows[jnp.arange(b)[:, None, None], rr, cols]

    for k in range(2):
        d_pri = dirs[direction, k]                # (B, 2)
        d_sec0 = dirs[(direction + 2) & 7, k]
        d_sec1 = dirs[(direction - 2) & 7, k]
        for sgn in (1, -1):
            p = shifted(sgn * d_pri[:, 0], sgn * d_pri[:, 1])
            large = p == CDEF_VERY_LARGE
            sum_ = sum_ + pri_taps[:, k][:, None, None] * _constrain(
                jnp.where(large, 0, p - x), pri_strength[:, None, None],
                pri_sh[:, None, None])
            mx = jnp.maximum(mx, jnp.where(large, mx, p))
            mn = jnp.minimum(mn, p)
            for dsec in (d_sec0, d_sec1):
                s = shifted(sgn * dsec[:, 0], sgn * dsec[:, 1])
                large_s = s == CDEF_VERY_LARGE
                sum_ = sum_ + sec_taps[:, k][:, None, None] * _constrain(
                    jnp.where(large_s, 0, s - x),
                    sec_strength[:, None, None], sec_sh[:, None, None])
                mx = jnp.maximum(mx, jnp.where(large_s, mx, s))
                mn = jnp.minimum(mn, s)

    y = x + ((8 + sum_ - (sum_ < 0)) >> 4)
    return jnp.clip(y, mn, mx)
