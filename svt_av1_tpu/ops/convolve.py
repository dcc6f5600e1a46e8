"""AV1 sub-pixel convolution (inter motion compensation), JAX batched.

Normative prediction path (behavioral reference: inter_prediction.c
svt_av1_convolve_2d_sr_c + sub_pel_filters_* kernels stored as data in
codec/data/av1_interp_filters.npz).  The 8-tap separable filter runs as
8 shifted multiply-accumulates per axis over the whole block batch —
pure VPU elementwise work with exact integer rounding, no gathers in the
inner loop.

Layout convention: callers provide padded reference windows of shape
(B, h + 7, w + 7) whose (3, 3) offset is the integer-aligned position
(fo_vert/fo_horiz = 3 for 8 taps).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

_DATA = os.path.join(os.path.dirname(__file__), "..", "codec", "data",
                     "av1_interp_filters.npz")

FILTER_BITS = 7
ROUND0 = 3       # conv_params->round_0 (8-bit single-ref)
ROUND1 = 11      # 2 * FILTER_BITS - ROUND0

EIGHTTAP_REGULAR = 0
EIGHTTAP_SMOOTH = 1
MULTITAP_SHARP = 2
BILINEAR = 3


@functools.lru_cache(maxsize=1)
def _filters():
    return dict(np.load(_DATA))


@functools.lru_cache(maxsize=None)
def filter_table(kind: int, small: bool = False) -> np.ndarray:
    """(16, 8) int32 kernel table for a filter kind.  ``small`` selects the
    4-tap variants used for w/h <= 4 blocks."""
    d = _filters()
    name = {EIGHTTAP_REGULAR: "sub_pel_filters_4" if small
            else "sub_pel_filters_8",
            EIGHTTAP_SMOOTH: "sub_pel_filters_4smooth" if small
            else "sub_pel_filters_8smooth",
            MULTITAP_SHARP: "sub_pel_filters_8sharp",
            BILINEAR: "bilinear_filters"}[kind]
    return d[name].astype(np.int32)


@functools.lru_cache(maxsize=1)
def filter_table_all() -> np.ndarray:
    """(3, 16, 8) stacked REGULAR/SMOOTH/SHARP tables — lets the filter
    kind be a TRACED scalar (one compiled program covers every frame
    interp-filter decision instead of recompiling per kind)."""
    return np.stack([filter_table(k) for k in (EIGHTTAP_REGULAR,
                                               EIGHTTAP_SMOOTH,
                                               MULTITAP_SHARP)])


def _tab_of(kind):
    """Filter table for a static int or traced scalar ``kind``."""
    if isinstance(kind, (int, np.integer)):
        return jnp.asarray(filter_table(int(kind)))
    return jnp.asarray(filter_table_all())[kind]


def _round_pow2(x, n):
    return (x + (1 << (n - 1))) >> n if n > 0 else x


def convolve_2d_sr(windows: jnp.ndarray, subpel_x: jnp.ndarray,
                   subpel_y: jnp.ndarray, w: int, h: int,
                   kind_x: int = EIGHTTAP_REGULAR,
                   kind_y: int = EIGHTTAP_REGULAR,
                   bd: int = 8) -> jnp.ndarray:
    """Bit-exact svt_av1_convolve_2d_sr over a block batch.

    windows: (B, h+7, w+7) int32 reference samples; the output block's
             integer position maps to windows[:, 3, 3].
    subpel_x/subpel_y: (B,) int32 in [0, 16) (q4 phase).
    Returns (B, h, w) int32 predicted samples in [0, 2^bd).
    """
    tab_x = _tab_of(kind_x)
    tab_y = _tab_of(kind_y)
    fx = tab_x[subpel_x]  # (B, 8)
    fy = tab_y[subpel_y]
    im_h = h + 7
    x = windows.astype(jnp.int32)
    # horizontal: 8 shifted MACs over columns
    acc = jnp.full((x.shape[0], im_h, w), 1 << (bd + FILTER_BITS - 1),
                   jnp.int32)
    for k in range(8):
        acc = acc + fx[:, k][:, None, None] * x[:, :, k:k + w]
    im = _round_pow2(acc, ROUND0)  # (B, im_h, w) fits int16 range
    # vertical
    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    acc2 = jnp.full((x.shape[0], h, w), 1 << offset_bits, jnp.int32)
    for k in range(8):
        acc2 = acc2 + fy[:, k][:, None, None] * im[:, k:k + h, :]
    res = _round_pow2(acc2, ROUND1) - (
        (1 << (offset_bits - ROUND1)) + (1 << (offset_bits - ROUND1 - 1)))
    bits = 2 * FILTER_BITS - ROUND0 - ROUND1
    out = _round_pow2(res, bits) if bits > 0 else res
    return jnp.clip(out, 0, (1 << bd) - 1)


ROUND1_COMP = 7   # COMPOUND_ROUND1_BITS


def _conv_buf(windows, spx, spy, w, h, tab, bd):
    """Dual-prediction intermediate (CONV_BUF domain): 2D convolve
    rounded by ROUND0 then ROUND1_COMP, offsets kept in."""
    fx = tab[spx]
    fy = tab[spy]
    im_h = h + 7
    x = windows.astype(jnp.int32)
    acc = jnp.full((x.shape[0], im_h, w),
                   1 << (bd + FILTER_BITS - 1), jnp.int32)
    for k in range(8):
        acc = acc + fx[:, k][:, None, None] * x[:, :, k:k + w]
    im = _round_pow2(acc, ROUND0)
    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    acc2 = jnp.full((x.shape[0], h, w), 1 << offset_bits, jnp.int32)
    for k in range(8):
        acc2 = acc2 + fy[:, k][:, None, None] * im[:, k:k + h, :]
    return _round_pow2(acc2, ROUND1_COMP)


def convolve_2d_compound_avg(win0: jnp.ndarray, win1: jnp.ndarray,
                             spx0, spy0, spx1, spy1, w: int, h: int,
                             kind: int = EIGHTTAP_REGULAR,
                             bd: int = 8) -> jnp.ndarray:
    """COMPOUND_AVERAGE dual prediction, bit-exact vs the reference
    jnt convolve path with use_jnt_comp_avg = 0 (jnt_convolve_2d:
    round_1 = COMPOUND_ROUND1_BITS, CONV_BUF intermediate, average,
    offset removal, final rounding)."""
    tab = _tab_of(kind)
    t0 = _conv_buf(win0, spx0, spy0, w, h, tab, bd)
    t1 = _conv_buf(win1, spx1, spy1, w, h, tab, bd)
    avg = (t0 + t1) >> 1
    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    res = avg - ((1 << (offset_bits - ROUND1_COMP))
                 + (1 << (offset_bits - ROUND1_COMP - 1)))
    round_bits = 2 * FILTER_BITS - ROUND0 - ROUND1_COMP
    mag = (jnp.abs(res) + (1 << (round_bits - 1))) >> round_bits
    out = jnp.where(res < 0, -mag, mag)
    return jnp.clip(out, 0, (1 << bd) - 1)


DIFF_FACTOR = 16


def convolve_2d_compound_diffwtd(win0: jnp.ndarray, win1: jnp.ndarray,
                                 spx0, spy0, spx1, spy1, w: int, h: int,
                                 inverse, kind: int = EIGHTTAP_REGULAR,
                                 bd: int = 8):
    """COMPOUND_DIFFWTD dual prediction: derive the 0..64 mask from the
    CONV_BUF difference (svt_av1_build_compound_diffwtd_mask_d16_c:
    m = clamp(38 + ROUND_POWER_OF_TWO(|t0-t1|, round) / DIFF_FACTOR)),
    then the same d16 masked blend as wedge.  inverse: (B,) bool/int —
    DIFFWTD_38_INV flips the mask.  Returns (pred, mask) — the mask is
    reused (2x2-subsampled) for the chroma planes."""
    tab = _tab_of(kind)
    t0 = _conv_buf(win0, spx0, spy0, w, h, tab, bd)
    t1 = _conv_buf(win1, spx1, spy1, w, h, tab, bd)
    rnd = 2 * FILTER_BITS - ROUND0 - ROUND1_COMP + (bd - 8)
    diff = (jnp.abs(t0 - t1) + (1 << (rnd - 1))) >> rnd
    m = jnp.clip(38 + diff // DIFF_FACTOR, 0, 64)
    inv = jnp.asarray(inverse).astype(jnp.int32)[:, None, None]
    m = jnp.where(inv > 0, 64 - m, m)
    res = (m * t0 + (64 - m) * t1) >> 6
    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    res = res - ((1 << (offset_bits - ROUND1_COMP))
                 + (1 << (offset_bits - ROUND1_COMP - 1)))
    round_bits = 2 * FILTER_BITS - ROUND0 - ROUND1_COMP
    out = (res + (1 << (round_bits - 1))) >> round_bits
    return jnp.clip(out, 0, (1 << bd) - 1), m


def convolve_2d_compound_masked(win0: jnp.ndarray, win1: jnp.ndarray,
                                spx0, spy0, spx1, spy1, w: int, h: int,
                                mask: jnp.ndarray,
                                kind: int = EIGHTTAP_REGULAR,
                                bd: int = 8) -> jnp.ndarray:
    """Masked (wedge) dual prediction, bit-exact vs
    svt_aom_lowbd_blend_a64_d16_mask_c: blend the two CONV_BUF
    intermediates with the 0..64 mask, remove the compound offset,
    final ROUND_POWER_OF_TWO (arithmetic, signed).

    mask: (B, h, w) int32 weights for src0 (already plane-subsampled
    for chroma)."""
    tab = _tab_of(kind)
    t0 = _conv_buf(win0, spx0, spy0, w, h, tab, bd)
    t1 = _conv_buf(win1, spx1, spy1, w, h, tab, bd)
    m = mask.astype(jnp.int32)
    res = (m * t0 + (64 - m) * t1) >> 6   # AOM_BLEND_A64_ROUND_BITS
    offset_bits = bd + 2 * FILTER_BITS - ROUND0
    res = res - ((1 << (offset_bits - ROUND1_COMP))
                 + (1 << (offset_bits - ROUND1_COMP - 1)))
    round_bits = 2 * FILTER_BITS - ROUND0 - ROUND1_COMP
    out = (res + (1 << (round_bits - 1))) >> round_bits
    return jnp.clip(out, 0, (1 << bd) - 1)
