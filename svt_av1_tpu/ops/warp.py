"""Affine warped-motion prediction (spec 7.11.3.2 warp process;
behavioral reference: warped_motion.c svt_av1_warp_affine_c /
svt_get_shear_params).

TPU design: every 8x8 output block of the warped region is one batch
lane — per-block integer source anchors and fractional phases are
computed up front, the 15x18 clamped source windows are gathered once,
and both filter passes are einsums against per-position 8-tap filters
looked up from the normative table (193 x 8).  Bit-exact vs the
reference scalar loop (non-compound path).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

WARPEDMODEL_PREC_BITS = 16
WARPEDPIXEL_PREC_BITS = 6
WARPEDDIFF_PREC_BITS = WARPEDMODEL_PREC_BITS - WARPEDPIXEL_PREC_BITS
WARPEDPIXEL_PREC_SHIFTS = 1 << WARPEDPIXEL_PREC_BITS
WARP_PARAM_REDUCE_BITS = 6
FILTER_BITS = 7

_DATA = os.path.join(os.path.dirname(__file__), "..", "codec", "data",
                     "av1_warp_filters.npz")


@functools.lru_cache(maxsize=1)
def warped_filter() -> np.ndarray:
    return np.load(_DATA)["warped_filter"].astype(np.int32)


def _rpot_signed(v: int, n: int) -> int:
    m = (abs(v) + (1 << (n - 1))) >> n
    return -m if v < 0 else m


@functools.lru_cache(maxsize=1)
def _div_lut() -> np.ndarray:
    """div_lut[f] = round(2^14 * 256 / (256 + f)) — the normative
    divisor table (warped_motion.c:298)."""
    f = np.arange(257)
    return np.round((1 << 14) * 256.0 / (256 + f)).astype(np.int32)


def _resolve_divisor_32(d: int):
    """(y, shift) such that 1/d ~= y >> shift (resolve_divisor_32)."""
    DIV_LUT_PREC_BITS = 14
    DIV_LUT_BITS = 8
    shift = d.bit_length() - 1          # get_msb
    e = d - (1 << shift)
    if shift > DIV_LUT_BITS:
        f = (e + (1 << (shift - DIV_LUT_BITS - 1))) \
            >> (shift - DIV_LUT_BITS)
    else:
        f = e << (DIV_LUT_BITS - shift)
    return int(_div_lut()[f]), shift + DIV_LUT_PREC_BITS


def shear_params(mat):
    """(alpha, beta, gamma, delta) or None when the affine set is
    invalid (svt_get_shear_params)."""
    if mat[2] <= 0:
        return None
    alpha = int(np.clip(mat[2] - (1 << WARPEDMODEL_PREC_BITS),
                        -32768, 32767))
    beta = int(np.clip(mat[3], -32768, 32767))
    y, shift = _resolve_divisor_32(abs(mat[2]))
    y *= 1 if mat[2] >= 0 else -1
    v = (mat[4] << WARPEDMODEL_PREC_BITS) * y
    gamma = int(np.clip(_rpot_signed(v, shift), -32768, 32767))
    v = (mat[3] * mat[4]) * y
    delta = int(np.clip(mat[5] - _rpot_signed(v, shift)
                        - (1 << WARPEDMODEL_PREC_BITS), -32768, 32767))
    rb = WARP_PARAM_REDUCE_BITS
    alpha = _rpot_signed(alpha, rb) * (1 << rb)
    beta = _rpot_signed(beta, rb) * (1 << rb)
    gamma = _rpot_signed(gamma, rb) * (1 << rb)
    delta = _rpot_signed(delta, rb) * (1 << rb)
    # is_affine_shear_allowed
    if (4 * abs(alpha) + 7 * abs(beta) >= (1 << WARPEDMODEL_PREC_BITS)
            or 4 * abs(gamma) + 4 * abs(delta)
            >= (1 << WARPEDMODEL_PREC_BITS)):
        return None
    return alpha, beta, gamma, delta


def warp_core(nb, h, w, bd):
    """Traceable batched 8x8-block warp (see _jit_warp); composable
    into larger fused programs (pipeline/gop_fast.py)."""
    offset_bits_horiz = bd + FILTER_BITS - 1
    round0 = 3 + (2 if bd == 12 else 0)
    reduce_bits_vert = 2 * FILTER_BITS - round0
    offset_bits_vert = bd + 2 * FILTER_BITS - round0
    hi = (1 << bd) - 1

    def f(ref, ix4, iy4, sx4, sy4, alpha, beta, gamma, delta):
        tbl = jnp.asarray(warped_filter())
        # source windows: rows iy4-7..iy4+7 (15), cols ix4-7..ix4+10 (18)
        rr = jnp.clip(iy4[:, None] + jnp.arange(-7, 8)[None, :], 0, h - 1)
        cc_ = jnp.clip(ix4[:, None] + jnp.arange(-7, 11)[None, :], 0,
                       w - 1)
        win = ref[rr[:, :, None], cc_[:, None, :]]      # (nb, 15, 18)
        li = jnp.arange(8)
        ki15 = jnp.arange(15)
        # horizontal phases: offs(k, l) per block
        # row index 0..14 maps to k = -7..7, and C advances by
        # beta * (k + 4) => beta * (ki - 3)
        sx = (sx4[:, None, None] + alpha * li[None, None, :]
              + beta * (ki15[None, :, None] - 3))
        offs_h = ((sx + (1 << (WARPEDDIFF_PREC_BITS - 1)))
                  >> WARPEDDIFF_PREC_BITS) + WARPEDPIXEL_PREC_SHIFTS
        fh = tbl[offs_h]                                 # (nb,15,8,8)
        # samples(k, l, m) = win[k, l + m]
        smp = jnp.stack([win[:, :, l:l + 8] for l in range(8)], axis=2)
        tmp = jnp.einsum("bklm,bklm->bkl", smp, fh,
                         preferred_element_type=jnp.int32)
        tmp = (tmp + (1 << offset_bits_horiz)
               + (1 << (round0 - 1))) >> round0          # (nb, 15, 8)
        # vertical
        ki = jnp.arange(8)
        sy = (sy4[:, None, None] + gamma * li[None, None, :]
              + delta * ki[None, :, None])
        offs_v = ((sy + (1 << (WARPEDDIFF_PREC_BITS - 1)))
                  >> WARPEDDIFF_PREC_BITS) + WARPEDPIXEL_PREC_SHIFTS
        fv = tbl[offs_v]                                 # (nb,8,8,8)
        vs = jnp.stack([tmp[:, k:k + 8, :] for k in range(8)],
                       axis=1)                           # (b, k, m, l)
        acc = jnp.einsum("bklm,bklm->bkl",
                         jnp.swapaxes(vs, 2, 3), fv,
                         preferred_element_type=jnp.int32)
        acc = acc + (1 << offset_bits_vert)
        acc = (acc + (1 << (reduce_bits_vert - 1))) >> reduce_bits_vert
        out = jnp.clip(acc - (1 << (bd - 1)) - (1 << bd), 0, hi)
        return out                                        # (nb, 8, 8)

    return f


@functools.lru_cache(maxsize=None)
def _jit_warp(nb, h, w, bd):
    return jax.jit(warp_core(nb, h, w, bd))


def warp_plane(ref: np.ndarray, mat, p_width: int, p_height: int,
               bd: int = 8, p_col: int = 0, p_row: int = 0,
               subsampling: int = 0):
    """Warped prediction of a (p_height, p_width) region anchored at
    (p_row, p_col) in the plane's coordinate system.

    mat: 6-entry wmmat (translation in mat[0..1], affine in mat[2..5]).
    Returns the predicted region (p_height, p_width) or None when the
    model's shear is illegal (caller falls back to translation)."""
    sh = shear_params(mat)
    if sh is None:
        return None
    alpha, beta, gamma, delta = sh
    h, w = ref.shape
    gbh, gbw = p_height // 8, p_width // 8
    nb = gbh * gbw
    bi = (np.arange(nb) // gbw) * 8 + p_row
    bj = (np.arange(nb) % gbw) * 8 + p_col
    src_x = (bj + 4) << subsampling
    src_y = (bi + 4) << subsampling
    dst_x = mat[2] * src_x + mat[3] * src_y + mat[0]
    dst_y = mat[4] * src_x + mat[5] * src_y + mat[1]
    x4 = dst_x >> subsampling
    y4 = dst_y >> subsampling
    ix4 = x4 >> WARPEDMODEL_PREC_BITS
    sx4 = x4 & ((1 << WARPEDMODEL_PREC_BITS) - 1)
    iy4 = y4 >> WARPEDMODEL_PREC_BITS
    sy4 = y4 & ((1 << WARPEDMODEL_PREC_BITS) - 1)
    sx4 = sx4 + alpha * (-4) + beta * (-4)
    sy4 = sy4 + gamma * (-4) + delta * (-4)
    sx4 &= ~((1 << WARP_PARAM_REDUCE_BITS) - 1)
    sy4 &= ~((1 << WARP_PARAM_REDUCE_BITS) - 1)
    fn = _jit_warp(nb, h, w, bd)
    out = fn(jnp.asarray(ref.astype(np.int32)),
             jnp.asarray(ix4.astype(np.int32)),
             jnp.asarray(iy4.astype(np.int32)),
             jnp.asarray(sx4.astype(np.int32)),
             jnp.asarray(sy4.astype(np.int32)),
             np.int32(alpha), np.int32(beta), np.int32(gamma),
             np.int32(delta))
    out = np.asarray(out)                                 # (nb, 8, 8)
    return (out.reshape(gbh, gbw, 8, 8).transpose(0, 2, 1, 3)
            .reshape(p_height, p_width))
