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

import functools
import os

FILTER_BITS = 7
WIENER_ROUND0 = 3
WIENER_ROUND1 = 2 * FILTER_BITS - WIENER_ROUND0

SGRPROJ_SGR = 256
SGRPROJ_RST_BITS = 4
SGRPROJ_PRJ_BITS = 7
SGRPROJ_SGR_BITS = 8
SGRPROJ_RECIP_BITS = 12
SGRPROJ_MTABLE_BITS = 20
SGRPROJ_PRJ_MIN0, SGRPROJ_PRJ_MAX0 = -96, 31
SGRPROJ_PRJ_MIN1, SGRPROJ_PRJ_MAX1 = -32, 95

_SGR_DATA = os.path.join(os.path.dirname(__file__), "..", "codec", "data",
                         "av1_sgr_tables.npz")


@functools.lru_cache(maxsize=1)
def _sgr_tables():
    return dict(np.load(_SGR_DATA))


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


def _box_sum_full(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Full-window (2r+1)^2 sums over trailing 2 dims, VALID region.

    (B, H, W) -> (B, H-2r, W-2r).  Exact int32 shifted adds; matches the
    reference boxsum interior (the truncated borders are never read for
    the positions the SGR filter consumes)."""
    n = 2 * r + 1
    acc = None
    for dy in range(n):
        row = x[:, dy:dy + x.shape[1] - 2 * r, :]
        acc = row if acc is None else acc + row
    out = None
    for dx in range(n):
        col = acc[:, :, dx:dx + x.shape[2] - 2 * r]
        out = col if out is None else out + col
    return out


def _sgr_ab(dgd_ext: jnp.ndarray, r: int, s: int, h: int, w: int,
            bd: int = 8):
    """A (blend factor) and B arrays on the (h+2) x (w+2) grid around the
    unit (positions -1..h, -1..w), from the 3-pixel-border extended
    input.  Mirrors selfguided_restoration_internal's A/B stage."""
    n = (2 * r + 1) * (2 * r + 1)
    x = jnp.asarray(dgd_ext).astype(jnp.int32)
    # boxes centered at positions -1..h => ext rows (3-1-r) .. ; VALID
    # box output grid index 0 centers at ext position r
    sums = _box_sum_full(x, r)
    sq = _box_sum_full(x * x, r)
    # center (-1,-1) is at ext coords (2,2) => box grid (2-r, 2-r)
    o = 2 - r
    bsum = sums[:, o:o + h + 2, o:o + w + 2]
    asum = sq[:, o:o + h + 2, o:o + w + 2]
    a = (asum + ((1 << (2 * (bd - 8))) >> 1)) >> (2 * (bd - 8)) \
        if bd > 8 else asum
    b = (bsum + ((1 << (bd - 8)) >> 1)) >> (bd - 8) if bd > 8 else bsum
    p = jnp.maximum(a * n - b * b, 0)
    # z = round_pow2(p * s, 20) exactly, with p*s possibly > 2^31:
    # split p at 12 bits
    th = p >> 12
    tl = p & 0xFFF
    hh = th * s
    ll = tl * s + (1 << (SGRPROJ_MTABLE_BITS - 1))
    z = (hh >> 8) + ((((hh & 255) << 12) + ll) >> SGRPROJ_MTABLE_BITS)
    tabs = _sgr_tables()
    xbx = jnp.asarray(tabs["x_by_xplus1"].astype(np.int32))
    obx = jnp.asarray(tabs["one_by_x"].astype(np.int32))
    A = xbx[jnp.minimum(z, 255)]
    B = (((SGRPROJ_SGR - A) * bsum * int(obx[n - 1]))
         + (1 << (SGRPROJ_RECIP_BITS - 1))) >> SGRPROJ_RECIP_BITS
    return A, B


def selfguided_restoration(dgd_ext: jnp.ndarray, eps: int, h: int, w: int,
                           bd: int = 8):
    """Self-guided filters flt0 (r0, "fast" half-rate rows) and flt1 (r1)
    for a batch of restoration units.

    dgd_ext: (B, h+6, w+6) int32 (3-pixel border each side; origin at
    [:, 3, 3]).  Returns (flt0, flt1) each (B, h, w) int32 (entries
    meaningless when the corresponding radius is 0).  Bit-exact with
    svt_av1_selfguided_restoration_c."""
    tabs = _sgr_tables()
    r0, r1, s0, s1 = [int(v) for v in tabs["sgr_params"][eps]]
    bt = dgd_ext.shape[0]
    dgd = jnp.asarray(dgd_ext).astype(jnp.int32)
    center = dgd[:, 3:3 + h, 3:3 + w]
    flt0 = jnp.zeros((bt, h, w), jnp.int32)
    flt1 = jnp.zeros((bt, h, w), jnp.int32)

    if r0 > 0:
        A, B = _sgr_ab(dgd, r0, s0, h, w, bd)  # grid rows -1..h
        # even output rows i use A/B rows i-1 and i+1 (grid i, i+2);
        # odd rows use their own row (grid i+1)
        ri = np.arange(h)
        even = (ri % 2) == 0
        ga_up = A[:, ri, :]        # grid row i   == image row i-1
        gb_up = B[:, ri, :]
        ga_dn = A[:, ri + 2, :]    # image row i+1
        gb_dn = B[:, ri + 2, :]
        ga_ow = A[:, ri + 1, :]    # own row
        gb_ow = B[:, ri + 1, :]

        def comb_even(g):
            # columns of g are grid cols -1..w; center j = col j+1
            mid = g[:, :, 1:w + 1]
            lf = g[:, :, 0:w]
            rt = g[:, :, 2:w + 2]
            return mid, lf, rt

        a_m_u, a_l_u, a_r_u = comb_even(ga_up)
        a_m_d, a_l_d, a_r_d = comb_even(ga_dn)
        b_m_u, b_l_u, b_r_u = comb_even(gb_up)
        b_m_d, b_l_d, b_r_d = comb_even(gb_dn)
        a_even = (a_m_u + a_m_d) * 6 + (a_l_u + a_l_d + a_r_u + a_r_d) * 5
        b_even = (b_m_u + b_m_d) * 6 + (b_l_u + b_l_d + b_r_u + b_r_d) * 5
        a_m_o, a_l_o, a_r_o = comb_even(ga_ow)
        b_m_o, b_l_o, b_r_o = comb_even(gb_ow)
        a_odd = a_m_o * 6 + (a_l_o + a_r_o) * 5
        b_odd = b_m_o * 6 + (b_l_o + b_r_o) * 5
        evm = jnp.asarray(even)[None, :, None]
        nb_even, nb_odd = 5, 4
        v_e = a_even * center + b_even
        v_o = a_odd * center + b_odd
        sh_e = SGRPROJ_SGR_BITS + nb_even - SGRPROJ_RST_BITS
        sh_o = SGRPROJ_SGR_BITS + nb_odd - SGRPROJ_RST_BITS
        f_e = (v_e + (1 << (sh_e - 1))) >> sh_e
        f_o = (v_o + (1 << (sh_o - 1))) >> sh_o
        flt0 = jnp.where(evm, f_e, f_o)

    if r1 > 0:
        A, B = _sgr_ab(dgd, r1, s1, h, w, bd)

        def nine(g):
            c = g[:, 1:h + 1, 1:w + 1]
            u = g[:, 0:h, 1:w + 1]
            d = g[:, 2:h + 2, 1:w + 1]
            l = g[:, 1:h + 1, 0:w]
            r_ = g[:, 1:h + 1, 2:w + 2]
            ul = g[:, 0:h, 0:w]
            ur = g[:, 0:h, 2:w + 2]
            dl = g[:, 2:h + 2, 0:w]
            dr = g[:, 2:h + 2, 2:w + 2]
            return (c + u + d + l + r_) * 4 + (ul + ur + dl + dr) * 3

        a9 = nine(A)
        b9 = nine(B)
        nb = 5
        v = a9 * center + b9
        sh = SGRPROJ_SGR_BITS + nb - SGRPROJ_RST_BITS
        flt1 = (v + (1 << (sh - 1))) >> sh

    return flt0, flt1


def apply_selfguided(dat_ext: jnp.ndarray, eps: int, xqd0, xqd1,
                     h: int, w: int, bd: int = 8) -> jnp.ndarray:
    """Full SGR restoration: filters + projection (spec §7.17.3;
    svt_apply_selfguided_restoration_c).  xqd0/xqd1: (B,) int32 signaled
    projection params."""
    tabs = _sgr_tables()
    r0, r1 = [int(v) for v in tabs["sgr_params"][eps][:2]]
    flt0, flt1 = selfguided_restoration(dat_ext, eps, h, w, bd)
    xqd0 = jnp.asarray(xqd0).astype(jnp.int32)[:, None, None]
    xqd1 = jnp.asarray(xqd1).astype(jnp.int32)[:, None, None]
    # decode_xq
    if r0 == 0:
        xq0 = jnp.zeros_like(xqd0)
        xq1 = (1 << SGRPROJ_PRJ_BITS) - xqd1
    elif r1 == 0:
        xq0 = xqd0
        xq1 = jnp.zeros_like(xqd1)
    else:
        xq0 = xqd0
        xq1 = (1 << SGRPROJ_PRJ_BITS) - xq0 - xqd1
    dat = jnp.asarray(dat_ext).astype(jnp.int32)[:, 3:3 + h, 3:3 + w]
    u = dat << SGRPROJ_RST_BITS
    v = u << SGRPROJ_PRJ_BITS
    if r0 > 0:
        v = v + xq0 * (flt0 - u)
    if r1 > 0:
        v = v + xq1 * (flt1 - u)
    sh = SGRPROJ_PRJ_BITS + SGRPROJ_RST_BITS
    wv = (v + (1 << (sh - 1))) >> sh
    return jnp.clip(wv, 0, (1 << bd) - 1)
