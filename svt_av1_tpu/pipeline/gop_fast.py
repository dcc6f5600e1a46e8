"""Fast hierarchical-GOP pipeline: fused device programs per inter frame.

Round-3 speed redesign of the inter/GOP path.  The round-2 path ran
~10-20 separate device dispatches per frame with a host round trip after
most of them (HME pull for GM fitting, one pass-A dispatch + host merge
PER REFERENCE, 3 interp-filter probes, per-level DLF pulls, per-candidate
CDEF pulls).  On a tunneled TPU every device->host pull costs ~30 ms
regardless of size, so the frame rate was transfer-bound at well under
1 fps (measured 0.02 fps, VERDICT round 2).

The redesign (this module) runs each inter frame as:

  P1 "md"      — ONE program: per-ref HME -> global-motion fit (device
                 least squares + normative shear/quantization) -> warped
                 reference -> frame interp-filter pick -> pass A over all
                 refs and candidates (gm/ring/neighbor MVs, skip-mode
                 aware, COMPOUND_AVERAGE pair) merged ON DEVICE -> pass B
                 wavefront (intra fallback) -> dense per-block decision
                 arrays + unfiltered recon.
  P2 "filters" — ONE program: DLF per-plane level search (whole ladder
                 evaluated on device, argmin SSE) + CDEF direction search,
                 per-SB/per-candidate SSE matrix, the frame-uniform
                 strength pick (device argmin) AND the apply.  The final
                 recon never touches the host: it is the DPB slot input
                 of later frames, so a whole mini-GoP can be dispatched
                 before any host pull (EC overlaps device work).
  host         — ONE bundled device_get (a single ~30 ms round trip for
                 the per-block decision arrays + filter picks), entropy
                 coding.

Behavioral reference for the stage contents is unchanged (pass A/B
semantics: product_coding_loop.c MD funnel; DLF search dlf_process.c:
106-131; CDEF search cdef_process.c cdef_seg_search; GM global_me.c:139);
the fusion/batching shape is the TPU-native part.  Everything here is
8-bit, single-tile; other configs fall back to the round-2 stage path.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.ops import mc, quant, transforms as tf
from svt_av1_tpu.ops import warp as warp_ops
from svt_av1_tpu.pipeline import me as me_pipe
from svt_av1_tpu.pipeline.intra_encoder import (
    BLK, CBLK, _natural_maxb, _rd_step, _rd_step_chroma, _scan_pos,
    _schedule_arrays, _txb_bits, _wave_flat_index)
from svt_av1_tpu.pipeline.inter_encoder import _SUBPEL_RING, _mv_bits

WM = 1 << 16  # WARPEDMODEL_PREC_BITS unit


# --------------------------------------------------------------------------
# device global-motion estimation (estimate_global_rotzoom /
# estimate_global_translation ported to jnp so the HME field never
# leaves the device; the fit is a closed-form centered least squares)
# --------------------------------------------------------------------------

def _rpot_signed_t(v, n):
    """round_power_of_two_signed with traced shift (int32-safe)."""
    m = (jnp.abs(v) + (1 << (n - 1))) >> n
    return jnp.where(v < 0, -m, m)


def _rpot_signed_wide(p, y, s):
    """round_power_of_two_signed(p * y, s) where p*y may exceed int32.

    Exact 46-bit product emulation: |p| = a_hi*2^14 + a_lo, so
    (|p*y| + 2^(s-1)) >> s == (a_hi*|y| + ((a_lo*|y| + 2^(s-1)) >> 14))
    >> (s - 14) for s > 14 (shift composition on non-negative ints)."""
    sign = jnp.sign(p) * jnp.sign(y)
    a = jnp.abs(p)
    b = jnp.abs(y)
    t = (a >> 14) * b
    u = (a & 16383) * b
    c = u + (1 << (s - 1))       # rounding constant rides the low limb
    q = (t + (c >> 14)) >> (s - 14)
    return sign * q


def _msb_int(d, maxbit=18):
    """floor(log2(d)) for 1 <= d < 2^maxbit (traced)."""
    acc = jnp.zeros((), jnp.int32)
    for k in range(1, maxbit + 1):
        acc = acc + (d >= (1 << k)).astype(jnp.int32)
    return acc


def _shear_device(mat):
    """(alpha, beta, gamma, delta, valid) — svt_get_shear_params with
    traced wmmat (behavioral ref warped_motion.c:298-360)."""
    div_lut = jnp.asarray(warp_ops._div_lut())
    alpha = jnp.clip(mat[2] - WM, -32768, 32767)
    beta = jnp.clip(mat[3], -32768, 32767)
    d = jnp.maximum(jnp.abs(mat[2]), 1)
    shift = _msb_int(d)
    e = d - (1 << shift)
    hi = (e + (1 << jnp.maximum(shift - 9, 0))) >> jnp.maximum(shift - 8, 0)
    lo = e << jnp.maximum(8 - shift, 0)
    f = jnp.where(shift > 8, hi, lo)
    y = div_lut[jnp.clip(f, 0, 256)]
    shift_t = shift + 14
    # gamma: v = (mat[4] << 16) * y  ==  rpot(mat[4]*y, shift_t - 16)
    gamma = jnp.clip(_rpot_signed_t(mat[4] * y, shift_t - 16),
                     -32768, 32767)
    # delta: v = (mat[3] * mat[4]) * y (needs > 32 bits)
    dterm = _rpot_signed_wide(mat[3] * mat[4], y, shift_t)
    delta = jnp.clip(mat[5] - dterm - WM, -32768, 32767)
    rb = warp_ops.WARP_PARAM_REDUCE_BITS
    alpha = _rpot_signed_t(alpha, rb) << rb
    beta = _rpot_signed_t(beta, rb) << rb
    gamma = _rpot_signed_t(gamma, rb) << rb
    delta = _rpot_signed_t(delta, rb) << rb
    valid = ((mat[2] > 0)
             & (4 * jnp.abs(alpha) + 7 * jnp.abs(beta) < WM)
             & (4 * jnp.abs(gamma) + 4 * jnp.abs(delta) < WM))
    return alpha, beta, gamma, delta, valid


def _gm_fit(mv_y, mv_x, gh, gw):
    """Device GM fit from the HME field.

    Returns (mat (6,) int32, trans (2,) int32 1/8-pel, kind int32)
    with kind 0=IDENTITY, 1=TRANSLATION, 2=ROTZOOM.  Mirrors
    inter_encoder.estimate_global_{rotzoom,translation} (centered
    closed-form LS replaces lstsq; same trimmed refit and coded-grid
    quantization)."""
    dy = mv_y.astype(jnp.float32).reshape(-1)
    dx = mv_x.astype(jnp.float32).reshape(-1)
    n = gh * gw
    ysc = (np.arange(gh) * BLK + BLK // 2).astype(np.float32)
    xsc = (np.arange(gw) * BLK + BLK // 2).astype(np.float32)
    px = jnp.asarray(np.tile(xsc, gh))
    py = jnp.asarray(np.repeat(ysc, gw))

    def fit(wsel):
        wsum = jnp.maximum(wsel.sum(), 1.0)
        mx = (px * wsel).sum() / wsum
        my = (py * wsel).sum() / wsum
        cx = px - mx
        cy = py - my
        s = ((cx * cx + cy * cy) * wsel).sum() + 1e-6
        a = (((cx * dx + cy * dy) * wsel).sum()) / s
        b = (((cy * dx - cx * dy) * wsel).sum()) / s
        txp = ((dx * wsel).sum()) / wsum
        typ = ((dy * wsel).sum()) / wsum
        tx = txp - a * mx - b * my
        ty = typ + b * mx - a * my
        resx = a * px + b * py + tx - dx
        resy = -b * px + a * py + ty - dy
        r = jnp.sqrt(resx * resx + resy * resy)
        return a, b, tx, ty, r

    ones = jnp.ones((n,), jnp.float32)
    a0, b0, _, _, r0 = fit(ones)
    thr = jnp.maximum(1.5, jnp.median(r0) * 2.0)
    keep = (r0 <= thr).astype(jnp.float32)
    enough = keep.sum() >= 8
    keep = jnp.where(enough, keep, ones)
    # second trimmed round (the RANSAC-consensus role of
    # global_motion.c:363/ransac.c, as iterated reweighting): refit on
    # the inliers, re-trim against the inlier residual median — local
    # objects with independent motion drop out of the model entirely
    a1, b1, tx1, ty1, r1 = fit(keep)
    med1 = jnp.nanmedian(jnp.where(keep > 0, r1, jnp.nan))
    thr2 = jnp.maximum(1.0, med1 * 2.0)
    keep2 = keep * (r1 <= thr2).astype(jnp.float32)
    enough2 = keep2.sum() >= 8
    a, b, tx, ty, _ = fit(jnp.where(enough2, keep2, keep))
    # quantize to coded grids (inter_encoder.estimate_global_rotzoom)
    mat2 = jnp.clip((jnp.round((1.0 + a) * WM / 2) * 2).astype(jnp.int32),
                    WM - 8190, WM + 8190)
    mat3 = jnp.clip((jnp.round(b * WM / 2) * 2).astype(jnp.int32),
                    -8190, 8190)
    mat0 = jnp.clip((jnp.round(tx * 64) * 1024).astype(jnp.int32),
                    -(4095 << 10), 4095 << 10)
    mat1 = jnp.clip((jnp.round(ty * 64) * 1024).astype(jnp.int32),
                    -(4095 << 10), 4095 << 10)
    mat = jnp.stack([mat0, mat1, mat2, mat3, -mat3, mat2])
    span = np.float32(max(gh, gw) * BLK)
    rot_sig = ((jnp.abs(a) * span >= 0.7) | (jnp.abs(b) * span >= 0.7))
    *_, shear_ok = _shear_device(mat)
    non_ident = ~((mat2 == WM) & (mat3 == 0))
    rot_ok = rot_sig & shear_ok & non_ident

    # translation fallback (median + inlier mean, estimate_global_
    # translation semantics)
    med_y = jnp.median(dy)
    med_x = jnp.median(dx)
    inl = ((jnp.abs(dy - med_y) <= 1.5)
           & (jnp.abs(dx - med_x) <= 1.5)).astype(jnp.float32)
    frac = inl.sum() / np.float32(n)
    isum = jnp.maximum(inl.sum(), 1.0)
    tr = jnp.clip(jnp.round((dy * inl).sum() / isum) * 8,
                  -504, 504).astype(jnp.int32) & ~1
    tc = jnp.clip(jnp.round((dx * inl).sum() / isum) * 8,
                  -504, 504).astype(jnp.int32) & ~1
    tr_ok = ((jnp.abs(med_y) >= 1) | (jnp.abs(med_x) >= 1)) \
        & (frac >= 0.4) & ((tr != 0) | (tc != 0))
    kind = jnp.where(rot_ok, 2, jnp.where(tr_ok, 1, 0)).astype(jnp.int32)
    trans = jnp.where(kind == 1, jnp.stack([tr, tc]),
                      jnp.zeros(2, jnp.int32))
    ident = jnp.asarray([0, 0, WM, 0, 0, WM], jnp.int32)
    mat = jnp.where(kind == 2, mat, ident)
    return mat, trans, kind


def _gm_block_mvs(mat, gh, gw, hp=False):
    """Vectorized gm_block_mv for the 16x16 grid (codec/mv_pred.py:319):
    (nb, 2) int32 1/8-pel vectors from the block-center projection
    (convert_to_trans_prec: shift 13 under allow_high_precision_mv,
    else shift 14 doubled)."""
    nb = gh * gw
    x = (np.arange(nb) % gw * BLK + BLK // 2 - 1).astype(np.int32)
    y = (np.arange(nb) // gw * BLK + BLK // 2 - 1).astype(np.int32)
    xc = (mat[2] - WM) * x + mat[3] * y + mat[0]
    yc = mat[4] * x + (mat[5] - WM) * y + mat[1]
    if hp:
        return jnp.stack([_rpot_signed_t(yc, 13),
                          _rpot_signed_t(xc, 13)], axis=-1)
    return jnp.stack([_rpot_signed_t(yc, 14) * 2,
                      _rpot_signed_t(xc, 14) * 2], axis=-1)


def _warp_plane_traced(ref, mat, shear, p_w, p_h, bd, ss):
    """Whole-plane warped prediction with traced wmmat/shear
    (warp_plane with device parameters; bit-exact same filter)."""
    h, w = ref.shape
    gbh, gbw = p_h // 8, p_w // 8
    nb = gbh * gbw
    bi = ((np.arange(nb) // gbw) * 8).astype(np.int32)
    bj = ((np.arange(nb) % gbw) * 8).astype(np.int32)
    src_x = ((bj + 4) << ss).astype(np.int32)
    src_y = ((bi + 4) << ss).astype(np.int32)
    dst_x = mat[2] * src_x + mat[3] * src_y + mat[0]
    dst_y = mat[4] * src_x + mat[5] * src_y + mat[1]
    x4 = dst_x >> ss
    y4 = dst_y >> ss
    ix4 = x4 >> warp_ops.WARPEDMODEL_PREC_BITS
    sx4 = x4 & (WM - 1)
    iy4 = y4 >> warp_ops.WARPEDMODEL_PREC_BITS
    sy4 = y4 & (WM - 1)
    alpha, beta, gamma, delta = shear
    sx4 = (sx4 - 4 * (alpha + beta)) & ~((1 << 6) - 1)
    sy4 = (sy4 - 4 * (gamma + delta)) & ~((1 << 6) - 1)
    f = warp_ops.warp_core(nb, h, w, bd)
    out = f(ref, ix4, iy4, sx4, sy4, alpha, beta, gamma, delta)
    return (out.reshape(gbh, gbw, 8, 8).transpose(0, 2, 1, 3)
            .reshape(p_h, p_w))


# --------------------------------------------------------------------------
# pass A (device, multi-ref merged)
# --------------------------------------------------------------------------

def _clamp_cands(cand, ys, xs, blk, h, w, pad=mc.PAD, hp=False,
                 blk_h=None):
    """jnp clamp_mvs_for_pad over (nb, K, 2) candidates.

    hp: keep 1/8-pel precision (allow_high_precision_mv); otherwise
    clear the low bit (quarter-pel MVs).  blk_h: block height when it
    differs from the width (rect extents)."""
    bh = blk if blk_h is None else blk_h
    r = jnp.clip(cand[..., 0], (-(ys + pad - 4) * 8)[:, None],
                 ((h + pad - 4 - (ys + bh)) * 8)[:, None],)
    c = jnp.clip(cand[..., 1], (-(xs + pad - 4) * 8)[:, None],
                 ((w + pad - 4 - (xs + blk)) * 8)[:, None])
    if hp:
        return jnp.stack([r, c], axis=-1)
    return jnp.stack([r & ~1, c & ~1], axis=-1)


def _eval_split8(src_y, src_u, src_v, refp_y, refp_u, refp_v, cand,
                 ys, xs, qpp, lam, rt, bd, interp, nb, K, hp, h, w):
    """8x8 partition-split alternative for one 16x16 block vs ONE
    reference: each of the four 8x8 sub-blocks picks its own MV from
    the parent candidate set, codes TX_8X8 luma + TX_4X4 chroma, and
    decides skip independently (the d1/d2 partition compare of the
    reference MD, product_coding_loop.c:10350-10420, restricted to
    SPLIT-at-16 with single-ref translational subs).

    Returns (cost_split, cost_y_split, smv (nb,4,2), sskip (nb,4),
    qy_comp (nb,16,16), rec_comp, qu_comp (nb,8,8), recu_comp,
    qv_comp, recv_comp) — composites hold each sub's tx coefficients /
    recon in its spatial quadrant."""
    coef_y, coef_uv, txbb, eob_y, eob_uv = rt
    pos8 = jnp.asarray(_scan_pos(cc.TX_8X8))
    pos4 = jnp.asarray(_scan_pos(cc.TX_4X4))
    s2y8 = np.float32(tf.coeff_sse_scale(cc.TX_8X8, cc.DCT_DCT))
    s2c4 = np.float32(tf.coeff_sse_scale(cc.TX_4X4, cc.DCT_DCT))
    SUB = BLK // 2          # 8
    CSUB = CBLK // 2        # 4
    offs8 = jnp.arange(SUB)
    offc4 = jnp.arange(CSUB)
    cost_y_tot = jnp.zeros((nb,), jnp.float32)
    cost_tot = jnp.zeros((nb,), jnp.float32)
    smvs, sskips = [], []
    qy_c = jnp.zeros((nb, BLK, BLK), jnp.int32)
    rec_c = jnp.zeros((nb, BLK, BLK), jnp.int32)
    qu_c = jnp.zeros((nb, CBLK, CBLK), jnp.int32)
    ru_c = jnp.zeros((nb, CBLK, CBLK), jnp.int32)
    qv_c = jnp.zeros((nb, CBLK, CBLK), jnp.int32)
    rv_c = jnp.zeros((nb, CBLK, CBLK), jnp.int32)
    for dy, dx in ((0, 0), (0, SUB), (SUB, 0), (SUB, SUB)):
        ys_s = ys + dy
        xs_s = xs + dx
        cand_s = _clamp_cands(cand, ys_s, xs_s, SUB, h, w, hp=hp)
        mvsK = cand_s.transpose(1, 0, 2).reshape(nb * K, 2)
        pred = mc.mc_blocks(refp_y, jnp.tile(ys_s, K),
                            jnp.tile(xs_s, K), mvsK, SUB, mc.PAD, 0,
                            bd, kind=interp)
        rows = jnp.tile(ys_s, K)[:, None, None] + offs8[None, :, None]
        cols = jnp.tile(xs_s, K)[:, None, None] + offs8[None, None, :]
        resid = src_y[rows, cols] - pred
        coeffs = tf.fwd_txfm2d(resid, cc.DCT_DCT, cc.TX_8X8)
        qc, dq = quant.quantize(coeffs, qpp, cc.TX_8X8)
        dist = s2y8 * jnp.sum((coeffs - dq.astype(jnp.float32)) ** 2,
                              axis=(1, 2))
        mvb = _mv_bits(mvsK)
        # luma TX_8X8 priced with the 8-wide table set (plane-eff.
        # mismatch is acceptable MD approximation)
        bits = _txb_bits(jnp.abs(qc), coef_uv, txbb[1], eob_uv,
                         pos8) + mvb
        cost_coded = dist + lam * bits
        dist_skip = jnp.sum(resid.astype(jnp.float32) ** 2,
                            axis=(1, 2))
        cost_skip = dist_skip + lam * (mvb + 2.0)
        cost_k = jnp.minimum(cost_coded, cost_skip).reshape(K, nb)
        kbest = jnp.argmin(cost_k, axis=0)
        sel = kbest[None, :, None, None] == \
            jnp.arange(K)[:, None, None, None]
        bq = jnp.sum(jnp.where(sel, qc.reshape(K, nb, SUB, SUB), 0),
                     axis=0)
        bdq = jnp.sum(jnp.where(sel, dq.reshape(K, nb, SUB, SUB), 0),
                      axis=0)
        bpred = jnp.sum(jnp.where(sel, pred.reshape(K, nb, SUB, SUB),
                                  0), axis=0)
        sel1 = kbest[None, :] == jnp.arange(K)[:, None]
        bmv = jnp.sum(jnp.where(sel1[..., None],
                                mvsK.reshape(K, nb, 2), 0), axis=0)
        bcoded = jnp.sum(jnp.where(sel1, cost_coded.reshape(K, nb), 0),
                         axis=0)
        bskipc = jnp.sum(jnp.where(sel1, cost_skip.reshape(K, nb), 0),
                         axis=0)
        rec_cod = tf.inv_txfm2d_add(bdq, bpred, cc.DCT_DCT, cc.TX_8X8,
                                    bd=bd)
        # chroma 4x4 at the sub winner MV
        cys_s = ys_s // 2
        cxs_s = xs_s // 2
        crows = cys_s[:, None, None] + offc4[None, :, None]
        ccols = cxs_s[:, None, None] + offc4[None, None, :]
        ch = []
        for refp_c, src_c in ((refp_u, src_u), (refp_v, src_v)):
            pred_c = mc.mc_blocks(refp_c, cys_s, cxs_s, bmv, CSUB,
                                  mc.PAD, 1, bd, kind=interp)
            resid_c = src_c[crows, ccols] - pred_c
            cf = tf.fwd_txfm2d(resid_c, cc.DCT_DCT, cc.TX_4X4)
            qcc, dqc = quant.quantize(cf, qpp, cc.TX_4X4)
            dist_c = s2c4 * jnp.sum(
                (cf - dqc.astype(jnp.float32)) ** 2, axis=(1, 2))
            # analytic level curve (the exact model's table set has no
            # 4-wide entry; MD-only approximation)
            af = jnp.abs(qcc).astype(jnp.float32)
            nzm = af > 0
            bits_c = (2.0 * jnp.sum(jnp.log2(1.0 + af), axis=(1, 2))
                      + jnp.sum(nzm, axis=(1, 2)) + 2.0)
            rcc = tf.inv_txfm2d_add(dqc, pred_c, cc.DCT_DCT,
                                    cc.TX_4X4, bd=bd)
            sk_c = jnp.sum(resid_c.astype(jnp.float32) ** 2,
                           axis=(1, 2))
            ch.append((qcc, rcc, pred_c, dist_c + lam * bits_c, sk_c))
        (qu_s, ru_s, pu_s, cu_s, su_s), \
            (qv_s, rv_s, pv_s, cv_s, sv_s) = ch
        coded_tot = bcoded + cu_s + cv_s
        skip_tot = bskipc + su_s + sv_s
        ssk = skip_tot < coded_tot
        s3 = ssk[:, None, None]
        sub_cost = jnp.where(ssk, skip_tot, coded_tot)
        cost_tot = cost_tot + sub_cost
        cost_y_tot = cost_y_tot + jnp.where(
            ssk, bskipc, jnp.minimum(bcoded, bskipc))
        smvs.append(bmv)
        sskips.append(ssk)
        qy_sub = jnp.where(s3, 0, bq)
        rec_sub = jnp.where(s3, bpred, rec_cod)
        sl = (slice(None), slice(dy, dy + SUB), slice(dx, dx + SUB))
        qy_c = qy_c.at[sl].set(qy_sub)
        rec_c = rec_c.at[sl].set(rec_sub)
        cdy, cdx = dy // 2, dx // 2
        slc = (slice(None), slice(cdy, cdy + CSUB),
               slice(cdx, cdx + CSUB))
        qu_c = qu_c.at[slc].set(jnp.where(s3, 0, qu_s))
        ru_c = ru_c.at[slc].set(jnp.where(s3, pu_s, ru_s))
        qv_c = qv_c.at[slc].set(jnp.where(s3, 0, qv_s))
        rv_c = rv_c.at[slc].set(jnp.where(s3, pv_s, rv_s))
    smv = jnp.stack(smvs, axis=1)          # (nb, 4, 2)
    sskip = jnp.stack(sskips, axis=1)      # (nb, 4)
    return (cost_tot + lam * _SPLIT_EXTRA_BITS, cost_y_tot, smv,
            sskip, qy_c, rec_c, qu_c, ru_c, qv_c, rv_c)


def _eval_ref(src_y, src_u, src_v, refp_y, refp_u, refp_v,
              wref_y, wref_u, wref_v, cand, is_warp0,
              ys, xs, qp, lam, rt, bd, interp, nb, K, hp=False,
              h=None, w=None, tx_set=(), split8=False):
    """Pass-A candidate evaluation vs ONE reference (skip-aware).

    cand: (nb, K, 2) clamped MVs (slot 0 = global-motion candidate,
    signaling-only when is_warp0).  hp: refine the per-block winner
    with a 1/8-pel 8-neighbor ring (the iterative-subpel role of
    mcomp.c, one fixed stage).  tx_set: extra luma tx types RD-tested
    on the winner's residual (the inter tx_type search of the
    reference's MD, product_coding_loop.c tx stage; all members must
    share the TX_16X16 default scan).  Returns the per-block winner:
    (cost_tot, cost_y, mv, skip, qy, rec_y, qu, rec_u, qv, rec_v,
    warp_flag, tx_idx)."""
    coef_y, coef_uv, txbb, eob_y, eob_uv = rt
    qpp = quant.QuantParams(*qp)
    offs = jnp.arange(BLK)
    pos16 = jnp.asarray(_scan_pos(cc.TX_16X16))
    s2 = np.float32(tf.coeff_sse_scale(cc.TX_16X16, cc.DCT_DCT))

    def luma_all(mvsK, Kn, warp_first):
        """Luma RD of Kn candidates per block: (Kn, nb, ...) arrays
        (cost, mv, q, dq, pred, skip_k, coded, skipc)."""
        ysK = jnp.tile(ys, Kn)
        xsK = jnp.tile(xs, Kn)
        pred = mc.mc_blocks(refp_y, ysK, xsK, mvsK, BLK, mc.PAD, 0, bd,
                            kind=interp)
        if warp_first:
            rows0 = ys[:, None, None] + offs[None, :, None]
            cols0 = xs[:, None, None] + offs[None, None, :]
            wslice = wref_y[rows0, cols0]
            pred = jnp.concatenate(
                [jnp.where(is_warp0, wslice, pred[:nb]), pred[nb:]],
                axis=0)
        rows = ysK[:, None, None] + offs[None, :, None]
        cols = xsK[:, None, None] + offs[None, None, :]
        resid = src_y[rows, cols] - pred
        coeffs = tf.fwd_txfm2d(resid, cc.DCT_DCT, cc.TX_16X16)
        qc, dq = quant.quantize(coeffs, qpp, cc.TX_16X16)
        dist = s2 * jnp.sum((coeffs - dq.astype(jnp.float32)) ** 2,
                            axis=(1, 2))
        mvb = _mv_bits(mvsK)
        bits = _txb_bits(jnp.abs(qc), coef_y, txbb[0], eob_y,
                         pos16) + mvb
        cost_coded = dist + lam * bits
        dist_skip = jnp.sum(resid.astype(jnp.float32) ** 2,
                            axis=(1, 2))
        cost_skip = dist_skip + lam * (mvb + 2.0)
        skip_k = cost_skip < cost_coded
        cost = jnp.where(skip_k, cost_skip, cost_coded)
        return (cost.reshape(Kn, nb), mvsK.reshape(Kn, nb, 2),
                qc.reshape(Kn, nb, BLK, BLK),
                dq.reshape(Kn, nb, BLK, BLK),
                pred.reshape(Kn, nb, BLK, BLK),
                skip_k.reshape(Kn, nb), cost_coded.reshape(Kn, nb),
                cost_skip.reshape(Kn, nb))

    def select(arrays, Kn):
        (cost, mvk, qk, dqk, pk, sk, ck, sck) = arrays
        kbest = jnp.argmin(cost, axis=0)
        best = [cost[0], mvk[0], qk[0], dqk[0], pk[0], sk[0], ck[0],
                sck[0]]
        for k in range(1, Kn):
            take = kbest == k
            t3 = take[:, None, None]
            best[0] = jnp.where(take, cost[k], best[0])
            best[1] = jnp.where(take[:, None], mvk[k], best[1])
            best[2] = jnp.where(t3, qk[k], best[2])
            best[3] = jnp.where(t3, dqk[k], best[3])
            best[4] = jnp.where(t3, pk[k], best[4])
            best[5] = jnp.where(take, sk[k], best[5])
            best[6] = jnp.where(take, ck[k], best[6])
            best[7] = jnp.where(take, sck[k], best[7])
        return best, kbest

    mvsK = cand.transpose(1, 0, 2).reshape(nb * K, 2)
    best, kbest = select(luma_all(mvsK, K, True), K)
    (bcost, bmv, bq, bdq, bpred, bskip, bcoded, bskipc) = best
    warp_flag = (kbest == 0) & is_warp0
    if hp:
        # 1/8-pel refinement ring around the fullpel/quarter winner
        ring8 = jnp.asarray([(0, 1), (0, -1), (1, 0), (-1, 0),
                             (1, 1), (1, -1), (-1, 1), (-1, -1)],
                            jnp.int32)
        cand2 = _clamp_cands(bmv[:, None] + ring8[None], ys, xs, BLK,
                             h, w, hp=True)
        mvs2 = cand2.transpose(1, 0, 2).reshape(nb * 8, 2)
        best2, _ = select(luma_all(mvs2, 8, False), 8)
        improved = (best2[0] < bcost) & ~warp_flag
        t3 = improved[:, None, None]
        bcost = jnp.where(improved, best2[0], bcost)
        bmv = jnp.where(improved[:, None], best2[1], bmv)
        bq = jnp.where(t3, best2[2], bq)
        bdq = jnp.where(t3, best2[3], bdq)
        bpred = jnp.where(t3, best2[4], bpred)
        bskip = jnp.where(improved, best2[5], bskip)
        bcoded = jnp.where(improved, best2[6], bcoded)
        bskipc = jnp.where(improved, best2[7], bskipc)
    rec_coded = tf.inv_txfm2d_add(bdq, bpred, cc.DCT_DCT, cc.TX_16X16,
                                  bd=bd)
    btx = jnp.zeros((nb,), jnp.int32)
    # chroma at the winner MV (gm candidate 0 under warp uses the
    # warped chroma planes); evaluated BEFORE the luma tx-type search
    # because AV1 derives the inter chroma tx type from the signaled
    # luma type (syntax._chroma_tx_type_inter; spec compute_tx_type
    # plane>0) — a non-DCT luma win re-transforms chroma too
    cys, cxs = ys // 2, xs // 2
    offc = jnp.arange(CBLK)
    crows = cys[:, None, None] + offc[None, :, None]
    ccols = cxs[:, None, None] + offc[None, None, :]
    pos8 = jnp.asarray(_scan_pos(cc.TX_8X8))
    ch = []
    for refp_c, wref_c, src_c in ((refp_u, wref_u, src_u),
                                  (refp_v, wref_v, src_v)):
        pred_c = mc.mc_blocks(refp_c, cys, cxs, bmv, CBLK, mc.PAD, 1,
                              bd, kind=interp)
        pred_c = jnp.where(warp_flag[:, None, None],
                           wref_c[crows, ccols], pred_c)
        resid_c = src_c[crows, ccols] - pred_c
        dskip_c = jnp.sum(resid_c.astype(jnp.float32) ** 2, axis=(1, 2))
        ch.append((pred_c, resid_c, dskip_c))
    (pred_u, resid_u, su), (pred_v, resid_v, sv) = ch

    def chroma_rd(t):
        """Per-plane chroma RD at tx type t: (q, rec, coded_cost)x2."""
        out = []
        s2c = np.float32(tf.coeff_sse_scale(cc.TX_8X8, t))
        for pred_c, resid_c in ((pred_u, resid_u), (pred_v, resid_v)):
            cf = tf.fwd_txfm2d(resid_c, t, cc.TX_8X8)
            qcc, dqc = quant.quantize(cf, qpp, cc.TX_8X8)
            dist_c = s2c * jnp.sum((cf - dqc.astype(jnp.float32)) ** 2,
                                   axis=(1, 2))
            bits_c = _txb_bits(jnp.abs(qcc), coef_uv, txbb[1], eob_uv,
                               pos8)
            rec_c = tf.inv_txfm2d_add(dqc, pred_c, t, cc.TX_8X8, bd=bd)
            out.append((qcc, rec_c, dist_c + lam * bits_c))
        return out

    (qu, rec_u, cu), (qv_, rec_v, cvq) = chroma_rd(cc.DCT_DCT)
    if tx_set:
        # inter luma tx-type search on the winner's residual: each
        # alternative repays its signaling delta, and the comparison is
        # joint luma+chroma since the chroma tx type is inherited
        # (TX_8X8 inter is EXT_TX_SET_ALL16, so every searched type
        # carries over).  A win requires a nonzero luma txb — with
        # eob==0 the type is never signaled and the decoder falls back
        # to DCT_DCT for both planes.
        rows0 = ys[:, None, None] + offs[None, :, None]
        cols0 = xs[:, None, None] + offs[None, None, :]
        resid_w = src_y[rows0, cols0] - bpred
        mvb_w = _mv_bits(bmv)
        for ti, t in enumerate(tx_set, 1):
            cf_t = tf.fwd_txfm2d(resid_w, t, cc.TX_16X16)
            q_t, dq_t = quant.quantize(cf_t, qpp, cc.TX_16X16)
            s2t = np.float32(tf.coeff_sse_scale(cc.TX_16X16, t))
            dist_t = s2t * jnp.sum(
                (cf_t - dq_t.astype(jnp.float32)) ** 2, axis=(1, 2))
            bits_t = _txb_bits(jnp.abs(q_t), coef_y, txbb[0], eob_y,
                               pos16) + mvb_w + _ITX_EXTRA_BITS[ti - 1]
            cost_t = dist_t + lam * bits_t
            (qu_t, rec_u_t, cu_t), (qv_t, rec_v_t, cv_t) = chroma_rd(t)
            nz_t = jnp.any(q_t != 0, axis=(1, 2))
            take_t = nz_t & ((cost_t + cu_t + cv_t)
                             < (bcoded + cu + cvq))
            t3 = take_t[:, None, None]
            bcoded = jnp.where(take_t, cost_t, bcoded)
            bq = jnp.where(t3, q_t, bq)
            rec_t = tf.inv_txfm2d_add(dq_t, bpred, t, cc.TX_16X16,
                                      bd=bd)
            rec_coded = jnp.where(t3, rec_t, rec_coded)
            btx = jnp.where(take_t, ti, btx)
            qu = jnp.where(t3, qu_t, qu)
            rec_u = jnp.where(t3, rec_u_t, rec_u)
            cu = jnp.where(take_t, cu_t, cu)
            qv_ = jnp.where(t3, qv_t, qv_)
            rec_v = jnp.where(t3, rec_v_t, rec_v)
            cvq = jnp.where(take_t, cv_t, cvq)
    # joint skip decision across planes (skip flag covers all planes)
    coded_tot = bcoded + cu + cvq
    skip_tot = bskipc + su + sv
    skip = skip_tot < coded_tot
    s3 = skip[:, None, None]
    qy = jnp.where(s3, 0, bq)
    rec_y = jnp.where(s3, bpred, rec_coded)
    qu = jnp.where(s3, 0, qu)
    rec_u = jnp.where(s3, pred_u, rec_u)
    qv_ = jnp.where(s3, 0, qv_)
    rec_v = jnp.where(s3, pred_v, rec_v)
    cost_tot = jnp.where(skip, skip_tot, coded_tot)
    # luma-only cost for the pass-B intra/inter comparison
    cost_y = jnp.where(skip, bskipc, jnp.minimum(bcoded, bskipc))
    btx = jnp.where(skip, 0, btx)     # skip blocks never signal a type
    isplit = jnp.zeros((nb,), bool)
    smv = jnp.zeros((nb, 4, 2), jnp.int32)
    ssk = jnp.zeros((nb, 4), bool)
    if split8:
        (sp_cost, sp_cost_y, sp_mv, sp_skip, sp_qy, sp_rec, sp_qu,
         sp_ru, sp_qv, sp_rv) = _eval_split8(
            src_y, src_u, src_v, refp_y, refp_u, refp_v, cand,
            ys, xs, qpp, lam, rt, bd, interp, nb, K, hp, h, w)
        take = sp_cost < cost_tot
        t3 = take[:, None, None]
        cost_tot = jnp.where(take, sp_cost, cost_tot)
        cost_y = jnp.where(take, sp_cost_y, cost_y)
        skip = jnp.where(take, jnp.all(sp_skip, axis=1), skip)
        qy = jnp.where(t3, sp_qy, qy)
        rec_y = jnp.where(t3, sp_rec, rec_y)
        qu = jnp.where(t3, sp_qu, qu)
        rec_u = jnp.where(t3, sp_ru, rec_u)
        qv_ = jnp.where(t3, sp_qv, qv_)
        rec_v = jnp.where(t3, sp_rv, rec_v)
        warp_flag = jnp.where(take, False, warp_flag)
        btx = jnp.where(take, 0, btx)
        bmv = jnp.where(take[:, None], sp_mv[:, 0], bmv)
        isplit = take
        smv = sp_mv
        ssk = sp_skip
    return (cost_tot, cost_y, bmv, skip, qy, rec_y, qu, rec_u, qv_,
            rec_v, warp_flag, btx, isplit, smv, ssk)


# extra luma tx types searched on inter winners (beyond DCT_DCT); the
# DTT4 members share the TX_16X16 default scan so one rate table and
# scan map serve all of them (intra_encoder.TX_SEARCH_SET rationale)
ITX_SEARCH_SET = (cc.ADST_ADST, cc.ADST_DCT, cc.DCT_ADST)
_ITX_ENUM = (cc.DCT_DCT,) + ITX_SEARCH_SET   # itx index -> tx_type
# luma TX_16X16 inter uses EXT_TX_SET_DTT9_IDTX_1DDCT; per-member
# signaling delta over DCT_DCT (2.09 bits) under that set's default
# inter_ext_tx CDF, aligned with ITX_SEARCH_SET
_ITX_EXTRA_BITS = (1.62, 1.40, 1.31)   # ADST_ADST, ADST_DCT, DCT_ADST

# 8x8 partition-split signaling overhead vs one 16x16 leaf: the SPLIT
# symbol at the 16 node + 4 NONE symbols at 8 nodes + three extra
# per-sub mode/ref/skip header sets (static estimate from default
# CDFs; refined by BD-rate A/B)
_SPLIT_EXTRA_BITS = 18.0

# masked-compound syntax overhead versus plain average (comp_group_idx
# + compound_type [+ wedge_idx 16-ary + sign | mask_type], minus the
# avg's comp_group_idx=0 symbol) — static estimates from default CDFs
_WEDGE_EXTRA_BITS = 6.0
_DIFFWTD_EXTRA_BITS = 3.0
# OBMC motion-mode flag cost (obmc_cdf leans to SIMPLE, so the OBMC
# branch pays ~1 extra bit over the flag-0 side)
_OBMC_FLAG_BITS = 1.2
# interintra flag + mode (+ wedge flag 0) over the flag-0 side
_II_EXTRA_BITS = 3.0


def _eval_pair(src_y, src_u, src_v, p0, p1, mv0, mv1, ys, xs, qp, lam,
               rt, bd, interp, nb, wedge=True, sm=False):
    """Compound (mv0, mv1) pair evaluation with joint skip:
    COMPOUND_AVERAGE always; optionally a COMPOUND_WEDGE search (mask
    picked per block by prediction-SSE algebra over all 32 sign/index
    options, then one exact masked-blend RD for the winner — the
    pick_wedge / pick_interinter_mask role of the reference MD,
    compound_type.c).  Returns (..., wedge_on (nb,), widx (nb,)) where
    widx = sign * 16 + wedge_index."""
    coef_y, coef_uv, txbb, eob_y, eob_uv = rt
    qpp = quant.QuantParams(*qp)
    offs = jnp.arange(BLK)
    rows = ys[:, None, None] + offs[None, :, None]
    cols = xs[:, None, None] + offs[None, None, :]
    srcb = src_y[rows, cols]
    cys, cxs = ys // 2, xs // 2
    offc = jnp.arange(CBLK)
    crows = cys[:, None, None] + offc[None, :, None]
    ccols = cxs[:, None, None] + offc[None, None, :]
    pos16 = jnp.asarray(_scan_pos(cc.TX_16X16))
    pos8 = jnp.asarray(_scan_pos(cc.TX_8X8))
    s2 = np.float32(tf.coeff_sse_scale(cc.TX_16X16, cc.DCT_DCT))
    s2c = np.float32(tf.coeff_sse_scale(cc.TX_8X8, cc.DCT_DCT))
    mvb = _mv_bits(mv0) + _mv_bits(mv1) + 2.0

    def rd(pred, pred_u, pred_v, extra_bits, sm_ok=False):
        resid = srcb - pred
        coeffs = tf.fwd_txfm2d(resid, cc.DCT_DCT, cc.TX_16X16)
        qc, dq = quant.quantize(coeffs, qpp, cc.TX_16X16)
        dist = s2 * jnp.sum((coeffs - dq.astype(jnp.float32)) ** 2,
                            axis=(1, 2))
        bits = _txb_bits(jnp.abs(qc), coef_y, txbb[0], eob_y, pos16) \
            + mvb + extra_bits
        coded_y = dist + lam * bits
        # sm (skip_mode present, zero/NEAREST pair): an all-skip block
        # codes as ONE skip_mode symbol (~1.5 bits) — no mv/mode/ref
        # signaling (spec 5.11.11; the tile coder converts matching
        # winners, syntax.py _skip_mode_eligible)
        skip_sig = 1.5 if (sm and sm_ok) else (mvb + extra_bits + 2.0)
        skip_y = jnp.sum(resid.astype(jnp.float32) ** 2, axis=(1, 2)) \
            + lam * skip_sig
        rec_coded = tf.inv_txfm2d_add(dq, pred, cc.DCT_DCT,
                                      cc.TX_16X16, bd=bd)
        ch = []
        for pred_c, src_c in ((pred_u, src_u), (pred_v, src_v)):
            resid_c = src_c[crows, ccols] - pred_c
            cf = tf.fwd_txfm2d(resid_c, cc.DCT_DCT, cc.TX_8X8)
            qcc, dqc = quant.quantize(cf, qpp, cc.TX_8X8)
            dist_c = s2c * jnp.sum((cf - dqc.astype(jnp.float32)) ** 2,
                                   axis=(1, 2))
            bits_c = _txb_bits(jnp.abs(qcc), coef_uv, txbb[1], eob_uv,
                               pos8)
            rec_c = tf.inv_txfm2d_add(dqc, pred_c, cc.DCT_DCT,
                                      cc.TX_8X8, bd=bd)
            dskip_c = jnp.sum(resid_c.astype(jnp.float32) ** 2,
                              axis=(1, 2))
            ch.append((qcc, rec_c, pred_c, dist_c + lam * bits_c,
                       dskip_c))
        (qu, rec_u, pu, cu, su), (qv_, rec_v, pv, cvq, sv) = ch
        coded_tot = coded_y + cu + cvq
        skip_tot = skip_y + su + sv
        skip = skip_tot < coded_tot
        s3 = skip[:, None, None]
        return (jnp.where(skip, skip_tot, coded_tot),
                jnp.where(skip, skip_y, jnp.minimum(coded_y, skip_y)),
                skip,
                jnp.where(s3, 0, qc),
                jnp.where(s3, pred, rec_coded),
                jnp.where(s3, 0, qu), jnp.where(s3, pu, rec_u),
                jnp.where(s3, 0, qv_), jnp.where(s3, pv, rec_v))

    pred = mc.mc_blocks_compound(p0[0], p1[0], ys, xs, mv0, mv1, BLK,
                                 mc.PAD, 0, bd, kind=interp)
    pred_u = mc.mc_blocks_compound(p0[1], p1[1], cys, cxs, mv0, mv1,
                                   CBLK, mc.PAD, 1, bd, kind=interp)
    pred_v = mc.mc_blocks_compound(p0[2], p1[2], cys, cxs, mv0, mv1,
                                   CBLK, mc.PAD, 1, bd, kind=interp)
    avg = list(rd(pred, pred_u, pred_v, 0.0, sm_ok=True))
    n = srcb.shape[0]
    # packed masked-compound code: -1 average, 0..31 wedge
    # (sign*16 + index), 64 + mask_type diffwtd
    code = jnp.full((n,), -1, jnp.int32)
    if wedge:
        from svt_av1_tpu.ops import wedge as wedge_ops
        # mask pick by prediction-SSE algebra: with single-ref preds
        # pA/pB and m in [0,1], sse(m) = sum((src-pB) - m*(pA-pB))^2
        # = c0 - 2*(d*e)@m + (e*e)@m^2 — three matmuls over all 32
        # sign/index options at once (MXU)
        pA = mc.mc_blocks(p0[0], ys, xs, mv0, BLK, mc.PAD, 0, bd,
                          kind=interp)
        pB = mc.mc_blocks(p1[0], ys, xs, mv1, BLK, mc.PAD, 0, bd,
                          kind=interp)
        d1 = (srcb - pB).astype(jnp.float32).reshape(n, -1)
        e = (pA - pB).astype(jnp.float32).reshape(n, -1)
        m_all_np = np.concatenate([wedge_ops.masks_16[0],
                                   wedge_ops.masks_16[1]])
        M = jnp.asarray(m_all_np.reshape(32, -1).astype(np.float32)
                        / 64.0)
        sse = (jnp.sum(d1 * d1, axis=1, keepdims=True)
               - 2.0 * (d1 * e) @ M.T + (e * e) @ (M * M).T)
        widx = jnp.argmin(sse, axis=1).astype(jnp.int32)
        m_y = jnp.asarray(m_all_np.astype(np.int32))[widx]
        muv_np = np.concatenate([wedge_ops.masks_16_uv[0],
                                 wedge_ops.masks_16_uv[1]])
        m_uv = jnp.asarray(muv_np.astype(np.int32))[widx]
        pred_w = mc.mc_blocks_compound(p0[0], p1[0], ys, xs, mv0, mv1,
                                       BLK, mc.PAD, 0, bd, kind=interp,
                                       mask=m_y)
        pu_w = mc.mc_blocks_compound(p0[1], p1[1], cys, cxs, mv0, mv1,
                                     CBLK, mc.PAD, 1, bd, kind=interp,
                                     mask=m_uv)
        pv_w = mc.mc_blocks_compound(p0[2], p1[2], cys, cxs, mv0, mv1,
                                     CBLK, mc.PAD, 1, bd, kind=interp,
                                     mask=m_uv)
        wrd = rd(pred_w, pu_w, pv_w, _WEDGE_EXTRA_BITS)
        won = wrd[0] < avg[0]
        code = jnp.where(won, widx, code)
        for fi in range(len(avg)):
            sh = (n,) + (1,) * (avg[fi].ndim - 1)
            avg[fi] = jnp.where(won.reshape(sh), wrd[fi], avg[fi])
        # diffwtd: pick the mask_type by the same SSE algebra on the
        # estimated mask (final-domain |pA-pB|, the d16 round folds to
        # ~1:1), then one exact d16-mask RD
        m_est = jnp.clip(38 + jnp.abs(pA - pB).reshape(n, -1) // 16,
                         0, 64).astype(jnp.float32) / 64.0
        sse_d0 = jnp.sum((d1 - m_est * e) ** 2, axis=1)
        sse_d1 = jnp.sum((d1 - (1.0 - m_est) * e) ** 2, axis=1)
        inv = (sse_d1 < sse_d0).astype(jnp.int32)
        pred_dw, m16 = mc.mc_blocks_compound_diffwtd(
            p0[0], p1[0], ys, xs, mv0, mv1, BLK, mc.PAD, inv, bd,
            kind=interp)
        m_uv_d = (m16[:, ::2, ::2] + m16[:, 1::2, ::2]
                  + m16[:, ::2, 1::2] + m16[:, 1::2, 1::2] + 2) >> 2
        pu_d = mc.mc_blocks_compound(p0[1], p1[1], cys, cxs, mv0, mv1,
                                     CBLK, mc.PAD, 1, bd, kind=interp,
                                     mask=m_uv_d)
        pv_d = mc.mc_blocks_compound(p0[2], p1[2], cys, cxs, mv0, mv1,
                                     CBLK, mc.PAD, 1, bd, kind=interp,
                                     mask=m_uv_d)
        drd = rd(pred_dw, pu_d, pv_d, _DIFFWTD_EXTRA_BITS)
        dwin = drd[0] < avg[0]
        code = jnp.where(dwin, 64 + inv, code)
        for fi in range(len(avg)):
            sh = (n,) + (1,) * (avg[fi].ndim - 1)
            avg[fi] = jnp.where(dwin.reshape(sh), drd[fi], avg[fi])
    return tuple(avg) + (code,)


# --------------------------------------------------------------------------
# P1: whole inter-frame MD program
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _jit_p1(h, w, R, modes, bd=8, ring=True, compound=True,
            rad2=8, rad0=7, hp=False, obmc=False, interintra=False,
            skip_mode=False, tx_search=False, split8=False):
    return jax.jit(_build_p1(h, w, R, modes, bd, ring, compound,
                             rad2, rad0, hp, obmc, interintra,
                             skip_mode, tx_search, split8))


@functools.lru_cache(maxsize=None)
def _build_p1(h, w, R, modes, bd=8, ring=True, compound=True,
              rad2=8, rad0=7, hp=False, obmc=False, interintra=False,
              skip_mode=False, tx_search=False, split8=False):
    """Unjitted P1 (17 inputs -> 28 outputs, see the return at the end
    of ``p1``); pure traced JAX, so the multi-stream path can vmap it
    over a stream axis before jitting."""
    gh, gw = h // BLK, w // BLK
    nb = gh * gw
    h64 = (h + 63) & ~63
    w64 = (w + 63) & ~63
    hme_run = me_pipe.hme_core(h64, w64, rad2, 8, rad0)
    ring_np = np.asarray(_SUBPEL_RING if ring else _SUBPEL_RING[:1])
    n_ring = len(ring_np)
    K = 1 + n_ring + 2  # gm + ring + (above, left) neighbor MVs
    maxb = _natural_maxb(gh, gw)
    waves, bys, bxs, valid, trs, bls, hls = _schedule_arrays(gh, gw, maxb)
    nw = len(waves)
    wi, wj, wby, wbx = _wave_flat_index(waves, 0)
    perm = np.zeros(gh * gw, np.int32)
    perm[wby * gw + wbx] = wi * maxb + wj
    ys_np = (np.arange(nb) // gw * BLK).astype(np.int32)
    xs_np = (np.arange(nb) % gw * BLK).astype(np.int32)

    def p1(src_pack, refs_y, refs_u, refs_v, zbin, rnd, qv_, qshift,
           deq, lam, cy_t, cuv_t, txbb, modeb, uvb, eoby, eobuv):
        src_y = src_pack[:h].astype(jnp.int32)
        src_u = src_pack[h:, :w // 2].astype(jnp.int32)
        src_v = src_pack[h:, w // 2:].astype(jnp.int32)
        qp = (zbin, rnd, qv_, qshift, deq)
        rt = (cy_t, cuv_t, txbb, eoby, eobuv)
        ys = jnp.asarray(ys_np)
        xs = jnp.asarray(xs_np)
        pad64 = ((0, h64 - h), (0, w64 - w))
        src64 = jnp.pad(src_y, pad64, mode="edge")

        # per-ref HME + GM
        hmes, gms = [], []
        for r in range(R):
            ref64 = jnp.pad(refs_y[r].astype(jnp.int32), pad64,
                            mode="edge")
            mvy, mvx, _ = hme_run(src64, ref64)
            mvy = mvy[:gh, :gw]
            mvx = mvx[:gh, :gw]
            hmes.append(jnp.stack([mvy.reshape(nb) * 8,
                                   mvx.reshape(nb) * 8],
                                  axis=-1).astype(jnp.int32))
            gms.append(_gm_fit(mvy, mvx, gh, gw))

        # padded reference planes, shared by pass A / compound / OBMC
        refps_y = [jnp.pad(refs_y[r].astype(jnp.int32), mc.PAD,
                           mode="edge") for r in range(R)]
        refps_u = [jnp.pad(refs_u[r].astype(jnp.int32), mc.PAD // 2,
                           mode="edge") for r in range(R)]
        refps_v = [jnp.pad(refs_v[r].astype(jnp.int32), mc.PAD // 2,
                           mode="edge") for r in range(R)]

        # frame interp-filter pick on ref0 (choose_interp_filter role)
        refp0_y = refps_y[0]
        probe_mv = _clamp_cands((hmes[0] + 2)[:, None], ys, xs, BLK,
                                h, w)[:, 0]
        sses = []
        for kind in (0, 1, 2):
            pp = mc.mc_blocks(refp0_y, ys, xs, probe_mv, BLK, mc.PAD,
                              0, bd, kind=kind)
            offs = jnp.arange(BLK)
            rows = ys[:, None, None] + offs[None, :, None]
            cols = xs[:, None, None] + offs[None, None, :]
            d = (src_y[rows, cols] - pp).astype(jnp.float32)
            sses.append(jnp.sum(d * d))
        interp = jnp.argmin(jnp.stack(sses)).astype(jnp.int32)

        # pass A per ref, merged on device
        best = None
        iref_idx = jnp.zeros((nb,), jnp.int32)
        per_ref_meta = []
        for r in range(R):
            mat, trans, kind = gms[r]
            per_ref_meta.append((mat, trans, kind))
            is_warp0 = kind == 2
            shear = _shear_device(mat)[:4]
            wy = _warp_plane_traced(refs_y[r].astype(jnp.int32), mat,
                                    shear, w, h, bd, 0)
            wu = _warp_plane_traced(refs_u[r].astype(jnp.int32), mat,
                                    shear, w // 2, h // 2, bd, 1)
            wv = _warp_plane_traced(refs_v[r].astype(jnp.int32), mat,
                                    shear, w // 2, h // 2, bd, 1)
            gm_mv = jnp.where(is_warp0,
                              _gm_block_mvs(mat, gh, gw, hp),
                              jnp.where(kind == 1,
                                        jnp.broadcast_to(trans, (nb, 2)),
                                        jnp.zeros((nb, 2), jnp.int32)))
            hme = hmes[r]
            above = jnp.roll(hme.reshape(gh, gw, 2), 1, axis=0)
            above = above.at[0].set(0).reshape(nb, 2)
            left = jnp.roll(hme.reshape(gh, gw, 2), 1, axis=1)
            left = left.at[:, 0].set(0).reshape(nb, 2)
            cand = jnp.concatenate(
                [gm_mv[:, None],
                 hme[:, None] + jnp.asarray(ring_np)[None],
                 above[:, None], left[:, None]], axis=1)
            cand = _clamp_cands(cand, ys, xs, BLK, h, w)
            # warp candidate 0 signals the exact projection; nudge ring
            # candidates that collide with it (syntax would map them to
            # GLOBALMV and the decoder would warp)
            cand = cand.at[:, 0].set(
                jnp.where(is_warp0, gm_mv, cand[:, 0]))
            coll = jnp.all(cand[:, 1:] == cand[:, :1], axis=2) \
                & is_warp0
            cand = cand.at[:, 1:, 1].add(coll.astype(jnp.int32) * 2)
            refp_y = refps_y[r]
            refp_u = refps_u[r]
            refp_v = refps_v[r]
            out = _eval_ref(src_y, src_u, src_v, refp_y, refp_u, refp_v,
                            wy, wu, wv, cand, is_warp0, ys, xs,
                            qp, lam, rt, bd, interp, nb, K, hp=hp,
                            h=h, w=w,
                            tx_set=ITX_SEARCH_SET if tx_search else (),
                            split8=split8)
            if best is None:
                best = list(out)
            else:
                take = out[0] < best[0]
                iref_idx = jnp.where(take, r, iref_idx)
                for fi in range(len(best)):
                    t = take.reshape((nb,) + (1,) * (best[fi].ndim - 1))
                    best[fi] = jnp.where(t, out[fi], best[fi])
        (cost_tot, cost_y, imv, iskip, iqy, irec_y, iqu, irec_u,
         iqv, irec_v, iwarp, itx, isplit, ismv, issk) = best

        icomp = jnp.zeros((nb,), bool)
        imv2 = jnp.zeros((nb, 2), jnp.int32)
        iwedge = jnp.full((nb,), -1, jnp.int32)
        if compound and R >= 2:
            # compound pair = (first, last) ref: run_inter_frame sorts
            # enums so LAST is index 0 and ALTREF (the bwd ref) is
            # index R-1; any GOLDEN-role extra refs sit between and
            # stay single-ref only
            pads0 = (refps_y[0], refps_u[0], refps_v[0])
            pads1 = (refps_y[R - 1], refps_u[R - 1], refps_v[R - 1])
            mv0 = _clamp_cands(hmes[0][:, None], ys, xs, BLK, h, w)[:, 0]
            mv1 = _clamp_cands(hmes[R - 1][:, None], ys, xs, BLK,
                               h, w)[:, 0]
            zero = jnp.zeros_like(mv0)
            merged = None
            for pi, (m0, m1) in enumerate(((mv0, mv1), (zero, zero))):
                sm_pair = skip_mode and pi == 1
                outc = list(_eval_pair(src_y, src_u, src_v, pads0,
                                       pads1, m0, m1, ys, xs, qp, lam,
                                       rt, bd, interp, nb,
                                       sm=sm_pair)) + [m0, m1]
                if merged is None:
                    merged = outc
                else:
                    tk = outc[0] < merged[0]
                    for fi in range(len(merged)):
                        sh_ = (nb,) + (1,) * (merged[fi].ndim - 1)
                        merged[fi] = jnp.where(tk.reshape(sh_), outc[fi],
                                               merged[fi])
            (ccost, ccost_y, cskip, cqy, crec_y, cqu, crec_u, cqv,
             crec_v, ccode, m0, m1) = merged
            take = ccost < cost_tot
            icomp = take
            iwedge = jnp.where(take, ccode, -1)
            t3 = take[:, None, None]
            cost_y = jnp.where(take, ccost_y, cost_y)
            imv = jnp.where(take[:, None], m0, imv)
            imv2 = jnp.where(take[:, None], m1, imv2)
            iskip = jnp.where(take, cskip, iskip)
            iwarp = jnp.where(take, False, iwarp)
            itx = jnp.where(take, 0, itx)
            isplit = jnp.where(take, False, isplit)
            iref_idx = jnp.where(take, 0, iref_idx)
            iqy = jnp.where(t3, cqy, iqy)
            irec_y = jnp.where(t3, crec_y, irec_y)
            iqu = jnp.where(t3, cqu, iqu)
            irec_u = jnp.where(t3, crec_u, irec_u)
            iqv = jnp.where(t3, cqv, iqv)
            irec_v = jnp.where(t3, crec_v, irec_v)

        # ---- pass B: wavefront with the inter override ----
        qp_t = qp
        modes_acc = jnp.zeros((nw, maxb), jnp.int32)
        uv_acc0 = jnp.zeros((nw, maxb), jnp.int32)
        choose_acc = jnp.zeros((nw, maxb), bool)
        qy_acc = jnp.zeros((nw, maxb, BLK, BLK), jnp.int16)
        qu_acc = jnp.zeros((nw, maxb, CBLK, CBLK), jnp.int16)
        qv_acc = jnp.zeros((nw, maxb, CBLK, CBLK), jnp.int16)
        # OBMC / inter-intra accumulators (flags + alt skip + q arrays)
        ob_acc = jnp.zeros((nw, maxb), bool)
        ii_acc = jnp.full((nw, maxb), -1, jnp.int32)
        obs_acc = jnp.zeros((nw, maxb), bool)
        txo_acc = jnp.zeros((nw, maxb), jnp.int32)
        qyo_acc = jnp.zeros((nw, maxb, BLK, BLK), jnp.int16)
        quo_acc = jnp.zeros((nw, maxb, CBLK, CBLK), jnp.int16)
        qvo_acc = jnp.zeros((nw, maxb, CBLK, CBLK), jnp.int16)
        perm_j = jnp.asarray(perm)
        pos16 = jnp.asarray(_scan_pos(cc.TX_16X16))
        pos8 = jnp.asarray(_scan_pos(cc.TX_8X8))
        s2y = np.float32(tf.coeff_sse_scale(cc.TX_16X16, cc.DCT_DCT))
        s2c = np.float32(tf.coeff_sse_scale(cc.TX_8X8, cc.DCT_DCT))
        qpp_b = quant.QuantParams(*qp)

        def _sel_ref_mc(planes, ys_, xs_, mvs_, ridx, blk_, ss):
            """MC of each candidate ref, winner selected by ridx."""
            out = mc.mc_blocks(planes[0], ys_, xs_, mvs_, blk_, mc.PAD,
                               ss, bd, kind=interp)
            for r in range(1, R):
                pr = mc.mc_blocks(planes[r], ys_, xs_, mvs_, blk_,
                                  mc.PAD, ss, bd, kind=interp)
                out = jnp.where((ridx == r)[:, None, None], pr, out)
            return out

        alt_tx_set = ITX_SEARCH_SET if tx_search else ()

        def _rd_joint(pred, pred_u, pred_v, mvb, ys_, xs_):
            """Joint luma+chroma RD of an alternative inter prediction
            (mirrors the _eval_ref cost structure, INCLUDING the luma
            tx-type search when the preset enables it — motion-mode
            alternatives must pass the same tx funnel as the pass-A
            winner or they are systematically out-RD'd).  Returns
            (tot, skip, cost_y, rec_y, qy, rec_u, qu, rec_v, qv, txi)."""
            offs_ = jnp.arange(BLK)
            rws = ys_[:, None, None] + offs_[None, :, None]
            cls_ = xs_[:, None, None] + offs_[None, None, :]
            resid = src_y[rws, cls_] - pred
            offc_ = jnp.arange(CBLK)
            crws = (ys_ // 2)[:, None, None] + offc_[None, :, None]
            ccls = (xs_ // 2)[:, None, None] + offc_[None, None, :]
            resid_u = src_u[crws, ccls] - pred_u
            resid_v = src_v[crws, ccls] - pred_v

            def chroma_rd(t):
                out = []
                s2ct = np.float32(tf.coeff_sse_scale(cc.TX_8X8, t))
                for pc, rc in ((pred_u, resid_u), (pred_v, resid_v)):
                    cf = tf.fwd_txfm2d(rc, t, cc.TX_8X8)
                    qcc, dqc = quant.quantize(cf, qpp_b, cc.TX_8X8)
                    dc_ = s2ct * jnp.sum(
                        (cf - dqc.astype(jnp.float32)) ** 2,
                        axis=(1, 2))
                    bc = _txb_bits(jnp.abs(qcc), cuv_t, txbb[1], eobuv,
                                   pos8)
                    rcc = tf.inv_txfm2d_add(dqc, pc, t, cc.TX_8X8,
                                            bd=bd)
                    out.append((qcc, rcc, dc_ + lam * bc))
                return out

            coeffs = tf.fwd_txfm2d(resid, cc.DCT_DCT, cc.TX_16X16)
            qc, dq = quant.quantize(coeffs, qpp_b, cc.TX_16X16)
            dist = s2y * jnp.sum((coeffs - dq.astype(jnp.float32)) ** 2,
                                 axis=(1, 2))
            bits = _txb_bits(jnp.abs(qc), cy_t, txbb[0], eoby,
                             pos16) + mvb
            coded_y = dist + lam * bits
            skip_y = jnp.sum(resid.astype(jnp.float32) ** 2,
                             axis=(1, 2)) + lam * (mvb + 2.0)
            rec_cod = tf.inv_txfm2d_add(dq, pred, cc.DCT_DCT,
                                        cc.TX_16X16, bd=bd)
            (qu_o, rec_u_o, cu_o), (qv_o, rec_v_o, cv_o) = \
                chroma_rd(cc.DCT_DCT)
            su_o = jnp.sum(resid_u.astype(jnp.float32) ** 2,
                           axis=(1, 2))
            sv_o = jnp.sum(resid_v.astype(jnp.float32) ** 2,
                           axis=(1, 2))
            txi = jnp.zeros(coded_y.shape, jnp.int32)
            for ti, t in enumerate(alt_tx_set, 1):
                cf_t = tf.fwd_txfm2d(resid, t, cc.TX_16X16)
                q_t, dq_t = quant.quantize(cf_t, qpp_b, cc.TX_16X16)
                s2t = np.float32(tf.coeff_sse_scale(cc.TX_16X16, t))
                dist_t = s2t * jnp.sum(
                    (cf_t - dq_t.astype(jnp.float32)) ** 2, axis=(1, 2))
                bits_t = _txb_bits(jnp.abs(q_t), cy_t, txbb[0], eoby,
                                   pos16) + mvb + _ITX_EXTRA_BITS[ti - 1]
                cost_t = dist_t + lam * bits_t
                (qu_t, ru_t, cu_t), (qv_t, rv_t, cv_t) = chroma_rd(t)
                nz_t = jnp.any(q_t != 0, axis=(1, 2))
                take = nz_t & ((cost_t + cu_t + cv_t)
                               < (coded_y + cu_o + cv_o))
                t3 = take[:, None, None]
                coded_y = jnp.where(take, cost_t, coded_y)
                qc = jnp.where(t3, q_t, qc)
                rec_cod = jnp.where(
                    t3, tf.inv_txfm2d_add(dq_t, pred, t, cc.TX_16X16,
                                          bd=bd), rec_cod)
                txi = jnp.where(take, ti, txi)
                qu_o = jnp.where(t3, qu_t, qu_o)
                rec_u_o = jnp.where(t3, ru_t, rec_u_o)
                cu_o = jnp.where(take, cu_t, cu_o)
                qv_o = jnp.where(t3, qv_t, qv_o)
                rec_v_o = jnp.where(t3, rv_t, rec_v_o)
                cv_o = jnp.where(take, cv_t, cv_o)
            coded_tot = coded_y + cu_o + cv_o
            skip_tot = skip_y + su_o + sv_o
            oskip = skip_tot < coded_tot
            s3 = oskip[:, None, None]
            return (jnp.where(oskip, skip_tot, coded_tot), oskip,
                    jnp.where(oskip, skip_y,
                              jnp.minimum(coded_y, skip_y)),
                    jnp.where(s3, pred, rec_cod),
                    jnp.where(s3, 0, qc),
                    jnp.where(s3, pred_u, rec_u_o),
                    jnp.where(s3, 0, qu_o),
                    jnp.where(s3, pred_v, rec_v_o),
                    jnp.where(s3, 0, qv_o),
                    jnp.where(oskip, 0, txi))

        def _base_preds(bid, ys_, xs_):
            mv_self = imv[bid]
            ridx = iref_idx[bid].astype(jnp.int32)
            return (_sel_ref_mc(refps_y, ys_, xs_, mv_self, ridx,
                                BLK, 0),
                    _sel_ref_mc(refps_u, ys_ // 2, xs_ // 2, mv_self,
                                ridx, CBLK, 1),
                    _sel_ref_mc(refps_v, ys_ // 2, xs_ // 2, mv_self,
                                ridx, CBLK, 1))

        def _obmc_alt(ca_flat, by, bx, va, base, ys_, xs_):
            """OBMC_CAUSAL alternative: blend the base prediction with
            ABOVE then LEFT neighbor-MV predictions
            (enc_inter_prediction.c:1428-1523 order and normative
            masks) and full joint RD — the motion-mode MD of the
            reference's inter depth (SIMPLE vs OBMC)."""
            from svt_av1_tpu.ops import obmc as obmc_ops
            bid = by * gw + bx
            abid = jnp.maximum(bid - gw, 0)
            lbid = jnp.maximum(bid - 1, 0)
            # split neighbors are excluded as OBMC sources: the spec
            # blend would use their per-8x8 sub MVs, not one 16-wide MV
            a_int = (by > 0) & ca_flat[perm_j[abid]] & ~isplit[abid]
            l_int = (bx > 0) & ca_flat[perm_j[lbid]] & ~isplit[lbid]
            el = (va & ~icomp[bid] & ~iwarp[bid] & ~isplit[bid]
                  & (a_int | l_int))
            pred, pred_u, pred_v = base
            my = jnp.asarray(obmc_ops.MASK_Y16)
            mc8 = jnp.asarray(obmc_ops.MASK_C8)
            for nbid, on, blend in ((abid, a_int, "above"),
                                    (lbid, l_int, "left")):
                nmv = imv[nbid]
                nridx = iref_idx[nbid].astype(jnp.int32)
                pa = _sel_ref_mc(refps_y, ys_, xs_, nmv, nridx, BLK, 0)
                pau = _sel_ref_mc(refps_u, ys_ // 2, xs_ // 2, nmv,
                                  nridx, CBLK, 1)
                pav = _sel_ref_mc(refps_v, ys_ // 2, xs_ // 2, nmv,
                                  nridx, CBLK, 1)
                fn = (obmc_ops.blend_above if blend == "above"
                      else obmc_ops.blend_left)
                o3 = on[:, None, None]
                pred = jnp.where(o3, fn(pred, pa, my), pred)
                pred_u = jnp.where(o3, fn(pred_u, pau, mc8), pred_u)
                pred_v = jnp.where(o3, fn(pred_v, pav, mc8), pred_v)
            mvb = _mv_bits(imv[bid]) + _OBMC_FLAG_BITS
            out = _rd_joint(pred, pred_u, pred_v, mvb, ys_, xs_)
            ow = el & (out[0] < cost_tot[bid])
            return (ow,) + out

        def _ii_alt(ry, ru, rv, by, bx, va, ha, hl, base, ys_, xs_):
            """Inter-intra alternative: 4 smooth-mask blends of the
            base inter prediction with DC/V/H/SMOOTH intra predictions
            from the causal wave recon; SSE picks the mode, one exact
            joint RD prices the winner (inter_intra MD role of the
            reference's compound search)."""
            from svt_av1_tpu.ops import interintra as ii_ops
            from svt_av1_tpu.ops import intra as intra_ops
            from svt_av1_tpu.pipeline.intra_encoder import \
                _gather_neighbors
            bid = by * gw + bx
            el = va & ~icomp[bid] & ~iwarp[bid] & ~isplit[bid]
            offs_ = jnp.arange(BLK)
            rws = ys_[:, None, None] + offs_[None, :, None]
            cls_ = xs_[:, None, None] + offs_[None, None, :]
            srcb = src_y[rws, cls_]
            pred, pred_u, pred_v = base
            ab, lf, crn = _gather_neighbors(ry, ys_, xs_, BLK, ha, hl,
                                            bd=bd)
            ii_modes = (cc.DC_PRED, cc.V_PRED, cc.H_PRED,
                        cc.SMOOTH_PRED)
            blends = []
            sses = []
            for mi_, im in enumerate(ii_modes):
                ip = intra_ops.predict(im, ab, lf, crn, BLK, BLK,
                                       have_above=ha, have_left=hl,
                                       bd=bd)
                bl = ii_ops.blend(ip, pred,
                                  jnp.asarray(ii_ops.MASKS_Y16[mi_]))
                blends.append(bl)
                d_ = (srcb - bl).astype(jnp.float32)
                sses.append(jnp.sum(d_ * d_, axis=(1, 2)))
            sse = jnp.stack(sses)
            best = jnp.argmin(sse, axis=0).astype(jnp.int32)
            pick = blends[0]
            for mi_ in range(1, 4):
                pick = jnp.where((best == mi_)[:, None, None],
                                 blends[mi_], pick)
            # chroma: winner mode at 8x8 with the chroma mask
            abu, lfu, crnu = _gather_neighbors(ru, ys_ // 2, xs_ // 2,
                                               CBLK, ha, hl, bd=bd)
            abv, lfv, crnv = _gather_neighbors(rv, ys_ // 2, xs_ // 2,
                                               CBLK, ha, hl, bd=bd)
            pu = pred_u
            pv = pred_v
            for mi_, im in enumerate(ii_modes):
                mu8 = jnp.asarray(ii_ops.MASKS_UV8[mi_])
                ipu = intra_ops.predict(im, abu, lfu, crnu, CBLK, CBLK,
                                        have_above=ha, have_left=hl,
                                        bd=bd)
                ipv = intra_ops.predict(im, abv, lfv, crnv, CBLK, CBLK,
                                        have_above=ha, have_left=hl,
                                        bd=bd)
                t3 = (best == mi_)[:, None, None]
                pu = jnp.where(t3, ii_ops.blend(ipu, pred_u, mu8), pu)
                pv = jnp.where(t3, ii_ops.blend(ipv, pred_v, mu8), pv)
            mvb = _mv_bits(imv[bid]) + _II_EXTRA_BITS
            out = _rd_joint(pick, pu, pv, mvb, ys_, xs_)
            return (el, best) + out

        def body(i, carry):
            (ry, ru, rv, ma, uma, ca, qya, qua, qva, oa, iia, osa, txo,
             qyo, quo, qvo) = carry
            by = jnp.asarray(bys)[i]
            bx = jnp.asarray(bxs)[i]
            va = jnp.asarray(valid)[i]
            ha = (by > 0) & va
            hl = (bx > 0) & va
            bid = by * gw + bx
            icost = cost_y[bid]
            irec = irec_y[bid]
            irec_u_b = irec_u[bid]
            irec_v_b = irec_v[bid]
            ow = jnp.zeros_like(va)
            osk = jnp.zeros_like(va)
            atxi = jnp.zeros(va.shape, jnp.int32)
            iimode = jnp.full(va.shape, -1, jnp.int32)
            if obmc or interintra:
                ys_ = by * BLK
                xs_ = bx * BLK
                base = _base_preds(bid, ys_, xs_)
                best_tot = cost_tot[bid]
                alt_q = None
                if obmc:
                    (ow, otot, osk, ocost_y, orec_y, oqy, orec_u, oqu,
                     orec_v, oqv, otxi) = _obmc_alt(ca.reshape(-1), by,
                                                    bx, va, base, ys_,
                                                    xs_)
                    best_tot = jnp.where(ow, otot, best_tot)
                    alt_q = (ow, osk, ocost_y, orec_y, oqy, orec_u,
                             oqu, orec_v, oqv, otxi)
                if interintra:
                    (el_ii, iibest, itot, iskp, iicost_y, iirec_y,
                     iiqy, iirec_u, iiqu, iirec_v, iiqv, iitxi) = \
                        _ii_alt(ry, ru, rv, by, bx, va, ha, hl, base,
                                ys_, xs_)
                    iw = el_ii & (itot < best_tot)
                    iimode = jnp.where(iw, iibest, -1)
                    if alt_q is None:
                        alt_q = (iw, iskp, iicost_y, iirec_y, iiqy,
                                 iirec_u, iiqu, iirec_v, iiqv, iitxi)
                    else:
                        merged_alt = []
                        for a, b_ in zip(alt_q,
                                         (iw, iskp, iicost_y, iirec_y,
                                          iiqy, iirec_u, iiqu, iirec_v,
                                          iiqv, iitxi)):
                            shp = iw.reshape(
                                iw.shape + (1,) * (a.ndim - 1))
                            merged_alt.append(
                                jnp.where(shp, b_, a)
                                if a.ndim > 1 else
                                jnp.where(iw, b_, a))
                        merged_alt[0] = alt_q[0] | iw
                        alt_q = tuple(merged_alt)
                        ow = ow & ~iw
                (aw, ask, acost_y, arec_y, aqy, arec_u, aqu, arec_v,
                 aqv, atxi) = alt_q
                a3 = aw[:, None, None]
                icost = jnp.where(aw, acost_y, icost)
                irec = jnp.where(a3, arec_y, irec)
                irec_u_b = jnp.where(a3, arec_u, irec_u_b)
                irec_v_b = jnp.where(a3, arec_v, irec_v_b)
                osk = jnp.where(aw, ask, osk)
                qyo = qyo.at[i].set(jnp.where(a3, aqy, 0)
                                    .astype(jnp.int16))
                quo = quo.at[i].set(jnp.where(a3, aqu, 0)
                                    .astype(jnp.int16))
                qvo = qvo.at[i].set(jnp.where(a3, aqv, 0)
                                    .astype(jnp.int16))
            m, q, ry, choose = _rd_step(
                ry, src_y, by * BLK, bx * BLK, va, ha, hl, qp_t, lam,
                BLK, cc.TX_16X16, modes, 0,
                tr_avail=jnp.asarray(trs)[i] & va,
                bl_avail=jnp.asarray(bls)[i] & va, bd=bd,
                inter=(icost, irec),
                rates=(cy_t, txbb, modeb, eoby))
            choose = choose & va
            um, qu_, qv2, ru, rv = _rd_step_chroma(
                ru, rv, src_u, src_v, by * CBLK, bx * CBLK, va, ha, hl,
                qp_t, lam, bd=bd,
                inter=(choose, irec_u_b, irec_v_b),
                rates=(cuv_t, txbb, uvb, eobuv))
            return (ry, ru, rv, ma.at[i].set(m), uma.at[i].set(um),
                    ca.at[i].set(choose),
                    qya.at[i].set(q.astype(jnp.int16)),
                    qua.at[i].set(qu_.astype(jnp.int16)),
                    qva.at[i].set(qv2.astype(jnp.int16)),
                    oa.at[i].set(ow & choose),
                    iia.at[i].set(jnp.where(choose, iimode, -1)),
                    osa.at[i].set(osk), txo.at[i].set(atxi),
                    qyo, quo, qvo)

        init = (jnp.zeros((h, w), jnp.int32),
                jnp.zeros((h // 2, w // 2), jnp.int32),
                jnp.zeros((h // 2, w // 2), jnp.int32),
                modes_acc, uv_acc0, choose_acc, qy_acc, qu_acc, qv_acc,
                ob_acc, ii_acc, obs_acc, txo_acc, qyo_acc, quo_acc,
                qvo_acc)
        (ry, ru, rv, ma, uma, ca, qya, qua, qva, oa, iia, osa, txo,
         qyo, quo, qvo) = jax.lax.fori_loop(0, nw, body, init)

        # dense raster re-layout + device-side decision merge
        pj = jnp.asarray(perm)
        ymode = ma.reshape(-1)[pj]
        umode = uma.reshape(-1)[pj]
        choose = ca.reshape(-1)[pj]
        qyB = qya.reshape(nw * maxb, BLK * BLK)[pj]
        quB = qua.reshape(nw * maxb, CBLK * CBLK)[pj]
        qvB = qva.reshape(nw * maxb, CBLK * CBLK)[pj]
        iobmc = oa.reshape(-1)[pj] & choose
        iimodes = jnp.where(choose, iia.reshape(-1)[pj], -1)
        if obmc or interintra:
            alt = iobmc | (iimodes >= 0)
            o2 = alt[:, None]
            iqy = jnp.where(
                o2, qyo.reshape(nw * maxb, BLK * BLK)[pj]
                .astype(jnp.int32), iqy.reshape(nb, -1))
            iqu = jnp.where(
                o2, quo.reshape(nw * maxb, CBLK * CBLK)[pj]
                .astype(jnp.int32), iqu.reshape(nb, -1))
            iqv = jnp.where(
                o2, qvo.reshape(nw * maxb, CBLK * CBLK)[pj]
                .astype(jnp.int32), iqv.reshape(nb, -1))
            iskip = jnp.where(alt, osa.reshape(-1)[pj], iskip)
            itx = jnp.where(alt, txo.reshape(-1)[pj], itx)
        else:
            iqy = iqy.reshape(nb, -1)
            iqu = iqu.reshape(nb, -1)
            iqv = iqv.reshape(nb, -1)
        c3 = choose[:, None]
        qy_f = jnp.where(c3, iqy.astype(jnp.int16), qyB)
        qu_f = jnp.where(c3, iqu.astype(jnp.int16), quB)
        qv_f = jnp.where(c3, iqv.astype(jnp.int16), qvB)
        gm_mats = jnp.stack([m[0] for m in per_ref_meta])
        gm_trans = jnp.stack([m[1] for m in per_ref_meta])
        gm_kinds = jnp.stack([m[2] for m in per_ref_meta])

        # ---- 32x32 skip-merge (partition-level signaling merge) ----
        # 2x2 groups of inter-skip winners sharing (ref, mv) — or the
        # same compound (ref pair, mv pair) — no warp: recoded as ONE
        # BLOCK_32X32 skip leaf by the packetizer.  The merged recon is
        # bit-identical (an MC of a 32 block with one MV equals its
        # four 16 tiles; compound averages positionally independently),
        # so this is a pure rate win and pass-B intra neighbors are
        # unaffected.  Behavioral reference: the PART_N vs split
        # decision of product_coding_loop.c's MD funnel, restricted to
        # the provably-lossless case.
        gh2, gw2 = gh // 2, gw // 2
        # wedge blocks keep their 16x16 leaf (no 32x32 wedge masks);
        # OBMC blocks keep theirs (the merged 32 would re-derive its
        # own overlap blend)
        eligible = (choose & iskip & ~isplit & ~(iwarp & choose)
                    & (iwedge < 0) & ~iobmc & (iimodes < 0))

        def grp(a):
            a2 = a.reshape(gh, gw, -1)[:gh2 * 2, :gw2 * 2]
            return a2.reshape(gh2, 2, gw2, 2, a2.shape[-1])

        ok = grp(eligible[:, None].astype(jnp.int32))[..., 0] \
            .all(axis=(1, 3))
        refg = grp(iref_idx[:, None].astype(jnp.int32))[..., 0]
        ok &= (refg == refg[:, :1, :, :1]).all(axis=(1, 3))
        compg = grp(icomp[:, None].astype(jnp.int32))[..., 0]
        ok &= (compg == compg[:, :1, :, :1]).all(axis=(1, 3))
        ys32 = (jnp.arange(gh2 * gw2) // gw2 * 32).astype(jnp.int32)
        xs32 = (jnp.arange(gh2 * gw2) % gw2 * 32).astype(jnp.int32)
        for mva in (imv, imv2):
            mvg = grp(mva)
            ok &= (mvg == mvg[:, :1, :, :1]).all(axis=(1, 3, 4))
            mv32 = mvg[:, 0, :, 0].reshape(-1, 2)
            cl32 = _clamp_cands(mv32[:, None], ys32, xs32, 2 * BLK, h,
                                w, hp=hp)[:, 0]
            ok &= (cl32 == mv32).all(axis=-1).reshape(gh2, gw2)
        merge32 = ok.reshape(-1)

        # ---- 64x64 skip-merge: 2x2 groups of merged 32s sharing the
        # same (ref, mv[, mv2]) fold once more (same losslessness
        # argument at the 64 extent; the reference's MD reaches these
        # via its 64/128 partition search) ----
        gh4, gw4 = gh2 // 2, gw2 // 2
        if gh4 and gw4:
            def grp64(a):
                a2 = a.reshape(gh2, gw2, -1)[:gh4 * 2, :gw4 * 2]
                return a2.reshape(gh4, 2, gw4, 2, a2.shape[-1])

            ok64 = grp64(ok.reshape(gh2, gw2)[..., None]
                         .astype(jnp.int32))[..., 0].all(axis=(1, 3))
            # leaf-level agreement across the whole 64 via the 16 grid
            def grp16_64(a):
                a2 = a.reshape(gh, gw, -1)[:gh4 * 4, :gw4 * 4]
                return a2.reshape(gh4, 4, gw4, 4, a2.shape[-1])

            refg64 = grp16_64(iref_idx[:, None].astype(jnp.int32))[..., 0]
            ok64 &= (refg64 == refg64[:, :1, :, :1]).all(axis=(1, 3))
            compg64 = grp16_64(icomp[:, None].astype(jnp.int32))[..., 0]
            ok64 &= (compg64 == compg64[:, :1, :, :1]).all(axis=(1, 3))
            ys64 = (jnp.arange(gh4 * gw4) // gw4 * 64).astype(jnp.int32)
            xs64 = (jnp.arange(gh4 * gw4) % gw4 * 64).astype(jnp.int32)
            for mva in (imv, imv2):
                mvg = grp16_64(mva)
                ok64 &= (mvg == mvg[:, :1, :, :1]).all(axis=(1, 3, 4))
                mv64 = mvg[:, 0, :, 0].reshape(-1, 2)
                cl64 = _clamp_cands(mv64[:, None], ys64, xs64, 4 * BLK,
                                    h, w, hp=hp)[:, 0]
                ok64 &= (cl64 == mv64).all(axis=-1).reshape(gh4, gw4)
            merge64 = ok64.reshape(-1)
        else:
            merge64 = jnp.zeros((max(gh4, 1) * max(gw4, 1),), bool)

        # ---- rect (HORZ/VERT) skip merges at the 32 extent: the two
        # halves each agree internally but the full 2x2 does not, so
        # the parent codes PARTITION_HORZ/VERT with two skip 32x16 /
        # 16x32 leaves (d1 rect compare role,
        # product_coding_loop.c:10350-10420, restricted to skip
        # leaves).  Derived ON DEVICE because the DLF mask must see the
        # merged extents: the interior edge of a merged pair is
        # neither a tx nor a prediction edge (spec 7.14) ----
        el4 = grp(eligible[:, None].astype(jnp.int32))[..., 0]
        elig_all = el4.all(axis=(1, 3))
        okH = elig_all & ~ok
        okV = elig_all & ~ok
        for f in (iref_idx[:, None].astype(jnp.int32),
                  icomp[:, None].astype(jnp.int32), imv, imv2):
            fg = grp(f)
            okH &= (fg == fg[:, :, :, :1]).all(axis=(3, 4)).all(axis=1)
            okV &= (fg == fg[:, :1]).all(axis=(1, 4)).all(axis=-1)
        for mva in (imv, imv2):
            g = grp(mva)
            top = g[:, 0, :, 0].reshape(-1, 2)
            bot = g[:, 1, :, 0].reshape(-1, 2)
            clt = _clamp_cands(top[:, None], ys32, xs32, 2 * BLK, h, w,
                               hp=hp, blk_h=BLK)[:, 0]
            clb = _clamp_cands(bot[:, None], ys32 + BLK, xs32, 2 * BLK,
                               h, w, hp=hp, blk_h=BLK)[:, 0]
            okH &= ((clt == top).all(-1)
                    & (clb == bot).all(-1)).reshape(gh2, gw2)
            lef = g[:, 0, :, 0].reshape(-1, 2)
            rig = g[:, 0, :, 1].reshape(-1, 2)
            cll = _clamp_cands(lef[:, None], ys32, xs32, BLK, h, w,
                               hp=hp, blk_h=2 * BLK)[:, 0]
            clr = _clamp_cands(rig[:, None], ys32, xs32 + BLK, BLK, h,
                               w, hp=hp, blk_h=2 * BLK)[:, 0]
            okV &= ((cll == lef).all(-1)
                    & (clr == rig).all(-1)).reshape(gh2, gw2)
        if gh4 and gw4:
            cov64 = jnp.zeros((gh2, gw2), bool)
            cov64 = cov64.at[:gh4 * 2, :gw4 * 2].set(
                jnp.repeat(jnp.repeat(ok64, 2, 0), 2, 1))
            okH &= ~cov64
            okV &= ~cov64
        okV &= ~okH
        mergeH = okH.reshape(-1)
        mergeV = okV.reshape(-1)

        return (ry.astype(jnp.uint8), ru.astype(jnp.uint8),
                rv.astype(jnp.uint8),
                ymode.astype(jnp.uint8), umode.astype(jnp.uint8),
                choose, iskip & choose,
                imv.astype(jnp.int16), imv2.astype(jnp.int16),
                iref_idx.astype(jnp.uint8), icomp, iwarp & choose,
                iwedge.astype(jnp.int8), iobmc, iimodes.astype(jnp.int8),
                qy_f, qu_f, qv_f, gm_mats, gm_trans, gm_kinds, interp,
                merge32, merge64, itx.astype(jnp.int8),
                isplit & choose, ismv.astype(jnp.int16), issk,
                mergeH, mergeV)

    return p1


# --------------------------------------------------------------------------
# P2: DLF level search/apply + CDEF search (device)
# --------------------------------------------------------------------------

def _sse_plane(a, b):
    """Frame SSE, int32-exact in 8-row chunks then f32 summed."""
    d = (a - b).astype(jnp.int32)
    d2 = d * d
    hh = d2.shape[0] - d2.shape[0] % 8
    head = d2[:hh].reshape(hh // 8, -1).sum(axis=1,
                                            dtype=jnp.int32)
    tot = head.astype(jnp.float32).sum()
    if d2.shape[0] % 8:
        tot = tot + d2[hh:].astype(jnp.float32).sum()
    return tot


def _dlf_plane_traced(x, step, blimit, limit, thresh, flen, bd,
                      on_v=None, on_h=None):
    """loop_filter_plane_uniform with traced thresholds.

    on_v (h, E) / on_h (E, w): optional per-line edge enables (the
    mask-aware case: 32x32-merged and skip-pair edges switch off;
    filter lengths stay uniform because min tx extent >= 16px luma /
    8px chroma on this grid)."""
    from svt_av1_tpu.ops import dlf
    h, w = x.shape
    # scatter-ADD of deltas, not window .set: window gathers are 14 wide
    # while chroma edges sit 8 apart, so a window overlaps its
    # neighbor's modified span — a masked-off (or unmodified) line must
    # not write stale gathered values over a filtered neighbor.  The
    # spec's flen <= min tx extent rule keeps modified spans disjoint,
    # so at most one edge contributes a nonzero delta per pixel.
    edges = np.arange(step, w, step)
    if len(edges):
        cols = edges[:, None] + np.arange(-7, 7)[None]
        lines = x[:, cols].transpose(1, 0, 2).reshape(-1, 14)
        f = dlf.filter_lines(lines, blimit, limit, thresh, flen, bd)
        if on_v is not None:
            f = jnp.where(on_v.T.reshape(-1, 1), f, lines)
        d = (f - lines).reshape(len(edges), h, 14).transpose(1, 0, 2)
        x = x.at[:, cols].add(d)
    redges = np.arange(step, h, step)
    if len(redges):
        rows = redges[:, None] + np.arange(-7, 7)[None]
        lines = x[rows, :].transpose(0, 2, 1).reshape(-1, 14)
        f = dlf.filter_lines(lines, blimit, limit, thresh, flen, bd)
        if on_h is not None:
            f = jnp.where(on_h.reshape(-1, 1), f, lines)
        d = (f - lines).reshape(len(redges), w, 14).transpose(0, 2, 1)
        x = x.at[rows, :].add(d)
    return x


def _dlf_plane_flens(x, step, blimit, limit, thresh, bd, fl_v, fl_h,
                     lens):
    """Plane deblock at ``step``-px edge spacing with per-edge-line
    filter lengths (the 8x8-partition case: luma edges every 8 px with
    flen in {0,8,14}, chroma every 4 px with flen in {0,4,6}).  Same
    disjoint-span scatter-add argument as ops.dlf._filter_edges_masked,
    which this wraps with traced thresholds."""
    from svt_av1_tpu.ops.dlf import _filter_edges_masked
    h_, w_ = x.shape
    epos_v = np.arange(step, w_, step)
    if len(epos_v):
        x = _filter_edges_masked(x, epos_v, fl_v, blimit, limit,
                                 thresh, lens, bd)
    epos_h = np.arange(step, h_, step)
    if len(epos_h):
        x = _filter_edges_masked(x.T, epos_h, fl_h.T, blimit, limit,
                                 thresh, lens, bd).T
    return x


def _derive_skip8(qy_f, qu_f, qv_f, skip16, split16, gh, gw):
    """(2gh, 2gw) per-8x8-unit coded-skip map: quadrant coefficient
    zero-ness for split blocks, the block value elsewhere (matches the
    decoder's per-decision d.skip derivation at 8-px granularity)."""
    ay = jnp.abs(qy_f).reshape(gh, gw, 2, 8, 2, 8).max(axis=(3, 5))
    au = jnp.abs(qu_f).reshape(gh, gw, 2, 4, 2, 4).max(axis=(3, 5))
    av = jnp.abs(qv_f).reshape(gh, gw, 2, 4, 2, 4).max(axis=(3, 5))
    subz = (ay == 0) & (au == 0) & (av == 0)        # (gh, gw, 2, 2)
    blk = skip16[:, :, None, None]
    skip8 = jnp.where(split16[:, :, None, None], subz, blk)
    return skip8.transpose(0, 2, 1, 3).reshape(2 * gh, 2 * gw)


NLVL = 5  # DLF ladder size (padded to fixed shape)


@functools.lru_cache(maxsize=None)
def _jit_p2(h, w, bd=8, ncand=8, dlf_on=True, cdef_on=True,
            uniform_apply=True, masked=False, split8=False):
    return jax.jit(_build_p2(h, w, bd, ncand, dlf_on, cdef_on,
                             uniform_apply, masked, split8))


@functools.lru_cache(maxsize=None)
def _build_p2(h, w, bd=8, ncand=8, dlf_on=True, cdef_on=True,
              uniform_apply=True, masked=False, split8=False):
    """DLF search+apply, CDEF search, pick AND apply — one program.

    Inputs: src planes, recon planes (post pass B), skip16, DLF ladder
    params (NLVL, 4) per plane group [level, blimit, limit, thresh],
    CDEF candidate strengths (ncand, 4) + damping.
    Outputs: FINAL recon (post DLF + CDEF at the device-argmin
    frame-uniform strength), chosen DLF levels (3,), per-SB CDEF SSE
    matrix (nsb, ncand), and the chosen candidate index.

    uniform_apply=False (key-frame search mode): the returned planes are
    post-DLF only and the caller does per-SB subset selection on the SSE
    matrix + a separate cdef_stage.cdef_apply dispatch (cdef_bits > 0).

    masked=True (inter frames with 32x32 skip-merges): two extra inputs
    (merge32 (gh2*gw2,) bool, inter16 (gh, gw) bool) derive per-edge
    DLF enables on device (interior edges of merged transforms and
    both-skip non-PU edges switch off, spec 7.14 derivation)."""
    from svt_av1_tpu.ops import cdef as cdef_ops
    from svt_av1_tpu.ops import dlf as dlf_ops
    gh8, gw8 = h // 8, w // 8
    nb8 = gh8 * gw8
    sbr, sbc = (h + 63) // 64, (w + 63) // 64
    gh, gw = h // BLK, w // BLK
    gh2, gw2 = gh // 2, gw // 2

    def p2(src_pack, rec_y, rec_u, rec_v, skip16, dlf_y, dlf_uv,
           cands, damping, merge32=None, inter16=None, merge64=None,
           split16=None, skip8m=None, mergeh=None, mergev=None):
        src_y = src_pack[:h].astype(jnp.int32)
        src_u = src_pack[h:, :w // 2].astype(jnp.int32)
        src_v = src_pack[h:, w // 2:].astype(jnp.int32)
        ons = dict(y=(None, None), c=(None, None))
        if masked:
            merged16 = jnp.zeros((gh, gw), bool)
            rect_h16 = jnp.zeros((gh, gw), bool)
            rect_v16 = jnp.zeros((gh, gw), bool)
            if gh2 and gw2:
                m2 = merge32.reshape(gh2, gw2)
                merged16 = merged16.at[:gh2 * 2, :gw2 * 2].set(
                    jnp.repeat(jnp.repeat(m2, 2, 0), 2, 1))
                if mergeh is not None:
                    rect_h16 = rect_h16.at[:gh2 * 2, :gw2 * 2].set(
                        jnp.repeat(jnp.repeat(
                            mergeh.reshape(gh2, gw2), 2, 0), 2, 1))
                if mergev is not None:
                    rect_v16 = rect_v16.at[:gh2 * 2, :gw2 * 2].set(
                        jnp.repeat(jnp.repeat(
                            mergev.reshape(gh2, gw2), 2, 0), 2, 1))
            merged64_16 = jnp.zeros((gh, gw), bool)
            gh4, gw4 = gh2 // 2, gw2 // 2
            if merge64 is not None and gh4 and gw4:
                m4 = merge64.reshape(gh4, gw4)
                merged64_16 = merged64_16.at[:gh4 * 4, :gw4 * 4].set(
                    jnp.repeat(jnp.repeat(m4, 4, 0), 4, 1))

            def _szmap(v64, v32, vrh, vrv, dflt, dsplit=None):
                base = (jnp.where(split16, dsplit, dflt)
                        if dsplit is not None else dflt)
                return jnp.where(
                    merged64_16, v64,
                    jnp.where(merged16, v32,
                              jnp.where(rect_h16, vrh,
                                        jnp.where(rect_v16, vrv,
                                                  base)))) \
                    .astype(jnp.int32)

            if split8:
                # per-direction tx extents in mi units (rect merges
                # have txw != txh: HORZ -> 32x16, VERT -> 16x32)
                txw16 = _szmap(16, 8, 8, 4, 4, 2)
                txh16 = _szmap(16, 8, 4, 8, 4, 2)
                inter8 = jnp.repeat(jnp.repeat(inter16, 2, 0), 2, 1)
                sk8dlf = skip8m & inter8
                skmi = jnp.repeat(jnp.repeat(sk8dlf, 2, 0), 2, 1)
            else:
                skdlf = skip16 & inter16
                txw16 = _szmap(16, 8, 8, 4, 4)
                txh16 = _szmap(16, 8, 4, 8, 4)
                skmi = jnp.repeat(jnp.repeat(skdlf, 4, 0), 4, 1)
            txwmi = jnp.repeat(jnp.repeat(txw16, 4, 0), 4, 1)
            txhmi = jnp.repeat(jnp.repeat(txh16, 4, 0), 4, 1)
            flv = dlf_ops.edge_flens(txwmi, txwmi, skmi, True)
            flh = dlf_ops.edge_flens(txhmi.T, txhmi.T, skmi.T, True).T
            if split8:
                # per-edge-line flen maps, luma edges every 8 px
                ons["y"] = (jnp.repeat(flv[:, 2::2], 4, axis=0),
                            jnp.repeat(flh[2::2, :], 4, axis=1))
                ctxw16 = _szmap(8, 4, 4, 2, 2, 1)
                ctxh16 = _szmap(8, 4, 2, 4, 2, 1)
                ctxwmi = jnp.repeat(jnp.repeat(ctxw16, 2, 0), 2, 1)
                ctxhmi = jnp.repeat(jnp.repeat(ctxh16, 2, 0), 2, 1)
                cskmi = sk8dlf          # chroma-mi grid == 8px grid
                cflv = dlf_ops.edge_flens(ctxwmi, ctxwmi, cskmi, False)
                cflh = dlf_ops.edge_flens(ctxhmi.T, ctxhmi.T, cskmi.T,
                                          False).T
                ons["c"] = (jnp.repeat(cflv[:, 1:], 4, axis=0),
                            jnp.repeat(cflh[1:, :], 4, axis=1))
            else:
                ons["y"] = (jnp.repeat(flv[:, 4::4] > 0, 4, axis=0),
                            jnp.repeat(flh[4::4, :] > 0, 4, axis=1))
                ctxw16 = _szmap(8, 4, 4, 2, 2)
                ctxh16 = _szmap(8, 4, 2, 4, 2)
                ctxwmi = jnp.repeat(jnp.repeat(ctxw16, 2, 0), 2, 1)
                ctxhmi = jnp.repeat(jnp.repeat(ctxh16, 2, 0), 2, 1)
                cskmi = jnp.repeat(jnp.repeat(skdlf, 2, 0), 2, 1)
                cflv = dlf_ops.edge_flens(ctxwmi, ctxwmi, cskmi, False)
                cflh = dlf_ops.edge_flens(ctxhmi.T, ctxhmi.T, cskmi.T,
                                          False).T
                ons["c"] = (jnp.repeat(cflv[:, 2::2] > 0, 4, axis=0),
                            jnp.repeat(cflh[2::2, :] > 0, 4, axis=1))

        # ---- DLF: evaluate the ladder per plane, pick min SSE ----
        def search_plane(src, rec, step, flen, params, onk):
            if not dlf_on:
                return rec, jnp.zeros((), jnp.int32)
            on_v, on_h = ons[onk]
            outs = [rec]
            sses = [_sse_plane(src, rec)]
            for li in range(1, NLVL):
                if masked and split8:
                    lens = (8, 14) if onk == "y" else (4, 6)
                    f = _dlf_plane_flens(rec, step // 2,
                                         params[li, 1], params[li, 2],
                                         params[li, 3], bd, on_v, on_h,
                                         lens)
                else:
                    f = _dlf_plane_traced(rec, step, params[li, 1],
                                          params[li, 2], params[li, 3],
                                          flen, bd, on_v, on_h)
                outs.append(f)
                sses.append(_sse_plane(src, f))
            sse = jnp.stack(sses)
            best = jnp.argmin(sse)
            out = outs[0]
            for li in range(1, NLVL):
                out = jnp.where(best == li, outs[li], out)
            return out, params[best, 0]

        fy, ly = search_plane(src_y, rec_y.astype(jnp.int32), BLK, 14,
                              dlf_y, "y")
        fu, lu = search_plane(src_u, rec_u.astype(jnp.int32), CBLK, 6,
                              dlf_uv, "c")
        fv, lv = search_plane(src_v, rec_v.astype(jnp.int32), CBLK, 6,
                              dlf_uv, "c")
        # AV1 codes chroma filter levels only when a luma level is
        # nonzero (uncompressed header: if filter_level[0] ||
        # filter_level[1]); with ly == 0 the decoder reads chroma 0,
        # so the applied filter must be off too or recon != decode
        coff = ly == 0
        fu = jnp.where(coff, rec_u.astype(jnp.int32), fu)
        fv = jnp.where(coff, rec_v.astype(jnp.int32), fv)
        lu = jnp.where(coff, 0, lu)
        lv = jnp.where(coff, 0, lv)

        # ---- CDEF: dirs once, per-candidate SSE per SB ----
        if not cdef_on:
            return (fy.astype(jnp.uint8), fu.astype(jnp.uint8),
                    fv.astype(jnp.uint8), jnp.stack([ly, lu, lv]),
                    jnp.zeros((sbr * sbc, ncand), jnp.float32),
                    jnp.zeros((), jnp.int32))
        ys8 = (jnp.arange(nb8) // gw8 * 8).astype(jnp.int32)
        xs8 = (jnp.arange(nb8) % gw8 * 8).astype(jnp.int32)
        r8 = ys8[:, None, None] + jnp.arange(8)[None, :, None]
        c8 = xs8[:, None, None] + jnp.arange(8)[None, None, :]
        blocks = fy[r8, c8]
        dirs, var = cdef_ops.cdef_find_dir(blocks, bd - 8)
        if split8:
            skip8 = skip8m.reshape(-1)
        else:
            skip8 = jnp.repeat(jnp.repeat(skip16, 2, 0),
                               2, 1).reshape(-1)
        pad_y = jnp.pad(fy, 2, constant_values=cdef_ops.CDEF_VERY_LARGE)
        pad_u = jnp.pad(fu, 2, constant_values=cdef_ops.CDEF_VERY_LARGE)
        pad_v = jnp.pad(fv, 2, constant_values=cdef_ops.CDEF_VERY_LARGE)
        wy = pad_y[ys8[:, None, None] + jnp.arange(12)[None, :, None],
                   xs8[:, None, None] + jnp.arange(12)[None, None, :]]
        cys, cxs = ys8 // 2, xs8 // 2
        wu = pad_u[cys[:, None, None] + jnp.arange(8)[None, :, None],
                   cxs[:, None, None] + jnp.arange(8)[None, None, :]]
        wv = pad_v[cys[:, None, None] + jnp.arange(8)[None, :, None],
                   cxs[:, None, None] + jnp.arange(8)[None, None, :]]
        src_blk_y = src_y[r8, c8]
        rc4 = cys[:, None, None] + jnp.arange(4)[None, :, None]
        cc4 = cxs[:, None, None] + jnp.arange(4)[None, None, :]
        src_blk_u = src_u[rc4, cc4]
        src_blk_v = src_v[rc4, cc4]
        cur_u = fu[rc4, cc4]
        cur_v = fv[rc4, cc4]
        cs = bd - 8
        sb_of = ((ys8 // 64) * sbc + (xs8 // 64))
        sses = []
        from svt_av1_tpu.pipeline.cdef_stage import _adjust_strength
        for ci in range(ncand):
            pri_y = _adjust_strength(cands[ci, 0] << cs, var)
            sec_y0 = cands[ci, 1] + (cands[ci, 1] == 3)
            filt_y = cdef_ops.cdef_filter_block(
                wy, pri_y, jnp.broadcast_to(sec_y0 << cs, (nb8,)),
                dirs, damping + cs, damping + cs, cs, bd, n=8)
            keep = skip8[:, None, None]
            filt_y = jnp.where(keep, blocks, filt_y)
            dy2 = (filt_y - src_blk_y) ** 2
            pri_c = jnp.broadcast_to(cands[ci, 2] << cs, (nb8,))
            sec_c0 = cands[ci, 3] + (cands[ci, 3] == 3)
            sec_c = jnp.broadcast_to(sec_c0 << cs, (nb8,))
            filt_u = cdef_ops.cdef_filter_block(
                wu, pri_c, sec_c, dirs, damping - 1 + cs,
                damping - 1 + cs, cs, bd, n=4)
            filt_v = cdef_ops.cdef_filter_block(
                wv, pri_c, sec_c, dirs, damping - 1 + cs,
                damping - 1 + cs, cs, bd, n=4)
            filt_u = jnp.where(keep, cur_u, filt_u)
            filt_v = jnp.where(keep, cur_v, filt_v)
            du2 = (filt_u - src_blk_u) ** 2
            dv2 = (filt_v - src_blk_v) ** 2
            per8 = (dy2.sum(axis=(1, 2)) + du2.sum(axis=(1, 2))
                    + dv2.sum(axis=(1, 2))).astype(jnp.float32)
            sses.append(jax.ops.segment_sum(per8, sb_of,
                                            num_segments=sbr * sbc))
        sse_sb = jnp.stack(sses, axis=1)         # (nsb, ncand)
        if not uniform_apply:
            return (fy.astype(jnp.uint8), fu.astype(jnp.uint8),
                    fv.astype(jnp.uint8), jnp.stack([ly, lu, lv]),
                    sse_sb, jnp.zeros((), jnp.int32))
        # frame-uniform pick (cdef_bits = 0) + apply, all on device —
        # the recon the DPB keeps never leaves the chip
        best = jnp.argmin(sse_sb.sum(axis=0)).astype(jnp.int32)
        keep = skip8[:, None, None]
        pri_b = _adjust_strength(cands[best, 0] << cs, var)
        sec_b = jnp.broadcast_to(
            (cands[best, 1] + (cands[best, 1] == 3)) << cs, (nb8,))
        by = cdef_ops.cdef_filter_block(wy, pri_b, sec_b, dirs,
                                        damping + cs, damping + cs,
                                        cs, bd, n=8)
        by = jnp.where(keep, blocks, by)
        out_y = fy.at[r8, c8].set(by)
        pri_bc = jnp.broadcast_to(cands[best, 2] << cs, (nb8,))
        sec_bc = jnp.broadcast_to(
            (cands[best, 3] + (cands[best, 3] == 3)) << cs, (nb8,))
        bu = cdef_ops.cdef_filter_block(wu, pri_bc, sec_bc, dirs,
                                        damping - 1 + cs,
                                        damping - 1 + cs, cs, bd, n=4)
        bv = cdef_ops.cdef_filter_block(wv, pri_bc, sec_bc, dirs,
                                        damping - 1 + cs,
                                        damping - 1 + cs, cs, bd, n=4)
        out_u = fu.at[rc4, cc4].set(jnp.where(keep, cur_u, bu))
        out_v = fv.at[rc4, cc4].set(jnp.where(keep, cur_v, bv))
        return (out_y.astype(jnp.uint8), out_u.astype(jnp.uint8),
                out_v.astype(jnp.uint8), jnp.stack([ly, lu, lv]),
                sse_sb, best)

    return p2


def dlf_ladder_params(qindex: int, chroma: bool) -> np.ndarray:
    """(NLVL, 4) [level, blimit, limit, thresh] ladder for the device
    DLF search (dlf_stage._ladder + loop_filter_thresholds)."""
    from svt_av1_tpu.ops.dlf import loop_filter_thresholds
    from svt_av1_tpu.pipeline.dlf_stage import _ladder, \
        default_filter_level
    d = default_filter_level(qindex)
    if chroma:
        d = max(0, d - 2)
    lvls = list(_ladder(d))
    lvls = ([0] + [l for l in lvls if l > 0])[:NLVL]
    while len(lvls) < NLVL:
        lvls.append(lvls[-1])
    out = np.zeros((NLVL, 4), np.int32)
    for i, l in enumerate(lvls):
        bl, li, th = loop_filter_thresholds(max(l, 1))
        out[i] = (l, bl, li, th)
    return out


# --------------------------------------------------------------------------
# batched TPL (whole lookahead group in ONE program + ONE pull)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _jit_tpl_group(h, w, deps):
    """TPL dispenser for a whole mini-GoP/lookahead group: deps[i] is a
    tuple of reference indices into the group (empty = intra anchor).
    Replaces the per-frame tpl_frame_stats calls (which cost 2-3 device
    round trips EACH) with one program and one pull."""
    from svt_av1_tpu.pipeline import tpl as tpl_mod
    gh, gw = h // BLK, w // BLK
    nb = gh * gw
    h64 = (h + 63) & ~63
    w64 = (w + 63) & ~63
    hme_run = me_pipe.hme_core(h64, w64, 8, 8, 4)
    costs, ys_np, xs_np = tpl_mod.tpl_costs_core(h, w)
    ne = len(deps)

    def run(srcs_u8):
        srcs = srcs_u8.astype(jnp.int32)
        pad64 = ((0, h64 - h), (0, w64 - w))
        ys = jnp.asarray(ys_np)
        xs = jnp.asarray(xs_np)
        intra_o = jnp.zeros((ne, nb), jnp.float32)
        inter_o = jnp.full((ne, nb), jnp.float32(3.0e38))
        mv_o = jnp.zeros((ne, nb, 2), jnp.int32)
        sel_o = jnp.zeros((ne, nb), jnp.int32)
        for i, dep in enumerate(deps):
            src = srcs[i]
            if not dep:
                refp = jnp.pad(src, mc.PAD, mode="edge")
                ic, _ = costs(src, refp, jnp.zeros((nb, 2), jnp.int32))
                intra_o = intra_o.at[i].set(ic.astype(jnp.float32))
                continue
            src64 = jnp.pad(src, pad64, mode="edge")
            best_e = None
            for ri, j in enumerate(dep):
                ref = srcs[j]
                mvy, mvx, _ = hme_run(src64, jnp.pad(ref, pad64,
                                                     mode="edge"))
                mvs = jnp.stack([mvy[:gh, :gw].reshape(nb) * 8,
                                 mvx[:gh, :gw].reshape(nb) * 8],
                                axis=-1).astype(jnp.int32)
                mvs = _clamp_cands(mvs[:, None], ys, xs, BLK, h,
                                   w)[:, 0]
                refp = jnp.pad(ref, mc.PAD, mode="edge")
                ic, ec = costs(src, refp, mvs)
                ec = ec.astype(jnp.float32)
                if best_e is None:
                    intra_o = intra_o.at[i].set(ic.astype(jnp.float32))
                    best_e = (ec, mvs, jnp.zeros((nb,), jnp.int32))
                else:
                    take = ec < best_e[0]
                    best_e = (jnp.where(take, ec, best_e[0]),
                              jnp.where(take[:, None], mvs, best_e[1]),
                              jnp.where(take, ri, best_e[2]))
            inter_o = inter_o.at[i].set(best_e[0])
            mv_o = mv_o.at[i].set(best_e[1])
            sel_o = sel_o.at[i].set(best_e[2])
        return intra_o, inter_o, mv_o, sel_o

    return jax.jit(run)


def tpl_group_stats(srcs, deps):
    """Batched dispenser: srcs = [(h, w) uint8/int arrays], deps[i] a
    list/None of reference indices.  Returns the per-frame stats dicts
    consumed by tpl.synthesize — computed with ONE device round trip."""
    h, w = srcs[0].shape
    gh, gw = h // BLK, w // BLK
    key = tuple(tuple(d) if d else () for d in deps)
    run = _jit_tpl_group(h, w, key)
    packed = np.stack([np.asarray(s, np.uint8) for s in srcs])
    intra, inter, mv, sel = jax.device_get(run(packed))
    out = []
    for i, dep in enumerate(key):
        if not dep:
            out.append(dict(intra=intra[i].astype(np.float64),
                            inter=np.full(gh * gw, np.inf),
                            mv=np.zeros((gh * gw, 2), np.int32),
                            ref_sel=np.zeros(gh * gw, np.int32),
                            gh=gh, gw=gw))
        else:
            out.append(dict(intra=intra[i].astype(np.float64),
                            inter=inter[i].astype(np.float64),
                            mv=mv[i], ref_sel=sel[i], gh=gh, gw=gw))
    return out


# --------------------------------------------------------------------------
# host orchestration
# --------------------------------------------------------------------------

class PendingInterFrame:
    """Handle for one dispatched inter frame: device outputs + meta.

    ``recon`` (the post-filter DPB planes) is available as device
    futures immediately after dispatch — later frames can reference it
    before this frame's host pull happens (mini-GoP pipelining)."""

    def __init__(self, outs, p2_outs, ref_enums, h, w, qindex):
        self.outs = outs
        self.p2_outs = p2_outs
        self.ref_enums = ref_enums
        self.h, self.w = h, w
        self.qindex = qindex
        self.recon = dict(y=p2_outs[0], u=p2_outs[1], v=p2_outs[2])


def run_inter_frame(src_pack_u8: np.ndarray, refs: Dict[int, Dict],
                    qindex: int, h: int, w: int, modes, bd: int = 8,
                    ring: bool = True, rad2: int = 8, rad0: int = 7,
                    cdef_cands=None, dlf_on: bool = True,
                    cdef_on: bool = True, cdf_state=None,
                    hp: bool = False, obmc: bool = False,
                    interintra: bool = False,
                    exact_rates: bool = False,
                    skip_mode: bool = False,
                    tx_search: bool = False,
                    split8: bool = False):
    """Dispatch P1+P2 for one inter frame.  refs: {ref_enum: device
    plane dict} in MD priority order (LAST first).  Returns
    PendingInterFrame; finish with collect_inter_frame.

    cdf_state: optional adapted FrameCDFs for content-matched MD rate
    tables (rate_est.adapted_decision_tables)."""
    from svt_av1_tpu.codec.rate_est import md_rate_args
    from svt_av1_tpu.pipeline.cdef_stage import SEARCH_SET, cdef_damping
    ref_enums = sorted(refs)
    R = len(ref_enums)
    refs_y = jnp.stack([jnp.asarray(refs[e]["y"]).astype(jnp.int32)
                        for e in ref_enums])
    refs_u = jnp.stack([jnp.asarray(refs[e]["u"]).astype(jnp.int32)
                        for e in ref_enums])
    refs_v = jnp.stack([jnp.asarray(refs[e]["v"]).astype(jnp.int32)
                        for e in ref_enums])
    qp = quant.make_quant_params(qindex, bd=bd)
    qstep = quant.dc_q(qindex, bd=bd) / 8.0
    lam = np.float32(0.7 * qstep * qstep)
    rt = md_rate_args(qindex, tuple(modes), _UV_MODES(), cdf_state,
                      inter_frame=True, exact=exact_rates)
    has_bwd = R >= 2 and ref_enums[-1] == 7  # ALTREF_FRAME present
    p1 = _jit_p1(h, w, R, tuple(modes), bd, ring, has_bwd, rad2, rad0,
                 hp, obmc, interintra, skip_mode and has_bwd, tx_search,
                 split8)
    outs = p1(src_pack_u8, refs_y, refs_u, refs_v,
              *(np.asarray(a) for a in qp), lam,
              rt[0], rt[1], rt[2], rt[3], rt[4], rt[5], rt[6])
    (ry, ru, rv) = outs[:3]
    cands = np.asarray(cdef_cands if cdef_cands is not None
                       else SEARCH_SET, np.int32)
    p2 = _jit_p2(h, w, bd, len(cands), dlf_on, cdef_on, masked=True,
                 split8=split8)
    # skip16 from the final coeff arrays (device)
    qy_f, qu_f, qv_f = outs[15], outs[16], outs[17]
    skip16 = ((jnp.abs(qy_f).max(axis=1) == 0)
              & (jnp.abs(qu_f).max(axis=1) == 0)
              & (jnp.abs(qv_f).max(axis=1) == 0)).reshape(h // BLK,
                                                          w // BLK)
    inter16 = outs[5].reshape(h // BLK, w // BLK)
    extra = ()
    if split8:
        gh_, gw_ = h // BLK, w // BLK
        split16 = outs[25].reshape(gh_, gw_)
        skip8 = _derive_skip8(qy_f, qu_f, qv_f, skip16, split16,
                              gh_, gw_)
        extra = (split16, skip8)
    p2_outs = p2(src_pack_u8, ry, ru, rv, skip16,
                 dlf_ladder_params(qindex, False),
                 dlf_ladder_params(qindex, True),
                 cands, np.int32(cdef_damping(qindex)),
                 outs[22], inter16, outs[23], *extra,
                 mergeh=outs[28], mergev=outs[29])
    pend = PendingInterFrame(outs, p2_outs, ref_enums, h, w, qindex)
    pend.cdef_cands = cands
    pend.cdef_on = cdef_on
    pend.dlf_on = dlf_on
    # start the device->host copy of every host-needed array NOW: the
    # transfers stream back as the frame's programs finish, so the
    # bundled pull in collect_inter_frame finds them already resident
    for a in list(outs[3:]) + [p2_outs[3], p2_outs[5]]:
        try:
            a.copy_to_host_async()
        except (AttributeError, RuntimeError):
            break
    return pend


def run_key_filters(src: Dict[str, np.ndarray],
                    recon: Dict[str, np.ndarray], skip16: np.ndarray,
                    qindex: int, bd: int = 8, cdef_cands=None,
                    dlf_on: bool = True, cdef_on: bool = True,
                    max_bits: int = 3):
    """Key-frame filter stage, fused: ONE P2 program (DLF ladder search
    + per-SB/per-candidate CDEF SSE), one small pull, host subset
    selection (finish_cdef_search analog, cdef_stage.select_sb_sets),
    one per-SB apply dispatch.  Replaces dlf_stage.search_and_apply
    (per-level host pulls) + cdef_stage.cdef_search_sb (per-candidate
    full-frame pulls) on the fast GOP path.

    Returns (recon_out, deblocked_dev, fp_updates, cdef_idx_map):
    recon_out = final filtered planes (np), deblocked_dev = post-DLF
    pre-CDEF device planes (the LR boundary source), fp_updates = frame
    header fields to set."""
    from svt_av1_tpu.ops import quant as q_
    from svt_av1_tpu.pipeline import cdef_stage
    h, w = src["y"].shape
    src_pack = np.concatenate(
        [np.asarray(src["y"], np.uint8),
         np.concatenate([np.asarray(src["u"], np.uint8),
                         np.asarray(src["v"], np.uint8)], axis=1)],
        axis=0)
    cands = np.asarray(cdef_cands if cdef_cands is not None
                       else cdef_stage.SEARCH_SET, np.int32)
    damping = cdef_stage.cdef_damping(qindex)
    p2 = _jit_p2(h, w, bd, len(cands), dlf_on, cdef_on,
                 uniform_apply=False)
    fy, fu, fv, levels, sse_sb, _ = p2(
        src_pack, jnp.asarray(recon["y"]), jnp.asarray(recon["u"]),
        jnp.asarray(recon["v"]), jnp.asarray(skip16),
        dlf_ladder_params(qindex, False), dlf_ladder_params(qindex, True),
        cands, np.int32(damping))
    levels_h, sse_h = jax.device_get([levels, sse_sb])
    fp_updates = {}
    if dlf_on:
        ly, lu, lv = (int(x) for x in levels_h)
        fp_updates["filter_level"] = (ly, ly)
        fp_updates["filter_level_uv"] = (lu, lv)
    deblocked = dict(y=fy, u=fu, v=fv)
    idx_map = None
    if cdef_on:
        coded = cdef_stage.coded_sb_map(np.asarray(skip16))
        qstep = q_.dc_q(qindex, bd=bd) / 8.0
        lam = 0.7 * qstep * qstep
        cand_tuples = [tuple(int(x) for x in c) for c in cands]
        bits, sets, idx_map = cdef_stage.select_sb_sets(
            np.asarray(sse_h, np.float64), coded, lam, cand_tuples,
            max_bits)
        rec = cdef_stage.cdef_apply(
            deblocked, np.asarray(skip16),
            sets if bits else sets[0], damping, bd,
            sb_idx=idx_map if bits else None)
        fp_updates.update(cdef_bits=bits, cdef_strengths=sets[0],
                          cdef_strength_list=sets if bits else None,
                          cdef_damping=damping)
        if not bits:
            idx_map = None
        out = {k: np.asarray(rec[k]) for k in ("y", "u", "v")}
    else:
        out = dict(y=np.asarray(fy), u=np.asarray(fu), v=np.asarray(fv))
    return out, deblocked, fp_updates, idx_map


def _UV_MODES():
    from svt_av1_tpu.pipeline.intra_encoder import UV_MODES
    return UV_MODES


def collect_inter_frame(pend: PendingInterFrame, bd: int = 8):
    """ONE bundled device->host pull.  Returns (decisions,
    recon_device, header_info); recon_device == pend.recon (the DPB
    slot content, final after the device-side DLF+CDEF pick)."""
    from svt_av1_tpu.codec import mv_pred
    from svt_av1_tpu.codec.syntax import BlockDecision
    from svt_av1_tpu.utils.profiling import stage
    h, w = pend.h, pend.w
    gh, gw = h // BLK, w // BLK
    nb = gh * gw
    # the single round trip: every host-needed array in one device_get
    small = list(pend.outs[3:]) + [pend.p2_outs[3], pend.p2_outs[5]]
    with stage("collect_pull"):
        pulled = jax.device_get(small)
    (ymode, umode, choose, iskip, imv, imv2, iref_idx, icomp, iwarp,
     iwedge, iobmc, iimodes, qy_f, qu_f, qv_f, gm_mats, gm_trans,
     gm_kinds, interp, merge32, merge64, itx, isplit, ismv, issk,
     mergeh, mergev, dlf_levels, best_ci) = pulled
    rec_y, rec_u, rec_v = pend.recon["y"], pend.recon["u"], pend.recon["v"]

    cdef_info = None
    if pend.cdef_on:
        strengths = tuple(int(x) for x in pend.cdef_cands[int(best_ci)])
        cdef_info = dict(bits=0, sets=(strengths,), idx_map=None,
                         best_ci=int(best_ci))

    # ---- decisions ----
    gm = {}
    for i, e in enumerate(pend.ref_enums):
        k = int(gm_kinds[i])
        if k == 2:
            gm[e] = tuple(int(x) for x in gm_mats[i])
        elif k == 1:
            gm[e] = (int(gm_trans[i][0]), int(gm_trans[i][1]))
    qy_f = qy_f.astype(np.int32).reshape(nb, BLK, BLK)
    qu_f = qu_f.astype(np.int32).reshape(nb, CBLK, CBLK)
    qv_f = qv_f.astype(np.int32).reshape(nb, CBLK, CBLK)
    decisions = {}
    enums = pend.ref_enums
    gh2, gw2 = gh // 2, gw // 2
    merged16 = np.zeros((gh, gw), bool)
    if gh2 and gw2:
        merged16[:gh2 * 2, :gw2 * 2] = np.repeat(
            np.repeat(np.asarray(merge32).reshape(gh2, gw2), 2, 0),
            2, 1)
    merged64_16 = np.zeros((gh, gw), bool)
    gh4, gw4 = gh2 // 2, gw2 // 2
    if gh4 and gw4:
        merged64_16[:gh4 * 4, :gw4 * 4] = np.repeat(
            np.repeat(np.asarray(merge64).reshape(gh4, gw4), 4, 0),
            4, 1)
    recth16 = np.zeros((gh, gw), bool)
    rectv16 = np.zeros((gh, gw), bool)
    if gh2 and gw2:
        recth16[:gh2 * 2, :gw2 * 2] = np.repeat(
            np.repeat(np.asarray(mergeh).reshape(gh2, gw2), 2, 0), 2, 1)
        rectv16[:gh2 * 2, :gw2 * 2] = np.repeat(
            np.repeat(np.asarray(mergev).reshape(gh2, gw2), 2, 0), 2, 1)
    z64 = np.zeros((4 * BLK, 4 * BLK), np.int32)
    z32 = np.zeros((2 * BLK, 2 * BLK), np.int32)
    z32c = np.zeros((4 * CBLK, 4 * CBLK), np.int32)
    z16 = np.zeros((2 * CBLK, 2 * CBLK), np.int32)
    for bid in range(nb):
        by, bx = bid // gw, bid % gw
        r4, c4 = by * 4, bx * 4
        if merged64_16[by, bx]:
            if by % 4 or bx % 4:
                continue          # covered by the 64x64 leaf
            decisions[(r4, c4)] = BlockDecision(
                r4=r4, c4=c4, bsize=cc.BLOCK_64X64, y_mode=cc.DC_PRED,
                uv_mode=cc.DC_PRED, tx_type=cc.DCT_DCT,
                qcoeff_y=z64, qcoeff_u=z32c, qcoeff_v=z32c,
                is_inter=True,
                mv=(int(imv[bid, 0]), int(imv[bid, 1])),
                ref=int(enums[iref_idx[bid]]),
                ref2=(int(mv_pred.ALTREF_FRAME) if icomp[bid] else 0),
                mv2=((int(imv2[bid, 0]), int(imv2[bid, 1]))
                     if icomp[bid] else (0, 0)))
            continue
        if merged16[by, bx]:
            if by % 2 or bx % 2:
                continue          # covered by the 32x32 leaf
            decisions[(r4, c4)] = BlockDecision(
                r4=r4, c4=c4, bsize=cc.BLOCK_32X32, y_mode=cc.DC_PRED,
                uv_mode=cc.DC_PRED, tx_type=cc.DCT_DCT,
                qcoeff_y=z32, qcoeff_u=z16, qcoeff_v=z16,
                is_inter=True,
                mv=(int(imv[bid, 0]), int(imv[bid, 1])),
                ref=int(enums[iref_idx[bid]]),
                ref2=(int(mv_pred.ALTREF_FRAME) if icomp[bid] else 0),
                mv2=((int(imv2[bid, 0]), int(imv2[bid, 1]))
                     if icomp[bid] else (0, 0)))
            continue
        if recth16[by, bx] or rectv16[by, bx]:
            if by % 2 or bx % 2:
                continue          # covered by the rect pair's leaves
            horz = bool(recth16[by, bx])
            sub = cc.BLOCK_32X16 if horz else cc.BLOCK_16X32
            zy_s = (16, 32) if horz else (32, 16)
            zc_s = (8, 16) if horz else (16, 8)
            for half in (0, 1):
                hb = bid + half * (gw if horz else 1)
                hr4 = r4 + (4 * half if horz else 0)
                hc4 = c4 + (0 if horz else 4 * half)
                decisions[(hr4, hc4)] = BlockDecision(
                    r4=hr4, c4=hc4, bsize=sub, y_mode=cc.DC_PRED,
                    uv_mode=cc.DC_PRED, tx_type=cc.DCT_DCT,
                    qcoeff_y=np.zeros(zy_s, np.int32),
                    qcoeff_u=np.zeros(zc_s, np.int32),
                    qcoeff_v=np.zeros(zc_s, np.int32),
                    is_inter=True,
                    mv=(int(imv[hb, 0]), int(imv[hb, 1])),
                    ref=int(enums[iref_idx[hb]]),
                    ref2=(int(mv_pred.ALTREF_FRAME) if icomp[hb]
                          else 0),
                    mv2=((int(imv2[hb, 0]), int(imv2[hb, 1]))
                         if icomp[hb] else (0, 0)))
            continue
        if choose[bid] and isplit[bid]:
            # 8x8 partition split: four single-ref leaves, each with
            # its own MV / TX_8X8 luma / TX_4X4 chroma quadrant
            ref_e = int(enums[iref_idx[bid]])
            for si, (dy, dx) in enumerate(((0, 0), (0, 8),
                                           (8, 0), (8, 8))):
                cy0, cx0 = dy // 2, dx // 2
                decisions[(r4 + dy // 4, c4 + dx // 4)] = BlockDecision(
                    r4=r4 + dy // 4, c4=c4 + dx // 4,
                    bsize=cc.BLOCK_8X8, y_mode=cc.DC_PRED,
                    uv_mode=cc.DC_PRED, tx_type=cc.DCT_DCT,
                    qcoeff_y=qy_f[bid][dy:dy + 8, dx:dx + 8].copy(),
                    qcoeff_u=qu_f[bid][cy0:cy0 + 4, cx0:cx0 + 4].copy(),
                    qcoeff_v=qv_f[bid][cy0:cy0 + 4, cx0:cx0 + 4].copy(),
                    is_inter=True,
                    mv=(int(ismv[bid, si, 0]), int(ismv[bid, si, 1])),
                    ref=ref_e)
            continue
        if choose[bid]:
            mcode = int(iwedge[bid]) if icomp[bid] else -1
            if mcode >= 64:      # DIFFWTD (mask_type in the low bit)
                ctyp, widx_, wsgn = 2, 0, mcode - 64
            elif mcode >= 0:     # WEDGE (sign*16 + index)
                ctyp, widx_, wsgn = 1, mcode & 15, mcode >> 4
            else:
                ctyp = widx_ = wsgn = 0
            decisions[(r4, c4)] = BlockDecision(
                r4=r4, c4=c4, bsize=cc.BLOCK_16X16, y_mode=cc.DC_PRED,
                uv_mode=cc.DC_PRED,
                tx_type=_ITX_ENUM[int(itx[bid])],
                qcoeff_y=qy_f[bid], qcoeff_u=qu_f[bid],
                qcoeff_v=qv_f[bid], is_inter=True,
                mv=(int(imv[bid, 0]), int(imv[bid, 1])),
                ref=int(enums[iref_idx[bid]]),
                use_warp=bool(iwarp[bid]),
                ref2=(int(mv_pred.ALTREF_FRAME) if icomp[bid] else 0),
                mv2=((int(imv2[bid, 0]), int(imv2[bid, 1]))
                     if icomp[bid] else (0, 0)),
                comp_type=ctyp, wedge_idx=widx_, wedge_sign=wsgn,
                motion_mode=int(bool(iobmc[bid])),
                interintra_mode=int(iimodes[bid]))
        else:
            decisions[(r4, c4)] = BlockDecision(
                r4=r4, c4=c4, bsize=cc.BLOCK_16X16,
                y_mode=int(ymode[bid]), uv_mode=int(umode[bid]),
                tx_type=cc.DCT_DCT, qcoeff_y=qy_f[bid],
                qcoeff_u=qu_f[bid], qcoeff_v=qv_f[bid])
    header = dict(gm=gm, interp=int(interp),
                  dlf_levels=tuple(int(x) for x in dlf_levels),
                  cdef=cdef_info)
    return decisions, pend.recon, header
