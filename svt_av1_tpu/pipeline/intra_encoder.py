"""Intra (key) frame encoder: device-batched mode decision + conformant
reconstruction.

TPU-first redesign of the reference's EncDec stage for intra frames
(reference enc_dec_process.c wavefront + product_coding_loop.c MD funnel):
instead of per-thread superblock segments, the frame's fixed-size blocks
are batched along anti-diagonal *waves* (all blocks with bx+by == k have
no mutual dependencies).  Each wave is one fixed-shape jitted device step:

  gather neighbors -> predict all modes -> transform -> quantize ->
  reconstruct -> RD select -> scatter recon

Per-frame host work is only the wave loop and the final coefficient
pull.  Round-1 scope: fixed 16x16 luma partition (8x8 chroma), mode set
{DC, V, H, SMOOTH, PAETH}, one frame at a time.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.codec.syntax import BlockDecision
from svt_av1_tpu.ops import intra, quant, transforms as tf

MODES = (cc.DC_PRED, cc.V_PRED, cc.H_PRED, cc.SMOOTH_PRED, cc.PAETH_PRED,
         cc.D135_PRED, cc.D113_PRED, cc.D157_PRED, cc.D45_PRED,
         cc.D67_PRED, cc.D203_PRED)
# chroma mode set; each uses its implied (unsignaled) transform type
UV_MODES = (cc.DC_PRED, cc.V_PRED, cc.H_PRED, cc.SMOOTH_PRED)
UV_TX_TYPES = (cc.DCT_DCT, cc.ADST_DCT, cc.DCT_ADST, cc.ADST_ADST)
# luma tx-type search set for 16x16 intra: the DTT4 members of the
# signalable EXT_TX_SET_DTT4_IDTX set (all share the default scan).
# IDTX is deliberately NOT searched: measured (round 2) it loses up to
# 1.7 dB at mid/high qp for small bit savings — the sparsity-biased MD
# metric underprices identity-transform residual distortion.
TX_SEARCH_SET = (cc.DCT_DCT, cc.ADST_ADST, cc.ADST_DCT, cc.DCT_ADST)
# angle-delta refinement per directional mode (spec MAX_ANGLE_DELTA=3,
# step 3 degrees); evaluated with DCT_DCT
ANGLE_DELTAS = (-3, -2, -1, 1, 2, 3)


def _pallas_ok() -> bool:
    """Use the Pallas fused kernels only on a real TPU backend.  CPU
    test meshes AND tpu-default sessions tracing under a pinned CPU
    device (the multichip dryrun) take the identical-numerics XLA
    path."""
    try:
        dd = jax.config.jax_default_device
        if dd is not None and getattr(dd, "platform", "cpu") != "tpu":
            return False
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def cand_angle(mode: int, delta: int) -> int:
    """Prediction angle of a candidate (0 = non-directional)."""
    if cc.V_PRED <= mode <= cc.D67_PRED:
        return intra.MODE_TO_ANGLE[mode] + 3 * delta
    return 0


def expand_tx_cands(modes, angle_deltas=False):
    """Candidate expansion for luma 16x16 MD: (cand_modes, cand_txs)
    where each cand_mode is (mode, angle_delta).  Tx search crosses the
    DTT4_IDTX set with delta-0 modes; angle-delta refinements run with
    DCT_DCT only (the reference similarly restricts its delta search
    stage, intra_prediction.c angle-delta loops)."""
    reg = [m for m in modes if m < cc.FI_MODE_BASE]
    fi = [m for m in modes if m >= cc.FI_MODE_BASE]
    cand_modes = [(m, 0) for t in TX_SEARCH_SET for m in reg]
    cand_txs = [t for t in TX_SEARCH_SET for _ in reg]
    # filter-intra candidates run once, DCT only
    cand_modes += [(m, 0) for m in fi]
    cand_txs += [cc.DCT_DCT for _ in fi]
    modes = reg
    if angle_deltas:
        for m in modes:
            if not (cc.V_PRED <= m <= cc.D67_PRED):
                continue
            for d in ANGLE_DELTAS:
                cand_modes.append((m, d))
                cand_txs.append(cc.DCT_DCT)
    return tuple(cand_modes), tuple(cand_txs)


def _predict_cand(mode, delta, n, above, left, corner, above_ext,
                  left_ext, have_above, have_left, bd):
    """Prediction for one (mode, angle_delta) candidate; zone picked
    from the final angle (spec §7.11.2 directional zones)."""
    if mode >= cc.FI_MODE_BASE:
        return intra.filter_intra_pred(above, left, corner,
                                       mode - cc.FI_MODE_BASE, n, n, bd)
    angle = cand_angle(mode, delta)
    if angle and angle != 90 and angle != 180:
        if angle < 90:
            return intra.z1_pred(above_ext, n, n, angle)
        if angle > 180:
            return intra.z3_pred(left_ext, n, n, angle)
        return intra.z2_pred(above, left, corner, n, n, angle)
    return intra.predict(mode, above, left, corner, n, n,
                         have_above=have_above, have_left=have_left,
                         bd=bd)
BLK = 16
CBLK = 8


def _scan_pos(tx_size: int) -> np.ndarray:
    """(n, n) scan position of each coefficient (inverse default scan;
    the 2-D tx classes used in MD all share the default scan)."""
    from svt_av1_tpu.codec import tables as tb
    scan = np.asarray(tb.get_scan(tx_size, cc.DCT_DCT))
    pos = np.zeros(scan.shape[0], np.int32)
    pos[scan] = np.arange(scan.shape[0], dtype=np.int32)
    n = int(np.sqrt(scan.shape[0]))
    return pos.reshape(n, n)


def _txb_bits(qcoeff_abs, coef_bits, base, eob_tbl, pos):
    """CDF-derived txb rate with eob-position awareness: nonzero levels
    pay their level cost, zeros before eob pay the zero-symbol cost,
    zeros after eob are free, plus the eob class cost and the txb flag
    (md_rate_estimation.c coefficient-rate role).

    The decision tables' level curve is analytic (rate_est docstring:
    2*log2(1+l) + 1 per nonzero), so the per-coefficient cost is pure
    VPU math — no per-coefficient gather ever touches the TPU.

    When ``coef_bits`` is a CoefTables bundle (rate_est.md_rate_args
    exact=True), the context-exact device model replaces this curve:
    every coefficient is priced with the coder's own neighbor-sum
    contexts (base/eob-tbl args are folded into the bundle and
    ignored)."""
    from svt_av1_tpu.ops.coef_rate import CoefTables, txb_bits_exact
    if isinstance(coef_bits, CoefTables):
        return txb_bits_exact(qcoeff_abs, coef_bits,
                              qcoeff_abs.shape[-1])
    nzm = qcoeff_abs > 0
    eob = jnp.max(jnp.where(nzm, pos + 1, 0), axis=(1, 2))
    af = qcoeff_abs.astype(jnp.float32)
    nz_bits = (2.0 * jnp.sum(jnp.log2(1.0 + af), axis=(1, 2))
               + jnp.sum(nzm, axis=(1, 2)).astype(jnp.float32))
    nz_cnt = jnp.sum(nzm, axis=(1, 2)).astype(jnp.float32)
    zeros_before = eob.astype(jnp.float32) - nz_cnt
    return nz_bits + zeros_before * coef_bits[0] + eob_tbl[eob] + base


def _morton(r: int, c: int) -> int:
    """z-order (coding order) index of a block within its superblock."""
    return (((r & 2) << 2) | ((c & 2) << 1) | ((r & 1) << 1) | (c & 1))


def tr_bl_avail(by: int, bx: int, gh: int, gw: int, m: int = 4,
                col_lo: int = 0, col_hi: int = 0):
    """(top-right, bottom-left) reconstructed-sample availability for a
    square block in the 64x64-SB z-order (spec intra edge availability;
    exact for square partition trees: a neighbor is available iff its
    coding (z) order precedes ours).

    (by, bx) index the block's own-size grid; ``m`` is blocks-per-SB
    side (4 for 16x16 blocks, 2 for 32x32).  col_lo/col_hi bound the
    block's TILE in the same grid units (tiles clamp prediction like
    frame edges; 0/0 = whole frame)."""
    if col_hi <= 0:
        col_hi = gw
    r, c = by & (m - 1), bx & (m - 1)
    if by == 0 or bx + 1 >= col_hi:
        tr = False
    elif r == 0:
        tr = True
    elif c == m - 1:
        tr = False
    else:
        tr = _morton(r - 1, c + 1) < _morton(r, c)
    if bx <= col_lo or by + 1 >= gh:
        bl = False
    elif c == 0:
        bl = r < m - 1
    elif r == m - 1:
        bl = False
    else:
        bl = _morton(r + 1, c - 1) < _morton(r, c)
    return tr, bl


def _gather_ext_neighbors(recon, ys, xs, n, above, left, tr_avail,
                          bl_avail):
    """Extended (2n+1) above/left arrays for zone-1/3 directional modes:
    second half gathered from recon when available, else replicated."""
    ay = jnp.maximum(ys - 1, 0)
    lx = jnp.maximum(xs - 1, 0)
    tr = _gather_block(recon, ay, xs + n, 1, n)[:, 0, :]
    tr = jnp.where(tr_avail[:, None], tr, above[:, n - 1][:, None])
    above_ext = jnp.concatenate([above, tr, tr[:, -1:]], axis=1)
    bl = _gather_block(recon, ys + n, lx, n, 1)[:, :, 0]
    bl = jnp.where(bl_avail[:, None], bl, left[:, n - 1][:, None])
    left_ext = jnp.concatenate([left, bl, bl[:, -1:]], axis=1)
    return above_ext, left_ext


def _gather_block(plane, ys, xs, h, w):
    """(B, h, w) gather at per-slot offsets via unrolled dynamic_slice
    (TPU: DS is fast, arbitrary-index Gather is not).  Starts are
    clamped in-bounds by dynamic_slice semantics."""
    return jnp.stack([
        jax.lax.dynamic_slice(plane, (ys[j], xs[j]), (h, w))
        for j in range(ys.shape[0])])


def _scatter_blocks(plane, blocks, ys, xs, valid):
    """Write (B, n, n) blocks into a (H, W) plane at per-slot offsets.

    TPU-friendly: unrolled dynamic_update_slice per slot instead of one
    big XLA Scatter (scatters serialize badly on TPU; DUS is fast).
    Invalid slots rewrite their current content (no-op)."""
    b, n, _ = blocks.shape
    for j in range(b):
        start = (ys[j], xs[j])
        cur = jax.lax.dynamic_slice(plane, start, (n, n))
        new = jnp.where(valid[j], blocks[j], cur)
        plane = jax.lax.dynamic_update_slice(plane, new, start)
    return plane


def _gather_neighbors(recon, ys, xs, n, have_above, have_left, bd=8):
    """Batched neighbor prep with spec substitution rules
    (reconintra build_intra_predictors semantics).

    recon: (H, W) int32; ys/xs: (B,) top-left coords; n: block dim."""
    b = ys.shape[0]
    base = 1 << (bd - 1)
    # raw gathers (dynamic_slice clamps in-bounds; masked later)
    ay = jnp.maximum(ys - 1, 0)
    lx = jnp.maximum(xs - 1, 0)
    above_raw = _gather_block(recon, ay, xs, 1, n)[:, 0, :]
    left_raw = _gather_block(recon, ys, lx, n, 1)[:, :, 0]
    corner_raw = _gather_block(recon, ay, lx, 1, 1)[:, 0, 0]
    above_ref0 = above_raw[:, 0]
    left_ref0 = left_raw[:, 0]
    ha = have_above[:, None]
    hl = have_left[:, None]
    # left: real | above_ref[0] | base+1
    left = jnp.where(hl, left_raw,
                     jnp.where(ha, above_ref0[:, None], base + 1))
    # above: real | left_ref[0] | base-1
    above = jnp.where(ha, above_raw,
                      jnp.where(hl, left_ref0[:, None], base - 1))
    # corner
    corner = jnp.where(have_above & have_left, corner_raw,
                       jnp.where(have_above, above_ref0,
                                 jnp.where(have_left, left_ref0, base)))
    return above, left, corner


def _rd_step(recon, src, ys, xs, valid, have_above, have_left,
             qp_arrays, lam, n, tx_size, modes, plane_type,
             tx_types=None, tr_avail=None, bl_avail=None, bd=8,
             inter=None, return_cost=False, no_write=False,
             rates=None, full_d=False, rdoq=False,
             rdoq_tbl=None, return_index=False):
    """One wave step for one plane: returns (best_mode (B,), qcoeff
    (B,kh,kw), new recon[, choose_inter (B,)]).  ys/xs: (B,) pixel
    coords (traced ok).

    tx_types: optional per-mode tx type (chroma uses the mode-implied
    type; luma signals DCT_DCT in round 1).
    tr_avail/bl_avail: (B,) bool, required when modes include zone-1/3
    directional modes.
    inter: optional (cost (B,), rec (B,n,n)) precomputed inter candidate
    per block (pipeline/inter_encoder pass A); when given, the step picks
    inter wherever its RD cost beats the best intra mode and returns the
    choice mask as a 4th output."""
    b = ys.shape[0]
    cands = [m if isinstance(m, tuple) else (m, 0) for m in modes]
    if n > 32:
        # filter-intra is illegal above 32x32 (spec FilterIntraAllowed)
        fi_drop = [c for c in cands if c[0] < cc.FI_MODE_BASE]
        if len(fi_drop) != len(cands):
            assert rates is None, \
                "rate tables must match the filtered candidate list"
            cands = fi_drop
            modes = tuple(m for m in modes
                          if (m[0] if isinstance(m, tuple) else m)
                          < cc.FI_MODE_BASE)
    above, left, corner = _gather_neighbors(recon, ys, xs, n,
                                            have_above, have_left, bd=bd)
    angles = [cand_angle(m, d) for m, d in cands]
    z13 = any(a and (a < 90 or a > 180) for a in angles)
    above_ext = left_ext = None
    if z13:
        above_ext, left_ext = _gather_ext_neighbors(
            recon, ys, xs, n, above, left, tr_avail, bl_avail)
    src_blk = _gather_block(src, ys, xs, n, n)

    zbin, rnd, qv, qshift, deq = qp_arrays
    per_block_qp = jnp.asarray(zbin).ndim == 2  # (B, 2) AQ rows
    nm_ = len(modes)
    if per_block_qp:
        # stacked mode pass: tile per-block rows across the mode axis
        qp = quant.QuantParams(*(jnp.tile(a, (nm_, 1)) for a in qp_arrays))
        lam_flat = jnp.tile(lam, nm_)
    else:
        qp = quant.QuantParams(zbin, rnd, qv, qshift, deq)
        lam_flat = lam

    # predictions for every mode (mode-specific gathers, cheap), then ONE
    # stacked transform/quant/recon pass over (n_modes*B) blocks — a much
    # smaller trace and a bigger MXU batch than per-mode pipelines
    preds = []
    same_tx = tx_types is None or len(set(tx_types)) == 1
    pred_cache = {}
    fi_list = sorted({m for m, _ in cands if m >= cc.FI_MODE_BASE})
    if fi_list:
        # all filter-intra modes share ONE wavefront pass (trace cost
        # of a single mode; modes ride the batch axis)
        fi_all = intra.filter_intra_pred_multi(
            above, left, corner,
            tuple(m - cc.FI_MODE_BASE for m in fi_list), n, n, bd)
        for k, m in enumerate(fi_list):
            pred_cache[(m, 0)] = fi_all[k]
    for mi, (mode, delta) in enumerate(cands):
        key = (mode, delta)
        if key in pred_cache:
            preds.append(pred_cache[key])
            continue
        pred = _predict_cand(mode, delta, n, above, left, corner,
                             above_ext, left_ext, have_above, have_left,
                             bd)
        pred_cache[key] = pred
        preds.append(pred)
    nm = len(modes)
    pred_all = jnp.concatenate(preds, axis=0)        # (nm*B, n, n)
    src_all = jnp.tile(src_blk, (nm, 1, 1))
    resid_all = src_all - pred_all
    if same_tx:
        tx0 = cc.DCT_DCT if tx_types is None else tx_types[0]
        if (tx_size == cc.TX_16X16 and tx0 == cc.DCT_DCT
                and not per_block_qp and _pallas_ok()):
            # VMEM-fused txfm+quant (Pallas), bit-identical on TPU
            from svt_av1_tpu.ops.pallas import fused_txq
            coeffs, qcoeff_all, dq_all = \
                fused_txq.fwd_txfm_quant_16x16_qp(resid_all, qp)
        else:
            coeffs = tf.fwd_txfm2d(resid_all, tx0, tx_size)
            qcoeff_all, dq_all = quant.quantize(coeffs, qp, tx_size)
        if rdoq and rates is not None and rdoq_tbl is not None:
            from svt_av1_tpu.ops import rdoq as rdoq_mod
            kh_, kw_ = qcoeff_all.shape[-2:]
            qcoeff_all, dq_all = rdoq_mod.optimize_levels(
                coeffs, qcoeff_all, quant.dequant_field(qp, kh_, kw_),
                tx_size, tx0, rdoq_tbl, lam_flat,
                np.float32(tf.coeff_sse_scale(tx_size, tx0)))
        if rates is not None and full_d:
            # full-RD path: true pixel distortion via the normative
            # inverse for EVERY candidate (md_stage_3 fidelity); costs
            # ~35% throughput for ~0.04 dB — quality presets only
            rec_all = tf.inv_txfm2d_add(dq_all, pred_all, tx0, tx_size,
                                        bd=bd)
            dist = jnp.sum((rec_all - src_all) ** 2,
                           axis=(1, 2)).astype(jnp.float32)
        else:
            # transform-domain distortion: pixel SSE ~ s2 * coeff-error
            # SSE (reference fast-stage shortcut); the normative inverse
            # runs only for the winning mode below
            s2 = np.float32(tf.coeff_sse_scale(tx_size, tx0))
            dist = s2 * jnp.sum(
                (coeffs - dq_all.astype(jnp.float32)) ** 2, axis=(1, 2))
            if coeffs.shape[-2:] != (n, n):
                # TX_64X64: only a 32x32 coefficient subspace is coded;
                # charge the energy the projection throws away (Parseval:
                # in-subspace energy = s2 * sum(c^2))
                resid_e = jnp.sum(
                    resid_all.astype(jnp.float32) ** 2, axis=(1, 2))
                proj_e = s2 * jnp.sum(
                    coeffs.astype(jnp.float32) ** 2, axis=(1, 2))
                dist = dist + jnp.maximum(resid_e - proj_e, 0.0)
            rec_all = None
    else:
        # group candidates by tx type: ONE fwd/quant pass per distinct
        # type over all its candidates (bigger MXU batches than a
        # per-candidate loop; the tx-search path has nm = modes * txs)
        uniq_tx = []
        for t in tx_types:
            if t not in uniq_tx:
                uniq_tx.append(t)
        qcs = [None] * nm
        dqs = [None] * nm
        dists = [None] * nm
        for t in uniq_tx:
            idxs = [i for i, tt in enumerate(tx_types) if tt == t]
            g = len(idxs)
            res_t = jnp.concatenate(
                [resid_all[i * b:(i + 1) * b] for i in idxs], axis=0)
            if per_block_qp:
                qp_t = quant.QuantParams(
                    *(jnp.tile(a, (g, 1)) for a in qp_arrays))
            else:
                qp_t = quant.QuantParams(*qp_arrays)
            s2 = np.float32(tf.coeff_sse_scale(tx_size, t))
            coeffs_t = tf.fwd_txfm2d(res_t, t, tx_size)
            qc_t, dq_t = quant.quantize(coeffs_t, qp_t, tx_size)
            if rdoq and rates is not None and rdoq_tbl is not None:
                from svt_av1_tpu.ops import rdoq as rdoq_mod
                lam_t = (jnp.tile(lam, g) if jnp.ndim(lam) else lam)
                qc_t, dq_t = rdoq_mod.optimize_levels(
                    coeffs_t, qc_t, quant.dequant_field(qp_t, n, n),
                    tx_size, t, rdoq_tbl, lam_t, s2)
            dist_t = s2 * jnp.sum(
                (coeffs_t - dq_t.astype(jnp.float32)) ** 2, axis=(1, 2))
            if coeffs_t.shape[-2:] != (n, n):
                resid_e = jnp.sum(
                    res_t.astype(jnp.float32) ** 2, axis=(1, 2))
                proj_e = s2 * jnp.sum(
                    coeffs_t.astype(jnp.float32) ** 2, axis=(1, 2))
                dist_t = dist_t + jnp.maximum(resid_e - proj_e, 0.0)
            for j, i in enumerate(idxs):
                qcs[i] = qc_t[j * b:(j + 1) * b]
                dqs[i] = dq_t[j * b:(j + 1) * b]
                dists[i] = dist_t[j * b:(j + 1) * b]
        qcoeff_all = jnp.concatenate(qcs, axis=0)
        dq_all = jnp.concatenate(dqs, axis=0)
        dist = jnp.concatenate(dists, axis=0)
        rec_all = None
    aq = jnp.abs(qcoeff_all)
    if rates is None:
        # round-1 heuristic rate proxy (fallback for light paths)
        bits = (jnp.sum(jnp.log2(1.0 + aq.astype(jnp.float32)),
                        axis=(1, 2)) * 2.0
                + jnp.sum((aq > 0), axis=(1, 2)) + 8.0)
    else:
        # CDF-derived costs (codec/rate_est.py): eob-aware coefficient
        # bits + the mode's actual signaling cost
        coef_bits, txb_base, mode_bits, eob_tbl = rates
        pos = jnp.asarray(_scan_pos(tx_size))
        bits = (_txb_bits(aq, coef_bits, txb_base[0], eob_tbl, pos)
                + jnp.repeat(mode_bits, b))
    cost = (dist + lam_flat * bits).reshape(nm, b)
    # zone-3 candidates (angle > 180) read bottom-left recon, which the
    # wavefront hasn't written yet when the spec marks BL available —
    # restrict them to blocks where both encoder and decoder replicate
    # the last left sample instead
    if bl_avail is not None:
        for mi, a in enumerate(angles):
            if a > 180:
                cost = cost.at[mi].add(
                    jnp.where(bl_avail, jnp.float32(1e18), 0.0))
    mi_best = jnp.argmin(cost, axis=0)               # (B,)
    # select via where-chains (vector selects beat TPU gathers);
    # coded coefficient dims can differ from the pixel block (TX_64X64
    # codes a 32x32 region)
    kh, kw = qcoeff_all.shape[-2:]
    q_r = qcoeff_all.reshape(nm, b, kh, kw)
    dq_r = dq_all.reshape(nm, b, kh, kw)
    p_r = pred_all.reshape(nm, b, n, n)
    best_mode = jnp.full((b,), cands[0][0], jnp.int32)
    best_q = q_r[0]
    best_dq = dq_r[0]
    best_pred = p_r[0]
    for mi in range(1, nm):
        take = mi_best == mi
        t3 = take[:, None, None]
        best_mode = jnp.where(take, cands[mi][0], best_mode)
        best_q = jnp.where(t3, q_r[mi], best_q)
        best_dq = jnp.where(t3, dq_r[mi], best_dq)
        best_pred = jnp.where(t3, p_r[mi], best_pred)
    # normative reconstruction for the winner only
    if same_tx:
        if rec_all is not None:
            r_r = rec_all.reshape(nm, b, n, n)
            best_rec = r_r[0]
            for mi in range(1, nm):
                best_rec = jnp.where((mi_best == mi)[:, None, None],
                                     r_r[mi], best_rec)
        else:
            best_rec = tf.inv_txfm2d_add(best_dq, best_pred, tx0,
                                         tx_size, bd=bd)
    else:
        # mixed candidate tx types: one inverse per DISTINCT type on the
        # selected data, picked by the winner's type
        best_rec = None
        for t in uniq_tx:
            r = tf.inv_txfm2d_add(best_dq, best_pred, t, tx_size, bd=bd)
            sel_t = jnp.zeros((b,), bool)
            for mi, tt in enumerate(tx_types):
                if tt == t:
                    sel_t = sel_t | (mi_best == mi)
            if best_rec is None:
                best_rec = r
            else:
                best_rec = jnp.where(sel_t[:, None, None], r, best_rec)
    choose = None
    if return_index:
        best_mode = mi_best.astype(jnp.int32)
    if inter is not None:
        inter_cost, inter_rec = inter
        best_cost = jnp.min(cost, axis=0)
        choose = inter_cost < best_cost
        best_rec = jnp.where(choose[:, None, None], inter_rec, best_rec)
    if no_write:
        return best_mode, best_q, best_rec, jnp.min(cost, axis=0)
    recon = _scatter_blocks(recon, best_rec, ys, xs, valid)
    if inter is not None:
        return best_mode, best_q, recon, choose
    if return_cost:
        return best_mode, best_q, recon, jnp.min(cost, axis=0)
    return best_mode, best_q, recon


def _natural_maxb(gh: int, gw: int) -> int:
    """Largest wave size under the 2:1 slope (no slot padding needed)."""
    return max(1, min(gh, (gw + 1) // 2))


def _frame_program_fn(gh, gw, modes, bd=8, aq=False, tile_starts=(0,),
                      rdoq=False, tx_search=False, angle_deltas=False,
                      cfl=False, palette=False):
    """Whole-key-frame program: fori_loop over waves, each iteration runs
    luma MD (all modes) + chroma MD and scatters recon in place.

    The wave schedule is static for (gh, gw) and baked into the program.
    Outputs are packed device-side for the host: recon in the source
    dtype, per-block decisions re-laid out from (wave, slot) into a dense
    raster (gh*gw) order, and coefficients narrowed to int16 (levels for
    16x16/8x8 transforms are bounded by 32767/dequant_min <= 16384) —
    this cuts the device->host transfer ~6x, which dominates wall time
    on a tunneled TPU.

    aq: per-block adaptive quantization — the qp fields arrive as
    (n_blocks, 2) rows and lam as (n_blocks,); each wave gathers its
    slots' rows."""
    maxb = _natural_maxb(gh, gw)
    if tx_search:
        cand_modes, cand_txs = expand_tx_cands(modes, angle_deltas)
    else:
        cand_modes, cand_txs = modes, None
    waves, bys, bxs, valid, trs, bls, hls = _schedule_arrays(
        gh, gw, maxb, tile_starts)
    nw = len(waves)
    wi, wj, wby, wbx = _wave_flat_index(waves, 0)
    perm = np.zeros(gh * gw, np.int32)
    perm[wby * gw + wbx] = wi * maxb + wj
    h, w = gh * BLK, gw * BLK
    rdt = jnp.uint8 if bd == 8 else jnp.uint16

    def frame(src_y8, src_u8, src_v8, zbin, rnd, qv, qshift, deq, lam,
              cy_t, cuv_t, txbb, modeb, uvb, eoby, eobuv, rqly, rqluv,
              pal_cost=None, pal_rec=None, pal_qy=None):
        src_y = src_y8.astype(jnp.int32)
        src_u = src_u8.astype(jnp.int32)
        src_v = src_v8.astype(jnp.int32)
        recon_y = jnp.zeros((h, w), jnp.int32)
        recon_u = jnp.zeros((h // 2, w // 2), jnp.int32)
        recon_v = jnp.zeros((h // 2, w // 2), jnp.int32)
        qp_all = (zbin, rnd, qv, qshift, deq)
        modes_acc = jnp.zeros((nw, maxb), jnp.int32)
        uv_modes_acc = jnp.zeros((nw, maxb), jnp.int32)
        qy_acc = jnp.zeros((nw, maxb, BLK, BLK), jnp.int16)
        qu_acc = jnp.zeros((nw, maxb, CBLK, CBLK), jnp.int16)
        qv_acc = jnp.zeros((nw, maxb, CBLK, CBLK), jnp.int16)
        au_acc = jnp.zeros((nw, maxb), jnp.int8)
        av_acc = jnp.zeros((nw, maxb), jnp.int8)
        pc_acc = jnp.zeros((nw, maxb), bool)

        def body(i, carry):
            (ry, ru, rv, ma, uma, qya, qua, qva, aua, ava,
             pca) = carry
            by = jnp.asarray(bys)[i]
            bx = jnp.asarray(bxs)[i]
            va = jnp.asarray(valid)[i]
            ha = (by > 0) & va
            hl = jnp.asarray(hls)[i] & va
            if aq:
                bid = by * gw + bx
                qp = tuple(f[bid] for f in qp_all)
                lam_w = lam[bid]
            else:
                qp = qp_all
                lam_w = lam
            pal_choose = jnp.zeros(va.shape, bool)
            if palette:
                bid_w = by * gw + bx
                ov = (pal_cost[bid_w], pal_rec[bid_w])
                m, q, ry, pal_choose = _rd_step(
                    ry, src_y, by * BLK, bx * BLK, va, ha, hl,
                    qp, lam_w, BLK, cc.TX_16X16, cand_modes,
                    0, tx_types=cand_txs,
                    tr_avail=jnp.asarray(trs)[i] & va,
                    bl_avail=jnp.asarray(bls)[i] & va,
                    bd=bd, rates=(cy_t, txbb, modeb, eoby),
                    rdoq=rdoq, rdoq_tbl=rqly,
                    return_index=tx_search, inter=ov)
            else:
                m, q, ry = _rd_step(
                    ry, src_y, by * BLK, bx * BLK, va, ha, hl,
                    qp, lam_w, BLK, cc.TX_16X16, cand_modes,
                    0, tx_types=cand_txs,
                    tr_avail=jnp.asarray(trs)[i] & va,
                    bl_avail=jnp.asarray(bls)[i] & va,
                    bd=bd, rates=(cy_t, txbb, modeb, eoby),
                    rdoq=rdoq, rdoq_tbl=rqly,
                    return_index=tx_search)
            # chroma: joint mode decision over U+V (one signaled uv_mode)
            if cfl:
                lblk = _gather_block(ry, by * BLK, bx * BLK, BLK, BLK)
                um, qu, qvq, ru, rv, au, av = _rd_step_chroma(
                    ru, rv, src_u, src_v, by * CBLK, bx * CBLK, va, ha,
                    hl, qp, lam_w, bd=bd,
                    rates=(cuv_t, txbb, uvb, eobuv),
                    rdoq=rdoq, rdoq_tbl=rqluv, luma_rec=lblk, cfl=True)
            else:
                um, qu, qvq, ru, rv = _rd_step_chroma(
                    ru, rv, src_u, src_v, by * CBLK, bx * CBLK, va, ha,
                    hl, qp, lam_w, bd=bd,
                    rates=(cuv_t, txbb, uvb, eobuv),
                    rdoq=rdoq, rdoq_tbl=rqluv)
                au = av = jnp.zeros(va.shape, jnp.int32)
            return (ry, ru, rv, ma.at[i].set(m), uma.at[i].set(um),
                    qya.at[i].set(q.astype(jnp.int16)),
                    qua.at[i].set(qu.astype(jnp.int16)),
                    qva.at[i].set(qvq.astype(jnp.int16)),
                    aua.at[i].set(au.astype(jnp.int8)),
                    ava.at[i].set(av.astype(jnp.int8)),
                    pca.at[i].set(pal_choose))

        init = (recon_y, recon_u, recon_v, modes_acc, uv_modes_acc,
                qy_acc, qu_acc, qv_acc, au_acc, av_acc, pc_acc)
        (ry, ru, rv, ma, uma, qya, qua, qva, aua, ava, pca) = \
            jax.lax.fori_loop(0, nw, body, init)
        # dense raster re-layout (static gather) + output narrowing
        pj = jnp.asarray(perm)
        ym = ma.reshape(-1)[pj].astype(jnp.uint8)
        um = uma.reshape(-1)[pj].astype(jnp.uint8)
        qy = qya.reshape(nw * maxb, BLK * BLK)[pj]
        qu = qua.reshape(nw * maxb, CBLK * CBLK)[pj]
        qvp = qva.reshape(nw * maxb, CBLK * CBLK)[pj]
        auf = aua.reshape(-1)[pj]
        avf = ava.reshape(-1)[pj]
        if palette:
            pchoose = pca.reshape(-1)[pj]
            ym = jnp.where(pchoose, cc.DC_PRED, ym).astype(jnp.uint8)
            qy = jnp.where(pchoose[:, None], pal_qy, qy)
            return (ry.astype(rdt), ru.astype(rdt), rv.astype(rdt),
                    ym, um, qy, qu, qvp, auf, avf, pchoose)
        return (ry.astype(rdt), ru.astype(rdt), rv.astype(rdt),
                ym, um, qy, qu, qvp, auf, avf)

    return frame


@functools.lru_cache(maxsize=None)
def _jit_frame_program(gh, gw, modes, bd=8, aq=False, tile_starts=(0,),
                       rdoq=False, tx_search=False, angle_deltas=False,
                       cfl=False, palette=False):
    return jax.jit(_frame_program_fn(gh, gw, modes, bd, aq=aq,
                                     tile_starts=tile_starts, rdoq=rdoq,
                                     tx_search=tx_search,
                                     angle_deltas=angle_deltas, cfl=cfl,
                                     palette=palette))


def _rd_step_chroma(recon_u, recon_v, src_u, src_v, ys, xs, valid,
                    have_above, have_left, qp_arrays, lam, bd=8,
                    inter=None, n=CBLK, tx_size=cc.TX_8X8,
                    return_cost=False, no_write=False, rates=None,
                    rdoq=False, rdoq_tbl=None, luma_rec=None, cfl=False,
                    uv_tx_types=None):
    """Joint U+V mode decision (uv_mode is signaled once per block); the
    chroma transform type is implied by the mode (not signaled).

    inter: optional (choose (B,), rec_u, rec_v) — blocks whose luma step
    chose the inter candidate take the precomputed inter chroma recon.
    luma_rec/cfl: (B, 2n, 2n) reconstructed luma of the SAME blocks;
    when cfl is set, a CfL candidate (least-squares alpha fit +-1
    refinement per plane, reference cfl_rd_pick_alpha role) competes
    with the regular uv modes and two extra outputs (alpha_u, alpha_v,
    signed q3) are returned.
    uv_tx_types: per-mode implied tx types; pass all-DCT for 32-pt
    chroma where ADST is illegal (defaults to UV_TX_TYPES)."""
    if uv_tx_types is None:
        uv_tx_types = UV_TX_TYPES
    zbin, rnd, qv_, qshift, deq = qp_arrays
    nm_c = len(UV_MODES)
    if jnp.asarray(zbin).ndim == 2:
        # per-block AQ rows; each (mode, plane-pair) group is 2*B blocks
        qp = quant.QuantParams(
            *(jnp.tile(a, (2, 1)) for a in qp_arrays))
        lam_flat = jnp.tile(lam, nm_c * 2)
    else:
        qp = quant.QuantParams(zbin, rnd, qv_, qshift, deq)
        lam_flat = lam
    nb_u = _gather_neighbors(recon_u, ys, xs, n, have_above, have_left,
                             bd=bd)
    nb_v = _gather_neighbors(recon_v, ys, xs, n, have_above, have_left,
                             bd=bd)
    src_ub = _gather_block(src_u, ys, xs, n, n)
    src_vb = _gather_block(src_v, ys, xs, n, n)

    # stack (mode, plane) into ONE transform/quant/recon pass: per-mode
    # tx types are distinct, but each group's fwd/inv pass is shared by
    # stacking U and V (half the pipeline passes, bigger MXU batches)
    b = ys.shape[0]
    nm = len(UV_MODES)
    preds = []
    for mode in UV_MODES:
        for (above, left, corner), src_blk in ((nb_u, src_ub),
                                               (nb_v, src_vb)):
            preds.append(intra.predict(mode, above, left, corner, n, n,
                                       have_above=have_above,
                                       have_left=have_left, bd=bd))
    pred_all = jnp.concatenate(preds, axis=0)        # (nm*2*B, n, n)
    src_all = jnp.tile(jnp.concatenate([src_ub, src_vb], axis=0),
                       (nm, 1, 1))
    resid_all = src_all - pred_all
    qcs, recs = [], []
    for mi, tx_type in enumerate(uv_tx_types):
        sl = slice(mi * 2 * b, (mi + 1) * 2 * b)
        coeffs = tf.fwd_txfm2d(resid_all[sl], tx_type, tx_size)
        qc, dq = quant.quantize(coeffs, qp, tx_size)
        if rdoq and rates is not None and rdoq_tbl is not None:
            from svt_av1_tpu.ops import rdoq as rdoq_mod
            lam_sl = lam_flat[sl] if jnp.ndim(lam_flat) else lam_flat
            qc, dq = rdoq_mod.optimize_levels(
                coeffs, qc, quant.dequant_field(qp, n, n), tx_size,
                tx_type, rdoq_tbl, lam_sl,
                np.float32(tf.coeff_sse_scale(tx_size, tx_type)))
        recs.append(tf.inv_txfm2d_add(dq, pred_all[sl], tx_type, tx_size,
                                      bd=bd))
        qcs.append(qc)
    qcoeff_all = jnp.concatenate(qcs, axis=0)
    rec_all = jnp.concatenate(recs, axis=0)
    dist = jnp.sum((rec_all - src_all) ** 2, axis=(1, 2)).astype(
        jnp.float32)
    aq = jnp.abs(qcoeff_all)
    if rates is None:
        bits = (jnp.sum(jnp.log2(1.0 + aq.astype(jnp.float32)),
                        axis=(1, 2)) * 2.0
                + jnp.sum((aq > 0), axis=(1, 2)) + 4.0)
        cost_uv = (dist + lam_flat * bits).reshape(nm, 2, b).sum(axis=1)
    else:
        coef_bits, txb_base, uv_bits, eob_tbl = rates
        pos = jnp.asarray(_scan_pos(tx_size))
        bits = _txb_bits(aq, coef_bits, txb_base[1], eob_tbl, pos)
        cost_uv = (dist + lam_flat * bits).reshape(nm, 2, b).sum(axis=1)
        cost_uv = cost_uv + lam * uv_bits[:, None]
    mi_best = jnp.argmin(cost_uv, axis=0)
    qall = qcoeff_all.reshape(nm, 2, b, n, n)
    rall = rec_all.reshape(nm, 2, b, n, n)
    um = jnp.full((b,), UV_MODES[0], jnp.int32)
    qu, qvq = qall[0, 0], qall[0, 1]
    rec_u, rec_v = rall[0, 0], rall[0, 1]
    for mi in range(1, nm):
        take = mi_best == mi
        t3 = take[:, None, None]
        um = jnp.where(take, UV_MODES[mi], um)
        qu = jnp.where(t3, qall[mi, 0], qu)
        qvq = jnp.where(t3, qall[mi, 1], qvq)
        rec_u = jnp.where(t3, rall[mi, 0], rec_u)
        rec_v = jnp.where(t3, rall[mi, 1], rec_v)
    alpha_u = alpha_v = None
    if cfl and luma_rec is not None and rates is not None:
        ac = intra.cfl_ac_420(luma_rec, n, n)                 # (B,n,n) q3
        dc_u, dc_v = preds[0], preds[1]                       # DC preds
        acf = ac.astype(jnp.float32)
        den = jnp.sum(acf * acf, axis=(1, 2)) + jnp.float32(1e-6)

        def fit(src_blk, dc):
            resid = (src_blk - dc).astype(jnp.float32)
            a = jnp.round(64.0 * jnp.sum(resid * acf, axis=(1, 2)) / den)
            return jnp.clip(a.astype(jnp.int32), -16, 16)

        a0_u, a0_v = fit(src_ub, dc_u), fit(src_vb, dc_v)
        coef_bits, txb_base, uv_bits, eob_tbl = rates
        pos = jnp.asarray(_scan_pos(tx_size))
        lam_pair = lam_flat[:2 * b] if jnp.ndim(lam_flat) else lam_flat
        lam_b = lam_pair[:b] if jnp.ndim(lam_pair) else lam_pair
        dc_pair = jnp.concatenate([dc_u, dc_v], axis=0)
        src_pair = jnp.concatenate([src_ub, src_vb], axis=0)
        ac_pair = jnp.concatenate([ac, ac], axis=0)
        a0_pair = jnp.concatenate([a0_u, a0_v], axis=0)
        costs_o, qs_o, recs_o, alphas_o = [], [], [], []
        for off in (-1, 0, 1):
            a_try = jnp.clip(a0_pair + off, -16, 16)
            pred_c = intra.cfl_predict(dc_pair, ac_pair, a_try, bd=bd)
            coeffs_c = tf.fwd_txfm2d(src_pair - pred_c, cc.DCT_DCT,
                                     tx_size)
            qc_c, dq_c = quant.quantize(coeffs_c, qp, tx_size)
            rec_c = tf.inv_txfm2d_add(dq_c, pred_c, cc.DCT_DCT, tx_size,
                                      bd=bd)
            d_c = jnp.sum((rec_c - src_pair) ** 2,
                          axis=(1, 2)).astype(jnp.float32)
            bits_c = _txb_bits(jnp.abs(qc_c), coef_bits, txb_base[1],
                               eob_tbl, pos)
            costs_o.append(d_c + lam_pair * bits_c)
            qs_o.append(qc_c)
            recs_o.append(rec_c)
            alphas_o.append(a_try)
        co = jnp.stack(costs_o)                               # (3, 2B)
        oi = jnp.argmin(co, axis=0)                           # (2B,)
        cost_c = jnp.min(co, axis=0)
        q_sel = qs_o[0]
        rec_sel = recs_o[0]
        a_sel = alphas_o[0]
        for k in (1, 2):
            tk = oi == k
            q_sel = jnp.where(tk[:, None, None], qs_o[k], q_sel)
            rec_sel = jnp.where(tk[:, None, None], recs_o[k], rec_sel)
            a_sel = jnp.where(tk, alphas_o[k], a_sel)
        au_s, av_s = a_sel[:b], a_sel[b:]
        cfl_cost = cost_c[:b] + cost_c[b:]
        # joint sign (0,0) is not codable; DC_PRED covers that case
        cfl_cost = cfl_cost + jnp.where((au_s == 0) & (av_s == 0),
                                        jnp.float32(1e18), 0.0)
        best_uv = jnp.min(cost_uv, axis=0)
        take_c = cfl_cost < best_uv
        t3c = take_c[:, None, None]
        um = jnp.where(take_c, cc.UV_CFL_PRED, um)
        qu = jnp.where(t3c, q_sel[:b], qu)
        qvq = jnp.where(t3c, q_sel[b:], qvq)
        rec_u = jnp.where(t3c, rec_sel[:b], rec_u)
        rec_v = jnp.where(t3c, rec_sel[b:], rec_v)
        alpha_u = jnp.where(take_c, au_s, 0)
        alpha_v = jnp.where(take_c, av_s, 0)
    if inter is not None:
        choose, irec_u, irec_v = inter
        c3 = choose[:, None, None]
        rec_u = jnp.where(c3, irec_u, rec_u)
        rec_v = jnp.where(c3, irec_v, rec_v)
        if cfl:
            alpha_u = jnp.where(choose, 0, alpha_u)
            alpha_v = jnp.where(choose, 0, alpha_v)
            um = jnp.where(choose, UV_MODES[0], um)
    if no_write:
        if cfl:
            return um, qu, qvq, rec_u, rec_v, alpha_u, alpha_v
        return um, qu, qvq, rec_u, rec_v
    recon_u = _scatter_blocks(recon_u, rec_u, ys, xs, valid)
    recon_v = _scatter_blocks(recon_v, rec_v, ys, xs, valid)
    if cfl:
        return um, qu, qvq, recon_u, recon_v, alpha_u, alpha_v
    return um, qu, qvq, recon_u, recon_v


def _wave_schedule(gh: int, gw: int, maxb: int):
    """2:1 wavefront: wave k = 2*by + bx.

    The slope matters for conformance: a block may read recon from its
    above row, left column AND top-right block (zone-1 directional
    modes).  With k = 2*by + bx every readable neighbor lands in a
    strictly earlier wave (above: k-2, left: k-1, top-right: k-1) — a
    plain anti-diagonal would place the top-right in the SAME wave and
    the encoder would predict from unwritten recon, diverging from the
    decoder's z-order reconstruction.  Bottom-left readers (D203) are
    instead masked to blocks where the spec marks BL unavailable."""
    waves = []
    for k in range(2 * gh + gw - 2):
        blocks = [(by, k - 2 * by)
                  for by in range(max(0, (k - gw + 1 + 1) // 2),
                                  min(gh, k // 2 + 1))
                  if 0 <= k - 2 * by < gw]
        if not blocks:
            continue
        for i in range(0, len(blocks), maxb):
            waves.append(blocks[i:i + maxb])
    return waves


@functools.lru_cache(maxsize=None)
def _jit_frame_program_batch(gh, gw, modes, bd=8, tile_starts=(0,),
                             rdoq=False, tx_search=False,
                             angle_deltas=False, cfl=False):
    """vmap of the frame program over a leading frame axis — all-intra
    frames are independent, so a batch shares one device dispatch
    (amortizes host<->device transfers; also the multi-stream shape)."""
    single = _frame_program_fn(gh, gw, modes, bd,
                               tile_starts=tile_starts, rdoq=rdoq,
                               tx_search=tx_search,
                               angle_deltas=angle_deltas, cfl=cfl)

    def batched(sy, su, sv, zbin, rnd, qv, qshift, deq, lam,
                cy_t, cuv_t, txbb, modeb, uvb, eoby, eobuv, rqly,
                rqluv):
        return jax.vmap(
            lambda a, b, c: single(a, b, c, zbin, rnd, qv, qshift, deq,
                                   lam, cy_t, cuv_t, txbb, modeb, uvb,
                                   eoby, eobuv, rqly, rqluv)
        )(sy, su, sv)

    return jax.jit(batched)


def encode_intra_frames_launch(frames, qindex: int, modes=MODES,
                               bd: int = 8, tile_starts=(0,),
                               rdoq=False, tx_search=False,
                               angle_deltas=False, cfl=False,
                               exact_rates=False):
    """Asynchronously dispatch the batched frame program (JAX dispatch
    is non-blocking); pair with encode_intra_frames_finish.  Enables
    host EC of batch k to overlap device compute of batch k+1."""
    h, w = frames[0][0].shape
    assert h % BLK == 0 and w % BLK == 0
    gh, gw = h // BLK, w // BLK
    qp_y = quant.make_quant_params(qindex, bd=bd)
    qstep = quant.dc_q(qindex, bd=bd) / 8.0
    lam = np.float32(0.7 * qstep * qstep)
    prog = _jit_frame_program_batch(gh, gw, tuple(modes), bd,
                                    tuple(tile_starts), rdoq=rdoq,
                                    tx_search=tx_search,
                                    angle_deltas=angle_deltas, cfl=cfl)
    sdt = np.uint8 if bd == 8 else np.uint16
    sy = np.stack([f[0] for f in frames]).astype(sdt)
    su = np.stack([f[1] for f in frames]).astype(sdt)
    sv = np.stack([f[2] for f in frames]).astype(sdt)
    from svt_av1_tpu.codec.rate_est import md_rate_args
    if tx_search:
        cand_modes, cand_txs = expand_tx_cands(tuple(modes),
                                               angle_deltas)
        cands = [(m, d, t) for (m, d), t in zip(cand_modes, cand_txs)]
        mode_ids = tuple(m for m, _ in cand_modes)
    else:
        mode_ids, cands = tuple(modes), None
    rt = md_rate_args(qindex, mode_ids, UV_MODES, exact=exact_rates)
    out = prog(sy, su, sv, *(np.asarray(a) for a in qp_y), lam, *rt)
    return (out, gh, gw, len(frames), bd, cands)


def encode_intra_frames(frames, qindex: int, modes=MODES, bd: int = 8,
                        as_arrays: bool = False, tx_search=False):
    """Batched all-intra encode: frames = [(y, u, v), ...] (same dims).
    Returns [(decisions, recon), ...].  One device program for the whole
    batch.  With ``as_arrays`` the decisions come back as the grid-array
    bundle consumed by the C tile encoder (no per-block Python objects)."""
    pending = encode_intra_frames_launch(frames, qindex, modes, bd,
                                         tx_search=tx_search)
    return encode_intra_frames_finish(pending, as_arrays)


def encode_intra_frames_finish(pending, as_arrays: bool = False):
    out, gh, gw, nf, bd, cands = pending
    (ry, ru, rv, ym_a, um_a, qy_a, qu_a, qv_a, au_a, av_a) = \
        [np.asarray(o) for o in out]
    results = []
    for fi in range(nf):
        recon = dict(y=ry[fi], u=ru[fi], v=rv[fi])
        if as_arrays:
            assert cands is None, "array path: no tx search yet"
            results.append(((ym_a[fi], um_a[fi], qy_a[fi], qu_a[fi],
                             qv_a[fi], gh, gw), recon))
        else:
            decisions = _collect_decisions_dense(
                gh, gw, ym_a[fi], um_a[fi], qy_a[fi], qu_a[fi], qv_a[fi],
                cands=cands, au=au_a[fi], av=av_a[fi])
            results.append((decisions, recon))
    return results


def _wave_flat_index(waves, maxb):
    """(wave_i, wave_j, by, bx) flat vectors over all scheduled blocks."""
    wi, wj, wby, wbx = [], [], [], []
    for i, wave in enumerate(waves):
        for j, (by, bx) in enumerate(wave):
            wi.append(i)
            wj.append(j)
            wby.append(by)
            wbx.append(bx)
    return (np.array(wi), np.array(wj), np.array(wby), np.array(wbx))


def _tile_bounds_of(bx: int, tile_starts) -> Tuple[int, int]:
    """(col_lo, col_hi) of the tile containing block column bx;
    tile_starts: ascending block-column starts, first must be 0."""
    lo, hi = 0, 10 ** 9
    for s in tile_starts:
        if s <= bx:
            lo = s
        else:
            hi = s
            break
    return lo, hi


def _schedule_arrays(gh, gw, maxb, tile_starts=(0,)):
    """Wave schedule + per-slot availability.  tile_starts: block-column
    starts of tile columns (tiles clamp left/top-right/bottom-left
    availability like frame edges)."""
    waves = _wave_schedule(gh, gw, maxb)
    nw = len(waves)
    bys = np.zeros((nw, maxb), np.int32)
    bxs = np.zeros((nw, maxb), np.int32)
    valid = np.zeros((nw, maxb), bool)
    trs = np.zeros((nw, maxb), bool)
    bls = np.zeros((nw, maxb), bool)
    hls = np.zeros((nw, maxb), bool)
    starts = set(tile_starts)
    for i, wave in enumerate(waves):
        nb = len(wave)
        bys[i, :nb] = [b[0] for b in wave]
        bxs[i, :nb] = [b[1] for b in wave]
        valid[i, :nb] = True
        for j, (by, bx) in enumerate(wave):
            lo, hi = _tile_bounds_of(bx, tile_starts)
            trs[i, j], bls[i, j] = tr_bl_avail(by, bx, gh, gw,
                                               col_lo=lo,
                                               col_hi=min(hi, gw))
            hls[i, j] = bx > 0 and bx not in starts
    return waves, bys, bxs, valid, trs, bls, hls


def split_fi_mode(m: int):
    """(y_mode, filter_intra_mode) from an MD mode id (pseudo-modes
    >= FI_MODE_BASE signal as DC + filter_intra_mode)."""
    if m >= cc.FI_MODE_BASE:
        return cc.DC_PRED, m - cc.FI_MODE_BASE
    return m, -1


def _collect_decisions_dense(gh, gw, ym, um, qy, qu, qv_,
                             qmap=None, cands=None, au=None, av=None):
    """Build per-block BlockDecisions from dense raster (gh*gw) arrays.

    cands: optional [(mode, tx_type)] list — ym then holds candidate
    INDICES (tx-search programs) rather than modes."""
    qy = qy.astype(np.int32).reshape(gh * gw, BLK, BLK)
    qu = qu.astype(np.int32).reshape(gh * gw, CBLK, CBLK)
    qv_ = qv_.astype(np.int32).reshape(gh * gw, CBLK, CBLK)
    decisions = {}
    for by in range(gh):
        for bx in range(gw):
            bid = by * gw + bx
            r4, c4 = by * (BLK >> 2), bx * (BLK >> 2)
            if cands is not None:
                y_mode, adelta, tx_type = cands[int(ym[bid])]
            else:
                y_mode, adelta, tx_type = int(ym[bid]), 0, cc.DCT_DCT
            y_mode, fi = split_fi_mode(int(y_mode))
            decisions[(r4, c4)] = BlockDecision(
                r4=r4, c4=c4, bsize=cc.BLOCK_16X16,
                y_mode=int(y_mode), uv_mode=int(um[bid]),
                tx_type=int(tx_type), qcoeff_y=qy[bid],
                qcoeff_u=qu[bid], qcoeff_v=qv_[bid],
                angle_delta_y=int(adelta), filter_intra_mode=fi,
                cfl_alpha_u=(int(au[bid]) if au is not None else 0),
                cfl_alpha_v=(int(av[bid]) if av is not None else 0),
                qindex=(int(qmap[by // 4, bx // 4])
                        if qmap is not None else 0))
    return decisions


def palette_md_candidates(src_y: np.ndarray, qindex: int, bd: int = 8,
                          max_colors: int = 8):
    """Per-16x16 palette candidates for screen content: blocks whose
    pixels use <= max_colors distinct values get an exact palette, the
    argmin index map, and a device-batch RD evaluation (pred -> DCT ->
    quant -> dist + rate + header-bits estimate).

    Returns None when no block qualifies, else (cost (nb,), rec
    (nb,16,16) i32, qy (nb,256) i16, info {bid: (colors, cmap)}).
    Behavioral reference: palette_rd_y / av1_k_means (palette.c) —
    redesigned: exact palettes only, batched RD on device."""
    from svt_av1_tpu.codec import palette as pal
    h, w = src_y.shape
    gh, gw = h // BLK, w // BLK
    nb = gh * gw
    src = np.asarray(src_y)
    info = {}
    preds = np.zeros((nb, BLK, BLK), np.int32)
    use = np.zeros(nb, bool)
    hdr_bits = np.zeros(nb, np.float32)
    for by in range(gh):
        for bx in range(gw):
            blk = src[by * BLK:(by + 1) * BLK, bx * BLK:(bx + 1) * BLK]
            colors, counts = np.unique(blk, return_counts=True)
            if not (pal.PALETTE_MIN_SIZE <= len(colors) <= max_colors):
                continue
            bid = by * gw + bx
            cmap = np.searchsorted(colors, blk).astype(np.uint8)
            info[bid] = (colors.astype(np.uint16), cmap)
            preds[bid] = colors[cmap].astype(np.int32)
            use[bid] = True
            hdr_bits[bid] = (4.0 + len(colors) * (bd - 2)
                             + pal.map_bits_estimate(cmap, len(colors)))
    if not use.any():
        return None
    qp = quant.make_quant_params(qindex, bd=bd)
    qstep = quant.dc_q(qindex, bd=bd) / 8.0
    lam = np.float32(0.7 * qstep * qstep)
    resid = (src.reshape(gh, BLK, gw, BLK).transpose(0, 2, 1, 3)
             .reshape(nb, BLK, BLK).astype(np.int32) - preds)
    cf = tf.fwd_txfm2d(jnp.asarray(resid), cc.DCT_DCT, cc.TX_16X16)
    qc, dq = quant.quantize(cf, quant.QuantParams(
        *(jnp.asarray(a) for a in qp)), cc.TX_16X16)
    s2 = np.float32(tf.coeff_sse_scale(cc.TX_16X16, cc.DCT_DCT))
    dist = s2 * jnp.sum((cf - dq.astype(jnp.float32)) ** 2,
                        axis=(1, 2))
    af = jnp.abs(qc).astype(jnp.float32)
    coef_bits = (2.0 * jnp.sum(jnp.log2(1.0 + af), axis=(1, 2))
                 + jnp.sum(af > 0, axis=(1, 2)) + 4.0)
    rec = tf.inv_txfm2d_add(dq, jnp.asarray(preds), cc.DCT_DCT,
                            cc.TX_16X16, bd=bd)
    cost = np.asarray(dist) + lam * (np.asarray(coef_bits) + hdr_bits)
    cost = np.where(use, cost, np.float32(3.0e38))
    qy = np.asarray(qc, np.int16).reshape(nb, BLK * BLK)
    return (cost.astype(np.float32), np.asarray(rec, np.int32),
            qy, info)


def encode_intra_frame(src_y: np.ndarray, src_u: np.ndarray,
                       src_v: np.ndarray, qindex: int, modes=MODES,
                       bd: int = 8, qmap=None, rdoq=False,
                       tx_search=False, angle_deltas=False, cfl=False,
                       exact_rates=False, palette_cands=None
                       ) -> Tuple[Dict, Dict[str, np.ndarray]]:
    """Encode one key frame.  Returns ({(r4,c4): BlockDecision}, recon).

    The entire frame is ONE device program (fori_loop over waves); the
    only host work is building the static wave schedule and pulling the
    per-block results for entropy coding.

    qmap: optional (sb_rows, sb_cols) int array of per-64x64 qindex
    values (adaptive quantization); None = uniform ``qindex``."""
    h, w = src_y.shape
    assert h % BLK == 0 and w % BLK == 0, "round 1: dims multiple of 16"
    gh, gw = h // BLK, w // BLK

    aq = qmap is not None
    if aq:
        nb = gh * gw
        fields = [np.zeros((nb, 2), np.int32) for _ in range(5)]
        lam = np.zeros(nb, np.float32)
        for by in range(gh):
            for bx in range(gw):
                q = int(qmap[by // 4, bx // 4])
                qp_b = quant.make_quant_params(q, bd=bd)
                bid = by * gw + bx
                for fi in range(5):
                    fields[fi][bid] = qp_b[fi]
                qs = quant.dc_q(q, bd=bd) / 8.0
                lam[bid] = 0.7 * qs * qs
        qp_y = tuple(fields)
    else:
        qp_y = quant.make_quant_params(qindex, bd=bd)
        qstep = quant.dc_q(qindex, bd=bd) / 8.0
        lam = np.float32(0.7 * qstep * qstep)

    sdt = np.uint8 if bd == 8 else np.uint16
    use_pal = palette_cands is not None
    prog = _jit_frame_program(gh, gw, tuple(modes), bd, aq=aq,
                              rdoq=rdoq, tx_search=tx_search,
                              angle_deltas=angle_deltas, cfl=cfl,
                              palette=use_pal)
    from svt_av1_tpu.codec.rate_est import md_rate_args
    if tx_search:
        cand_modes, cand_txs = expand_tx_cands(tuple(modes),
                                               angle_deltas)
        cands = [(m, d, t) for (m, d), t in zip(cand_modes, cand_txs)]
        mode_ids = tuple(m for m, _ in cand_modes)
    else:
        mode_ids, cands = tuple(modes), None
    rt = md_rate_args(qindex, mode_ids, UV_MODES, exact=exact_rates)
    extra = ()
    if use_pal:
        pc, prc, pqy, pinfo = palette_cands
        extra = (pc, prc, pqy.astype(np.int16))
    out = prog(np.asarray(src_y, sdt), np.asarray(src_u, sdt),
               np.asarray(src_v, sdt),
               *(np.asarray(a) for a in qp_y), np.asarray(lam), *rt,
               *extra)
    if use_pal:
        (recon_y, recon_u, recon_v, ym_a, um_a, qy_a, qu_a, qv_a,
         au_a, av_a, pchoose) = [np.asarray(o) for o in out]
    else:
        (recon_y, recon_u, recon_v, ym_a, um_a, qy_a, qu_a, qv_a,
         au_a, av_a) = [np.asarray(o) for o in out]
    decisions = _collect_decisions_dense(gh, gw, ym_a, um_a, qy_a, qu_a,
                                         qv_a, qmap=qmap, cands=cands,
                                         au=au_a, av=av_a)
    if use_pal:
        import dataclasses as _dc
        for bid, (colors, cmap) in pinfo.items():
            if not pchoose[bid]:
                continue
            by, bx = bid // gw, bid % gw
            k = (by * 4, bx * 4)
            decisions[k] = _dc.replace(
                decisions[k], y_mode=cc.DC_PRED, tx_type=cc.DCT_DCT,
                angle_delta_y=0, filter_intra_mode=-1,
                palette=colors, palette_map=cmap)
    recon = dict(y=recon_y, u=recon_u, v=recon_v)
    return decisions, recon


def apply_loop_filter(recon: Dict[str, np.ndarray], fp) -> Dict[str, np.ndarray]:
    """In-loop deblocking for the round-1 uniform grid (16x16 luma /
    8x8 chroma).  Used identically by encoder and verification decoder.
    Bit depth follows the recon dtype (uint8 -> 8, uint16 -> 10)."""
    from svt_av1_tpu.ops import dlf
    out = dict(recon)
    dt = recon["y"].dtype
    bd = 8 if dt == np.uint8 else 10
    ly = fp.filter_level[0]
    if ly > 0:
        y = dlf.loop_filter_plane_uniform(
            recon["y"].astype(np.int32), BLK, ly, fp.sharpness, 14, bd)
        out["y"] = np.asarray(y).astype(dt)
    lu, lv = fp.filter_level_uv
    if lu > 0:
        u = dlf.loop_filter_plane_uniform(
            recon["u"].astype(np.int32), CBLK, lu, fp.sharpness, 6, bd)
        out["u"] = np.asarray(u).astype(dt)
    if lv > 0:
        v = dlf.loop_filter_plane_uniform(
            recon["v"].astype(np.int32), CBLK, lv, fp.sharpness, 6, bd)
        out["v"] = np.asarray(v).astype(dt)
    return out


def reconstruct_from_decisions(decisions: Dict, width: int, height: int,
                               qindex: int, bd: int = 8,
                               tile_starts=(0,)
                               ) -> Dict[str, np.ndarray]:
    """Decoder-side reconstruction from parsed BlockDecisions — shares the
    same wave pipeline ops (used by the verification decoder).  Handles
    mixed square leaf sizes (16/32) by walking SBs in z-order.

    tile_starts: tile-column starts in 16px-block units; tiles clamp
    intra prediction availability like frame edges."""
    from svt_av1_tpu.codec.syntax import MAX_TX, max_chroma_tx_size
    from svt_av1_tpu.codec.syntax import _chroma_tx_type
    mi_rows, mi_cols = height // 4, width // 4
    qp = quant.make_quant_params(qindex, bd=bd)
    state = dict(y=jnp.zeros((height, width), jnp.int32),
                 u=jnp.zeros((height // 2, width // 2), jnp.int32),
                 v=jnp.zeros((height // 2, width // 2), jnp.int32))

    def leaf(d):
        n = int(cc.block_size_wide[d.bsize])
        n4 = n >> 2
        m = 16 // n4
        gh_n, gw_n = height // n, width // n
        bx_n = d.c4 // n4
        lo16, hi16 = _tile_bounds_of(d.c4 // 4, tile_starts)
        lo_n = lo16 * 16 // n
        hi_n = min(hi16 * 16 // n if hi16 < 10 ** 9 else gw_n, gw_n)
        tr, bl = tr_bl_avail(d.r4 // n4, bx_n, gh_n, gw_n, m=m,
                             col_lo=lo_n, col_hi=hi_n)
        tile_left = bx_n > lo_n
        tx = MAX_TX[d.bsize]
        qp_b = (quant.make_quant_params(d.qindex, bd=bd)
                if d.qindex else qp)
        y_md_mode = (cc.FI_MODE_BASE + d.filter_intra_mode
                     if d.filter_intra_mode >= 0 else d.y_mode)
        if getattr(d, "palette", None) is not None:
            # palette luma: pred = colors[index map], residual as usual
            pred = np.asarray(d.palette, np.int32)[
                np.asarray(d.palette_map, np.int32)]
            dq = quant.dequantize(
                jnp.asarray(d.qcoeff_y, jnp.int32)[None],
                quant.QuantParams(*(jnp.asarray(a) for a in qp_b)), tx)
            rec = tf.inv_txfm2d_add(dq, jnp.asarray(pred)[None],
                                    cc.DCT_DCT, tx, bd=bd)[0]
            state["y"] = state["y"].at[
                d.r4 * 4:d.r4 * 4 + n,
                d.c4 * 4:d.c4 * 4 + n].set(rec)
        else:
            state["y"] = _recon_block(state["y"], d.qcoeff_y, y_md_mode,
                                      d.r4 * 4, d.c4 * 4, n, tx,
                                      d.tx_type,
                                      qp_b, tr, bl, bd,
                                      have_left=tile_left,
                                      delta=d.angle_delta_y)
        ctx_tx = max_chroma_tx_size(d.bsize)
        cn = n >> 1
        uv_tx = _chroma_tx_type(d.uv_mode, ctx_tx)
        if d.uv_mode == cc.UV_CFL_PRED:
            lblk = np.asarray(state["y"])[d.r4 * 4:d.r4 * 4 + n,
                                          d.c4 * 4:d.c4 * 4 + n]
            for p, alpha in (("u", d.cfl_alpha_u), ("v", d.cfl_alpha_v)):
                q = d.qcoeff_u if p == "u" else d.qcoeff_v
                state[p] = _recon_block_cfl(
                    state[p], lblk, q, d.r4 * 2, d.c4 * 2, cn, ctx_tx,
                    alpha, qp_b, bd=bd, have_left=tile_left)
        else:
            for p in ("u", "v"):
                q = d.qcoeff_u if p == "u" else d.qcoeff_v
                state[p] = _recon_block(state[p], q, d.uv_mode, d.r4 * 2,
                                        d.c4 * 2, cn, ctx_tx, uv_tx, qp_b,
                                        bd=bd, have_left=tile_left)

    def walk(r4, c4, size):
        if r4 >= mi_rows or c4 >= mi_cols:
            return
        d = decisions.get((r4, c4))
        if d is not None and int(cc.block_size_wide[d.bsize]) == size:
            leaf(d)
            return
        half = size >> 3  # mi units of half block
        walk(r4, c4, size >> 1)
        walk(r4, c4 + half, size >> 1)
        walk(r4 + half, c4, size >> 1)
        walk(r4 + half, c4 + half, size >> 1)

    for sb_r in range(0, mi_rows, 16):
        for sb_c in range(0, mi_cols, 16):
            walk(sb_r, sb_c, 64)
    dt = np.uint8 if bd == 8 else np.uint16
    return dict(y=np.asarray(state["y"]).astype(dt),
                u=np.asarray(state["u"]).astype(dt),
                v=np.asarray(state["v"]).astype(dt))


@functools.lru_cache(maxsize=None)
def _jit_recon_block(n, tx_size, tx_type, mode, bd=8, delta=0):
    def f(recon, q, ys, xs, have_above, have_left, tr_avail, bl_avail,
          zbin, rnd, qv, qshift, deq):
        qp = quant.QuantParams(zbin, rnd, qv, qshift, deq)
        above, left, corner = _gather_neighbors(recon, ys, xs, n,
                                                have_above, have_left,
                                                bd=bd)
        a = cand_angle(mode, delta)
        above_ext = left_ext = None
        if a and (a < 90 or a > 180):
            above_ext, left_ext = _gather_ext_neighbors(
                recon, ys, xs, n, above, left, tr_avail, bl_avail)
        pred = _predict_cand(mode, delta, n, above, left, corner,
                             above_ext, left_ext, have_above, have_left,
                             bd)
        dq = quant.dequantize(q[None], qp, tx_size)
        rec = tf.inv_txfm2d_add(dq, pred, tx_type, tx_size, bd=bd)[0]
        return jax.lax.dynamic_update_slice(recon, rec, (ys[0], xs[0]))
    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _jit_recon_block_cfl(n, tx_size, bd=8):
    def f(recon, luma_blk, q, ys, xs, have_above, have_left, alpha,
          zbin, rnd, qv, qshift, deq):
        qp = quant.QuantParams(zbin, rnd, qv, qshift, deq)
        above, left, corner = _gather_neighbors(recon, ys, xs, n,
                                                have_above, have_left,
                                                bd=bd)
        dc = intra.predict(cc.DC_PRED, above, left, corner, n, n,
                           have_above=have_above, have_left=have_left,
                           bd=bd)
        ac = intra.cfl_ac_420(luma_blk[None], n, n)
        pred = intra.cfl_predict(dc, ac, alpha, bd=bd)
        dq = quant.dequantize(q[None], qp, tx_size)
        rec = tf.inv_txfm2d_add(dq, pred, cc.DCT_DCT, tx_size, bd=bd)[0]
        return jax.lax.dynamic_update_slice(recon, rec, (ys[0], xs[0]))
    return jax.jit(f)


def _recon_block_cfl(recon, luma_blk, q, y, x, n, tx_size, alpha, qp,
                     bd=8, have_left=None):
    f = _jit_recon_block_cfl(n, tx_size, bd)
    if have_left is None:
        have_left = x > 0
    return f(recon, jnp.asarray(luma_blk.astype(np.int32)),
             jnp.asarray(q),
             jnp.full((1,), y, jnp.int32), jnp.full((1,), x, jnp.int32),
             jnp.full((1,), y > 0), jnp.full((1,), have_left),
             jnp.int32(alpha), *(jnp.asarray(a) for a in qp))


def _recon_block(recon, q, mode, y, x, n, tx_size, tx_type, qp,
                 tr=False, bl=False, bd=8, have_left=None, delta=0):
    f = _jit_recon_block(n, tx_size, tx_type, int(mode), bd,
                         int(delta))
    if have_left is None:
        have_left = x > 0
    return f(recon, jnp.asarray(q),
             jnp.full((1,), y, jnp.int32), jnp.full((1,), x, jnp.int32),
             jnp.full((1,), y > 0), jnp.full((1,), have_left),
             jnp.full((1,), tr), jnp.full((1,), bl),
             *(jnp.asarray(a) for a in qp))
