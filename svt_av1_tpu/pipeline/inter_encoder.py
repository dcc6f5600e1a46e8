"""Inter (P) frame encoder: two-pass TPU mode decision.

TPU-first redesign of the reference's inter MD funnel
(product_coding_loop.c MD stages + inter_prediction.c): instead of a
per-block candidate loop, the frame runs as two device programs:

  Pass A (fully parallel, one dispatch): every 16x16 block evaluates its
  inter candidates {ZERO, HME} — motion compensation, DCT, quantize,
  reconstruct, RD — with no in-frame dependencies, so the whole frame is
  one giant MXU batch.

  Pass B (wavefront): the intra wave program (pipeline/intra_encoder)
  extended with the precomputed inter candidate: each block picks
  inter-vs-best-intra by RD and scatters the chosen reconstruction, so
  later intra blocks predict from the true mixed recon.

The entropy stage (codec/syntax.py) later maps each chosen MV to the
cheapest legal signaling (NEARESTMV/NEARMV/GLOBALMV/NEWMV) against the
normative MV stack — the RD here never needs the stack because the
reconstruction depends only on the MV value, not its coding."""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.codec.syntax import BlockDecision, _chroma_tx_type
from svt_av1_tpu.ops import mc, quant, transforms as tf
from svt_av1_tpu.pipeline import me as me_pipe
from svt_av1_tpu.pipeline.intra_encoder import (
    BLK, CBLK, MODES, _rd_step, _rd_step_chroma, _schedule_arrays,
    _recon_block, tr_bl_avail)

# candidate MV offsets around the HME winner (1/8 pel): the fullpel
# winner plus its quarter-pel ring, plus the zero MV
_SUBPEL_RING = np.array(
    [(0, 0), (0, 2), (0, -2), (2, 0), (-2, 0),
     (2, 2), (2, -2), (-2, 2), (-2, -2)], np.int32)
K_CANDS = 1 + len(_SUBPEL_RING)  # ZERO + HME ring


def _coeff_bits(qcoeff, coefb=None, base=8.0):
    aq = jnp.abs(qcoeff)
    if coefb is None:
        return (jnp.sum(jnp.log2(1.0 + aq.astype(jnp.float32)),
                        axis=(1, 2)) * 2.0
                + jnp.sum((aq > 0), axis=(1, 2)) + 8.0)
    return jnp.sum(coefb[jnp.clip(aq, 0, 63)], axis=(1, 2)) + base


def _mv_bits(mvs):
    """Rough NEWMV signaling cost in bits (non-normative RD estimate)."""
    a = jnp.abs(mvs.astype(jnp.float32))
    return 4.0 + 1.4 * (jnp.log2(1.0 + a[:, 0]) + jnp.log2(1.0 + a[:, 1]))


def _pass_a_fn(nb, K, bd=8, warp0=False, interp=0):
    """Build the all-blocks inter candidate evaluator.

    warp0: candidate 0 is the GLOBAL warped prediction — its samples
    come from the whole-frame warped reference (wref planes) at the
    block position; its MV (the block-center projected gm vector) is
    signaling-only."""

    def run(src_y, src_u, src_v, refp_y, refp_u, refp_v,
            wref_y, wref_u, wref_v, ys, xs,
            cand_mvs, zbin, rnd, qv, qshift, deq, lam, coefb, txbb,
            eoby):
        qp = quant.QuantParams(zbin, rnd, qv, qshift, deq)
        ysK = jnp.tile(ys, K)
        xsK = jnp.tile(xs, K)
        mvsK = cand_mvs.transpose(1, 0, 2).reshape(nb * K, 2)
        pred = mc.mc_blocks(refp_y, ysK, xsK, mvsK, BLK, mc.PAD, 0,
                            bd, kind=interp)
        offs = jnp.arange(BLK)
        if warp0:
            rows0 = ys[:, None, None] + offs[None, :, None]
            cols0 = xs[:, None, None] + offs[None, None, :]
            pred = jnp.concatenate(
                [wref_y[rows0, cols0], pred[nb:]], axis=0)
        rows = ysK[:, None, None] + offs[None, :, None]
        cols = xsK[:, None, None] + offs[None, None, :]
        src_blk = src_y[rows, cols]
        resid = src_blk - pred
        coeffs = tf.fwd_txfm2d(resid, cc.DCT_DCT, cc.TX_16X16)
        qc, dq = quant.quantize(coeffs, qp, cc.TX_16X16)
        s2 = np.float32(tf.coeff_sse_scale(cc.TX_16X16, cc.DCT_DCT))
        dist = s2 * jnp.sum((coeffs - dq.astype(jnp.float32)) ** 2,
                            axis=(1, 2))
        from svt_av1_tpu.pipeline.intra_encoder import (_scan_pos,
                                                        _txb_bits)
        pos16 = jnp.asarray(_scan_pos(cc.TX_16X16))
        bits = (_txb_bits(jnp.abs(qc), coefb, txbb[0], eoby, pos16)
                + _mv_bits(mvsK))
        cost = (dist + lam * bits).reshape(K, nb)
        kbest = jnp.argmin(cost, axis=0)                 # (nb,)
        best_cost = cost[0]
        best_mv = mvsK[:nb]
        best_qy = qc[:nb]
        best_dq = dq[:nb]
        best_pred = pred[:nb]
        qk = qc.reshape(K, nb, BLK, BLK)
        dqk = dq.reshape(K, nb, BLK, BLK)
        pk_ = pred.reshape(K, nb, BLK, BLK)
        mvk = mvsK.reshape(K, nb, 2)
        for k in range(1, K):
            take = kbest == k
            t3 = take[:, None, None]
            best_cost = jnp.where(take, cost[k], best_cost)
            best_mv = jnp.where(take[:, None], mvk[k], best_mv)
            best_qy = jnp.where(t3, qk[k], best_qy)
            best_dq = jnp.where(t3, dqk[k], best_dq)
            best_pred = jnp.where(t3, pk_[k], best_pred)
        # normative reconstruction only for the winning candidate
        best_rec_y = tf.inv_txfm2d_add(best_dq, best_pred, cc.DCT_DCT,
                                       cc.TX_16X16, bd=bd)
        # chroma at the winning MV
        cys = ys // 2
        cxs = xs // 2
        qus, recs = [], []
        for refp_c, wref_c, src_c in ((refp_u, wref_u, src_u),
                                      (refp_v, wref_v, src_v)):
            pred_c = mc.mc_blocks(refp_c, cys, cxs, best_mv, CBLK,
                                  mc.PAD, 1, bd, kind=interp)
            offc = jnp.arange(CBLK)
            crows = cys[:, None, None] + offc[None, :, None]
            ccols = cxs[:, None, None] + offc[None, None, :]
            if warp0:
                pred_c = jnp.where((kbest == 0)[:, None, None],
                                   wref_c[crows, ccols], pred_c)
            src_cb = src_c[crows, ccols]
            coeffs_c = tf.fwd_txfm2d(src_cb - pred_c, cc.DCT_DCT,
                                     cc.TX_8X8)
            qcc, dqc = quant.quantize(coeffs_c, qp, cc.TX_8X8)
            rec_c = tf.inv_txfm2d_add(dqc, pred_c, cc.DCT_DCT,
                                      cc.TX_8X8, bd=bd)
            qus.append(qcc)
            recs.append(rec_c)
        is_warp = ((kbest == 0) if warp0
                   else jnp.zeros((nb,), bool))
        return (best_cost, best_mv, best_qy, best_rec_y,
                qus[0], recs[0], qus[1], recs[1], is_warp)

    return run



def _pass_comp_fn(nb, bd=8, interp=0):
    """COMPOUND_AVERAGE candidate evaluator: one (mv0, mv1) pair per
    block against the (LAST, ALTREF) pair."""

    def run(src_y, src_u, src_v, p0y, p0u, p0v, p1y, p1u, p1v,
            ys, xs, mv0, mv1, zbin, rnd, qv, qshift, deq, lam, coefb,
            txbb, eoby):
        qp = quant.QuantParams(zbin, rnd, qv, qshift, deq)
        pred = mc.mc_blocks_compound(p0y, p1y, ys, xs, mv0, mv1, BLK,
                                     mc.PAD, 0, bd, kind=interp)
        offs = jnp.arange(BLK)
        rows = ys[:, None, None] + offs[None, :, None]
        cols = xs[:, None, None] + offs[None, None, :]
        resid = src_y[rows, cols] - pred
        coeffs = tf.fwd_txfm2d(resid, cc.DCT_DCT, cc.TX_16X16)
        qc, dq = quant.quantize(coeffs, qp, cc.TX_16X16)
        s2 = np.float32(tf.coeff_sse_scale(cc.TX_16X16, cc.DCT_DCT))
        dist = s2 * jnp.sum((coeffs - dq.astype(jnp.float32)) ** 2,
                            axis=(1, 2))
        from svt_av1_tpu.pipeline.intra_encoder import (_scan_pos,
                                                        _txb_bits)
        pos16 = jnp.asarray(_scan_pos(cc.TX_16X16))
        bits = (_txb_bits(jnp.abs(qc), coefb, txbb[0], eoby, pos16)
                + _mv_bits(mv0) + _mv_bits(mv1) + 2.0)
        cost = dist + lam * bits
        rec_y = tf.inv_txfm2d_add(dq, pred, cc.DCT_DCT, cc.TX_16X16,
                                  bd=bd)
        cys, cxs = ys // 2, xs // 2
        outs = []
        for pc0, pc1, src_c in ((p0u, p1u, src_u), (p0v, p1v, src_v)):
            pred_c = mc.mc_blocks_compound(pc0, pc1, cys, cxs, mv0,
                                           mv1, CBLK, mc.PAD, 1, bd,
                                           kind=interp)
            offc = jnp.arange(CBLK)
            crows = cys[:, None, None] + offc[None, :, None]
            ccols = cxs[:, None, None] + offc[None, None, :]
            cfs = tf.fwd_txfm2d(src_c[crows, ccols] - pred_c,
                                cc.DCT_DCT, cc.TX_8X8)
            qcc, dqc = quant.quantize(cfs, qp, cc.TX_8X8)
            outs.append((qcc, tf.inv_txfm2d_add(dqc, pred_c, cc.DCT_DCT,
                                                cc.TX_8X8, bd=bd)))
        return (cost, qc, rec_y, outs[0][0], outs[0][1], outs[1][0],
                outs[1][1])

    return run


@functools.lru_cache(maxsize=None)
def _jit_pass_comp(nb, bd=8, interp=0):
    return jax.jit(_pass_comp_fn(nb, bd, interp))


def _inter_frame_program_fn(nw, maxb, modes, gw, bd=8):
    """Pass-B wavefront with the per-block inter candidate override."""

    def frame(recon_y, recon_u, recon_v, src_y, src_u, src_v,
              bys, bxs, valid, trs, bls, icost, irec_y, irec_u, irec_v,
              zbin, rnd, qv, qshift, deq, lam, cy_t, cuv_t, txbb, modeb,
              uvb, eoby, eobuv, rqly, rqluv):
        qp = (zbin, rnd, qv, qshift, deq)
        modes_acc = jnp.zeros((nw, maxb), jnp.int32)
        uv_modes_acc = jnp.zeros((nw, maxb), jnp.int32)
        choose_acc = jnp.zeros((nw, maxb), bool)
        qy_acc = jnp.zeros((nw, maxb, BLK, BLK), jnp.int32)
        qu_acc = jnp.zeros((nw, maxb, CBLK, CBLK), jnp.int32)
        qv_acc = jnp.zeros((nw, maxb, CBLK, CBLK), jnp.int32)

        def body(i, carry):
            ry, ru, rv, ma, uma, ca, qya, qua, qva = carry
            by = bys[i]
            bx = bxs[i]
            va = valid[i]
            ha = (by > 0) & va
            hl = (bx > 0) & va
            bid = by * gw + bx
            m, q, ry, choose = _rd_step(
                ry, src_y, by * BLK, bx * BLK, va, ha, hl,
                qp, lam, BLK, cc.TX_16X16, modes, 0,
                tr_avail=trs[i] & va, bl_avail=bls[i] & va, bd=bd,
                inter=(icost[bid], irec_y[bid]),
                rates=(cy_t, txbb, modeb, eoby))
            choose = choose & va
            um, qu, qvq, ru, rv = _rd_step_chroma(
                ru, rv, src_u, src_v, by * CBLK, bx * CBLK, va, ha, hl,
                qp, lam, bd=bd,
                inter=(choose, irec_u[bid], irec_v[bid]),
                rates=(cuv_t, txbb, uvb, eobuv))
            return (ry, ru, rv, ma.at[i].set(m), uma.at[i].set(um),
                    ca.at[i].set(choose), qya.at[i].set(q),
                    qua.at[i].set(qu), qva.at[i].set(qvq))

        init = (recon_y, recon_u, recon_v, modes_acc, uv_modes_acc,
                choose_acc, qy_acc, qu_acc, qv_acc)
        return jax.lax.fori_loop(0, nw, body, init)

    return frame


@functools.lru_cache(maxsize=None)
def _jit_pass_a(nb, k_cands, bd=8, warp0=False, interp=0):
    return jax.jit(_pass_a_fn(nb, k_cands, bd, warp0=warp0,
                              interp=interp))


@functools.lru_cache(maxsize=None)
def _jit_inter_programs(h, w, nw, maxb, modes, bd=8, k_cands=K_CANDS):
    gh, gw = h // BLK, w // BLK
    nb = gh * gw
    pass_a = _jit_pass_a(nb, k_cands, bd)
    pass_b = jax.jit(_inter_frame_program_fn(nw, maxb, modes, gw, bd))
    return pass_a, pass_b


def estimate_global_translation(mv_y: np.ndarray, mv_x: np.ndarray):
    """Translational global-motion estimation from the dense HME field
    (the global_me.c:139 role; FAST-corners + RANSAC collapses to a
    median-consensus fit for the TRANSLATION model): median candidate,
    inlier check, mean-of-inliers refinement.  Returns (row, col) in
    1/8-pel (quarter-pel precision) or None (identity)."""
    my = mv_y.astype(np.float64).reshape(-1)
    mx = mv_x.astype(np.float64).reshape(-1)
    med_y, med_x = float(np.median(my)), float(np.median(mx))
    if abs(med_y) < 1 and abs(med_x) < 1:
        return None
    inl = (np.abs(my - med_y) <= 1.5) & (np.abs(mx - med_x) <= 1.5)
    if inl.mean() < 0.4:
        return None
    r = int(np.clip(round(float(np.mean(my[inl]))) * 8, -504, 504))
    c = int(np.clip(round(float(np.mean(mx[inl]))) * 8, -504, 504))
    r &= ~1
    c &= ~1
    if r == 0 and c == 0:
        return None
    return (r, c)


def estimate_global_rotzoom(mv_y: np.ndarray, mv_x: np.ndarray):
    """ROTZOOM fit from the dense HME field (compute_global_motion /
    ransac.c RotZoom role): least-squares on [a, b, tx, ty] with a
    trimmed refit, quantized to the header's coded precision grid.
    Returns a 6-entry wmmat or None when translation explains the field
    as well (the caller then tries the translation estimator)."""
    gh, gw = mv_y.shape
    ys = (np.arange(gh) * BLK + BLK // 2).astype(np.float64)
    xs = (np.arange(gw) * BLK + BLK // 2).astype(np.float64)
    px = np.tile(xs, gh)
    py = np.repeat(ys, gw)
    dx = mv_x.astype(np.float64).reshape(-1)
    dy = mv_y.astype(np.float64).reshape(-1)

    def fit(sel):
        # dx = a*x + b*y + tx ; dy = -b*x + a*y + ty
        x, y = px[sel], py[sel]
        u, v = dx[sel], dy[sel]
        n = sel.sum()
        A = np.zeros((2 * n, 4))
        A[:n, 0] = x
        A[:n, 1] = y
        A[:n, 2] = 1.0
        A[n:, 0] = y
        A[n:, 1] = -x
        A[n:, 3] = 1.0
        rhs = np.concatenate([u, v])
        sol, *_ = np.linalg.lstsq(A, rhs, rcond=None)
        resid = A @ sol - rhs
        return sol, np.hypot(resid[:n], resid[n:])

    sel = np.ones(len(px), bool)
    if sel.sum() < 8:
        return None
    sol, r = fit(sel)
    keep = r <= max(1.5, np.median(r) * 2.0)
    if keep.sum() >= 8:
        sol, r = fit(keep)
    a, b_, tx, ty = sol
    # meaningful zoom/rotation? (pure translation -> a, b ~ 0)
    span = max(gh, gw) * BLK
    if abs(a) * span < 0.7 and abs(b_) * span < 0.7:
        return None
    # quantize to the coded grids: alphas multiples of 2 within
    # 2^16 +- 2^13, translation multiples of 2^10
    mat2 = int(np.clip(round((1.0 + a) * 65536 / 2) * 2,
                       65536 - 8190, 65536 + 8190))
    mat3 = int(np.clip(round(b_ * 65536 / 2) * 2, -8190, 8190))
    mat0 = int(np.clip(round(tx * 65536 / 1024) * 1024,
                       -(4095 << 10), 4095 << 10))
    mat1 = int(np.clip(round(ty * 65536 / 1024) * 1024,
                       -(4095 << 10), 4095 << 10))
    mat = (mat0, mat1, mat2, mat3, -mat3, mat2)
    from svt_av1_tpu.ops import warp as warp_ops
    if warp_ops.shear_params(mat) is None:
        return None
    if mat2 == 65536 and mat3 == 0:
        return None
    return mat



@functools.lru_cache(maxsize=None)
def _jit_filter_probe(nb, bd, kind):
    def f(src_y, refp_y, ys, xs, mvs):
        pred = mc.mc_blocks(refp_y, ys, xs, mvs, BLK, mc.PAD, 0, bd,
                            kind=kind)
        offs = jnp.arange(BLK)
        rows = ys[:, None, None] + offs[None, :, None]
        cols = xs[:, None, None] + offs[None, None, :]
        d = (src_y[rows, cols] - pred).astype(jnp.float32)
        return jnp.sum(d * d)
    return jax.jit(f)


def choose_interp_filter(src_y, ref_y, ys, xs, hme, bd=8):
    """Frame-level interpolation-filter decision (the reference's
    interp-filter search, collapsed to one signaled frame filter):
    probe each filter set's MC SSE at a quarter-pel offset of the HME
    field and keep the best of REGULAR/SMOOTH/SHARP."""
    nb = ys.shape[0]
    mvs = hme + 2  # force a fractional phase so the filters differ
    h, w = src_y.shape
    mvs = mc.clamp_mvs_for_pad(mvs, ys, xs, BLK, h, w)
    refp = jnp.asarray(mc.pad_plane(np.asarray(ref_y, np.int32),
                                    mc.PAD))
    best_kind, best_sse = 0, None
    for kind in (0, 1, 2):
        sse = float(_jit_filter_probe(nb, bd, kind)(
            src_y, refp, jnp.asarray(ys), jnp.asarray(xs),
            jnp.asarray(mvs)))
        if best_sse is None or sse < best_sse:
            best_kind, best_sse = kind, sse
    return best_kind


def _pass_a_for_ref(ref, src_y, src_u, src_v, qindex, bd, hme_rad2,
                    hme_rad0, subpel_ring, nb_k, ys, xs, qp_j, lam,
                    interp=0, exact_rates=False):
    """HME + pass-A candidate evaluation against one reference frame.
    Candidate 0 is the global-motion prediction: the per-block gm vector
    (translation), or the whole-frame warped reference (ROTZOOM) — so a
    GLOBALMV winner costs no explicit MV signaling."""
    from svt_av1_tpu.codec import mv_pred
    h, w = src_y.shape
    nb, k_cands0 = nb_k
    mv_y, mv_x, _ = me_pipe.hierarchical_me(src_y, ref["y"],
                                            rad2=hme_rad2, rad0=hme_rad0)
    gm = estimate_global_rotzoom(mv_y, mv_x)
    if gm is None:
        gm = estimate_global_translation(mv_y, mv_x)
    warp0 = gm is not None and len(gm) == 6
    hme = np.stack([mv_y.reshape(nb) * 8, mv_x.reshape(nb) * 8],
                   axis=-1).astype(np.int32)
    ring = _SUBPEL_RING if subpel_ring else _SUBPEL_RING[:1]
    k_cands = 1 + len(ring)
    cand = np.zeros((nb, k_cands, 2), np.int32)
    if warp0:
        gw_ = w // BLK
        for bid in range(nb):
            r4, c4 = (bid // gw_) * 4, (bid % gw_) * 4
            cand[bid, 0] = mv_pred.gm_block_mv(gm, r4, c4,
                                               cc.BLOCK_16X16)
    elif gm is not None:
        cand[:, 0] = np.array(gm, np.int32)
    cand[:, 1:] = hme[:, None, :] + ring[None, :, :]
    gm_cand0 = cand[:, 0].copy()
    cand = mc.clamp_mvs_for_pad(cand, ys[:, None], xs[:, None], BLK, h, w)
    if warp0:
        # candidate 0's MV is signaling-only (the prediction is the
        # warped slice): keep the exact block-center projection or the
        # decoder's MV-prediction context diverges
        cand[:, 0] = gm_cand0
        # a ring candidate colliding with the block's gm vector would
        # make the syntax map a translational winner to GLOBALMV (and
        # the decoder would warp it) — nudge collisions off the vector
        coll = np.all(cand[:, 1:] == cand[:, :1], axis=2)
        cand[:, 1:, 1] += coll.astype(np.int32) * 2
    refp_y = jnp.asarray(mc.pad_plane(ref["y"].astype(np.int32), mc.PAD))
    refp_u = jnp.asarray(mc.pad_plane(ref["u"].astype(np.int32),
                                      mc.PAD // 2))
    refp_v = jnp.asarray(mc.pad_plane(ref["v"].astype(np.int32),
                                      mc.PAD // 2))
    if warp0:
        from svt_av1_tpu.ops import warp as warp_ops
        wy = warp_ops.warp_plane(np.asarray(ref["y"], np.int32), gm,
                                 w, h, bd=bd)
        wu = warp_ops.warp_plane(np.asarray(ref["u"], np.int32), gm,
                                 w // 2, h // 2, bd=bd, subsampling=1)
        wv = warp_ops.warp_plane(np.asarray(ref["v"], np.int32), gm,
                                 w // 2, h // 2, bd=bd, subsampling=1)
        wrefs = (jnp.asarray(wy.astype(np.int32)),
                 jnp.asarray(wu.astype(np.int32)),
                 jnp.asarray(wv.astype(np.int32)))
    else:
        wrefs = (refp_y[:h, :w], refp_u[:h // 2, :w // 2],
                 refp_v[:h // 2, :w // 2])
    pass_a = _jit_pass_a(nb, k_cands, bd, warp0=warp0,
                         interp=interp)
    from svt_av1_tpu.codec.rate_est import md_rate_args
    rt = md_rate_args(qindex, (), (), exact=exact_rates)
    out = pass_a(src_y, src_u, src_v, refp_y, refp_u, refp_v, *wrefs,
                 jnp.asarray(ys), jnp.asarray(xs), jnp.asarray(cand),
                 *qp_j, lam, rt[0], rt[2], rt[5])
    return out, gm, hme


def encode_inter_frame(src_y: np.ndarray, src_u: np.ndarray,
                       src_v: np.ndarray, ref, qindex: int, modes=MODES,
                       bd: int = 8, hme_rad2: int = 8, hme_rad0: int = 7,
                       subpel_ring: bool = True, compound: bool = True,
                       exact_rates: bool = False
                       ) -> Tuple[Dict, Dict[str, np.ndarray]]:
    """Encode one inter frame.

    ref: either a single plane dict (LAST only, IPPP) or
    {ref_enum: plane_dict} for multi-reference MD — every block evaluates
    candidates against each reference and the RD winner's reference is
    signaled per block (reference write_ref_frames single-ref tree).
    Returns ({(r4,c4): BlockDecision}, recon)."""
    from svt_av1_tpu.codec import mv_pred
    if "y" in ref:
        refs = {mv_pred.LAST_FRAME: ref}
    else:
        refs = {r: p for r, p in ref.items() if p is not None}
    h, w = src_y.shape
    assert h % BLK == 0 and w % BLK == 0
    gh, gw = h // BLK, w // BLK
    nb = gh * gw

    ys = (np.arange(nb) // gw * BLK).astype(np.int32)
    xs = (np.arange(nb) % gw * BLK).astype(np.int32)
    qp_y = quant.make_quant_params(qindex, bd=bd)
    qstep = quant.dc_q(qindex, bd=bd) / 8.0
    lam = np.float32(0.7 * qstep * qstep)

    waves, bys, bxs, valid, trs, bls, hls = _schedule_arrays(
        gh, gw, min(gh, gw))
    nw = len(waves)
    ring = _SUBPEL_RING if subpel_ring else _SUBPEL_RING[:1]
    pass_a, pass_b = _jit_inter_programs(h, w, nw, min(gh, gw),
                                         tuple(modes), bd, 1 + len(ring))
    sy = jnp.asarray(src_y.astype(np.int32))
    su = jnp.asarray(src_u.astype(np.int32))
    sv = jnp.asarray(src_v.astype(np.int32))
    qp_j = tuple(jnp.asarray(a) for a in qp_y)

    # frame-level interpolation-filter pick (quality presets), probed
    # on the first reference's HME field
    interp = 0
    if subpel_ring:
        r0 = refs[sorted(refs)[0]]
        mv_y0, mv_x0, _ = me_pipe.hierarchical_me(
            src_y, r0["y"], rad2=hme_rad2, rad0=hme_rad0)
        hme0 = np.stack([mv_y0.reshape(nb) * 8, mv_x0.reshape(nb) * 8],
                        axis=-1).astype(np.int32)
        interp = choose_interp_filter(sy, r0["y"], ys, xs, hme0, bd=bd)

    # pass A against each reference; elementwise host merge by RD cost
    best = None
    iref = None
    gm_by_ref = {}
    hme_by_ref = {}
    for renum in sorted(refs):
        out_a, gm_r, hme_r = _pass_a_for_ref(
            refs[renum], sy, su, sv, qindex, bd, hme_rad2, hme_rad0,
            subpel_ring, (nb, 1 + len(ring)), ys, xs, qp_j, lam,
            interp=interp, exact_rates=exact_rates)
        if gm_r is not None:
            gm_by_ref[renum] = gm_r
        hme_by_ref[renum] = hme_r
        out_r = [np.asarray(o) for o in out_a]
        if best is None:
            best = out_r
            iref = np.full(nb, renum, np.int32)
        else:
            take = out_r[0] < best[0]
            iref = np.where(take, renum, iref)
            for fi in range(len(best)):
                t = take.reshape((nb,) + (1,) * (best[fi].ndim - 1))
                best[fi] = np.where(t, out_r[fi], best[fi])
    (icost, imv, iqy, irec_y, iqu, irec_u, iqv, irec_v, iwarp) = best

    # COMPOUND_AVERAGE probe (LAST + ALTREF pair, B frames only): the
    # per-ref HME winners predict jointly; RD competes with the merged
    # single-reference winner (compound-mode funnel role)
    from svt_av1_tpu.codec import mv_pred as mvp
    icomp = np.zeros(nb, bool)
    imv2 = np.zeros((nb, 2), np.int32)
    if (compound and mvp.LAST_FRAME in refs
            and mvp.ALTREF_FRAME in refs):
        r0p, r1p = refs[mvp.LAST_FRAME], refs[mvp.ALTREF_FRAME]
        mv0 = mc.clamp_mvs_for_pad(hme_by_ref[mvp.LAST_FRAME], ys, xs,
                                   BLK, h, w)
        mv1 = mc.clamp_mvs_for_pad(hme_by_ref[mvp.ALTREF_FRAME], ys,
                                   xs, BLK, h, w)
        from svt_av1_tpu.codec.rate_est import md_rate_args
        rt = md_rate_args(qindex, (), (), exact=exact_rates)
        pads = []
        for rp in (r0p, r1p):
            pads += [jnp.asarray(mc.pad_plane(
                         rp["y"].astype(np.int32), mc.PAD)),
                     jnp.asarray(mc.pad_plane(
                         rp["u"].astype(np.int32), mc.PAD // 2)),
                     jnp.asarray(mc.pad_plane(
                         rp["v"].astype(np.int32), mc.PAD // 2))]
        probe = _jit_pass_comp(nb, bd, interp)
        zero = np.zeros_like(mv0)
        cands = [(mv0, mv1), (zero, zero)]
        merged = None
        for (m0, m1) in cands:
            outc = probe(sy, su, sv, *pads, jnp.asarray(ys),
                         jnp.asarray(xs), jnp.asarray(m0),
                         jnp.asarray(m1), *qp_j, lam,
                         rt[0], rt[2], rt[5])
            outc = [np.asarray(o) for o in outc] + [m0, m1]
            if merged is None:
                merged = outc
            else:
                tk = outc[0] < merged[0]
                for fi in range(len(merged)):
                    sh = (nb,) + (1,) * (merged[fi].ndim - 1)
                    merged[fi] = np.where(tk.reshape(sh), outc[fi],
                                          merged[fi])
        (ccost, cqy, crec_y, cqu, crec_u, cqv, crec_v, mv0, mv1) = \
            merged
        take = ccost < icost
        icomp = take
        icost = np.where(take, ccost, icost)
        imv = np.where(take[:, None], mv0, imv)
        imv2 = np.where(take[:, None], mv1, imv2)
        iref = np.where(take, mvp.LAST_FRAME, iref)
        iwarp = np.where(take, False, iwarp)
        t3 = take[:, None, None]
        iqy = np.where(t3, cqy, iqy)
        irec_y = np.where(t3, crec_y, irec_y)
        iqu = np.where(t3, cqu, iqu)
        irec_u = np.where(t3, crec_u, irec_u)
        iqv = np.where(t3, cqv, iqv)
        irec_v = np.where(t3, crec_v, irec_v)

    from svt_av1_tpu.codec.rate_est import md_rate_args
    from svt_av1_tpu.pipeline.intra_encoder import UV_MODES
    rt = md_rate_args(qindex, tuple(modes), UV_MODES,
                      exact=exact_rates)
    out = pass_b(jnp.zeros((h, w), jnp.int32),
                 jnp.zeros((h // 2, w // 2), jnp.int32),
                 jnp.zeros((h // 2, w // 2), jnp.int32),
                 sy, su, sv, jnp.asarray(bys), jnp.asarray(bxs),
                 jnp.asarray(valid), jnp.asarray(trs), jnp.asarray(bls),
                 jnp.asarray(icost), jnp.asarray(irec_y),
                 jnp.asarray(irec_u), jnp.asarray(irec_v), *qp_j, lam,
                 *rt)
    (recon_y, recon_u, recon_v, modes_acc, uv_acc, choose_acc,
     qy_acc, qu_acc, qv_acc) = [np.asarray(o) for o in out]

    decisions = {}
    for i, wave in enumerate(waves):
        for j, (by, bx) in enumerate(wave):
            r4, c4 = by * 4, bx * 4
            bid = by * gw + bx
            if choose_acc[i, j]:
                decisions[(r4, c4)] = BlockDecision(
                    r4=r4, c4=c4, bsize=cc.BLOCK_16X16, y_mode=cc.DC_PRED,
                    uv_mode=cc.DC_PRED, tx_type=cc.DCT_DCT,
                    qcoeff_y=iqy[bid], qcoeff_u=iqu[bid],
                    qcoeff_v=iqv[bid], is_inter=True,
                    mv=(int(imv[bid, 0]), int(imv[bid, 1])),
                    ref=int(iref[bid]), use_warp=bool(iwarp[bid]),
                    ref2=(int(mvp.ALTREF_FRAME) if icomp[bid] else 0),
                    mv2=((int(imv2[bid, 0]), int(imv2[bid, 1]))
                         if icomp[bid] else (0, 0)))
            else:
                decisions[(r4, c4)] = BlockDecision(
                    r4=r4, c4=c4, bsize=cc.BLOCK_16X16,
                    y_mode=int(modes_acc[i, j]),
                    uv_mode=int(uv_acc[i, j]), tx_type=cc.DCT_DCT,
                    qcoeff_y=qy_acc[i, j], qcoeff_u=qu_acc[i, j],
                    qcoeff_v=qv_acc[i, j])
    dt = np.uint8 if bd == 8 else np.uint16
    recon = dict(y=recon_y.astype(dt), u=recon_u.astype(dt),
                 v=recon_v.astype(dt))
    return decisions, recon, gm_by_ref, interp


def reconstruct_inter_from_decisions(decisions: Dict, ref,
                                     width: int, height: int, qindex: int,
                                     bd: int = 8, gm=None,
                                     interp=0) -> Dict[str, np.ndarray]:
    """Decoder-side reconstruction of an inter frame.

    ref: single plane dict (LAST only) or {ref_enum: plane_dict}.
    Inter blocks have no in-frame dependencies — they reconstruct as one
    device batch per reference; intra blocks then run in coding order
    over the mixed recon (their neighbors, inter or intra, are already
    written)."""
    from svt_av1_tpu.codec import mv_pred
    refs = ({mv_pred.LAST_FRAME: ref} if "y" in ref
            else {r: p for r, p in ref.items() if p is not None})
    gh, gw = height // BLK, width // BLK
    qp = quant.make_quant_params(qindex, bd=bd)
    qp_j = tuple(jnp.asarray(a) for a in qp)
    recon_y = jnp.zeros((height, width), jnp.int32)
    recon_u = jnp.zeros((height // 2, width // 2), jnp.int32)
    recon_v = jnp.zeros_like(recon_u)

    # 32x32 skip leaves (partition merge) reconstruct as four 16 MC
    # tiles with the shared MV — identical pixels, since the MV passed
    # the 32-block pad clamp at encode time and subpel filtering is a
    # sliding window over the padded reference
    import dataclasses as _dc
    work = {}
    big = (cc.BLOCK_32X32, cc.BLOCK_64X64, cc.BLOCK_32X16,
           cc.BLOCK_16X32, cc.BLOCK_64X32, cc.BLOCK_32X64)
    for k, d in decisions.items():
        if d.is_inter and d.bsize in big:
            assert d.skip, "non-skip merged inter needs big-TX recon"
            w4 = int(cc.block_size_wide[d.bsize]) >> 2
            h4 = int(cc.block_size_high[d.bsize]) >> 2
            for dr in range(0, h4, 4):
                for dc2 in range(0, w4, 4):
                    nk = (k[0] + dr, k[1] + dc2)
                    work[nk] = _dc.replace(
                        d, r4=nk[0], c4=nk[1], bsize=cc.BLOCK_16X16,
                        qcoeff_y=np.zeros((BLK, BLK), np.int32),
                        qcoeff_u=np.zeros((CBLK, CBLK), np.int32),
                        qcoeff_v=np.zeros((CBLK, CBLK), np.int32))
        else:
            work[k] = d
    decisions = work

    for renum, refp in refs.items():
        recon_y, recon_u, recon_v = _recon_inter_blocks_for_ref(
            decisions, renum, refp, recon_y, recon_u, recon_v, qp_j, bd,
            gm_model=(gm or {}).get(renum), interp=interp)
        # 8x8 partition-split leaves (single-ref translational)
        recon_y, recon_u, recon_v = _recon_inter_blocks_for_ref(
            decisions, renum, refp, recon_y, recon_u, recon_v, qp_j, bd,
            gm_model=(gm or {}).get(renum), interp=interp, blk=8)
    recon_y, recon_u, recon_v = _recon_compound_blocks(
        decisions, refs, recon_y, recon_u, recon_v, qp_j, bd, interp)
    recon_y, recon_u, recon_v = _recon_obmc_blocks(
        decisions, refs, recon_y, recon_u, recon_v, qp_j, bd, interp)

    for by in range(gh):
        for bx in range(gw):
            d = decisions[(by * 4, bx * 4)]
            if d.is_inter and d.interintra_mode >= 0:
                # inter-intra: needs the causal recon for its intra
                # component, so it reconstructs in coding order here
                recon_y, recon_u, recon_v = _recon_interintra_block(
                    d, refs, recon_y, recon_u, recon_v, qp_j, bd,
                    interp, by, bx, gh, gw)
                continue
            if d.is_inter:
                continue
            tr, bl = tr_bl_avail(by, bx, gh, gw)
            recon_y = _recon_block(recon_y, d.qcoeff_y, d.y_mode,
                                   by * BLK, bx * BLK, BLK, cc.TX_16X16,
                                   d.tx_type, qp, tr, bl, bd)
            uv_tx = _chroma_tx_type(d.uv_mode, cc.TX_8X8)
            recon_u = _recon_block(recon_u, d.qcoeff_u, d.uv_mode,
                                   by * CBLK, bx * CBLK, CBLK, cc.TX_8X8,
                                   uv_tx, qp, bd=bd)
            recon_v = _recon_block(recon_v, d.qcoeff_v, d.uv_mode,
                                   by * CBLK, bx * CBLK, CBLK, cc.TX_8X8,
                                   uv_tx, qp, bd=bd)
    dt = np.uint8 if bd == 8 else np.uint16
    return dict(y=np.asarray(recon_y).astype(dt),
                u=np.asarray(recon_u).astype(dt),
                v=np.asarray(recon_v).astype(dt))


def _recon_interintra_block(d, refs, recon_y, recon_u, recon_v, qp_j,
                            bd, interp, by, bx, gh, gw):
    """Inter-intra reconstruction for one block (coding order): intra
    component from the causal recon neighbors, inter component from the
    single ref, pixel-domain AOM_BLEND_A64 with the smooth ii mask (or
    the sign-0 wedge mask), then the residual
    (combine_interintra, inter_prediction.c:2183-2214)."""
    from svt_av1_tpu.ops import interintra as ii_ops
    from svt_av1_tpu.ops import wedge as wedge_ops
    from svt_av1_tpu.pipeline.intra_encoder import _gather_neighbors
    from svt_av1_tpu.ops import intra as intra_ops
    ii_to_intra = (cc.DC_PRED, cc.V_PRED, cc.H_PRED, cc.SMOOTH_PRED)
    imode = ii_to_intra[d.interintra_mode]
    y0, x0 = d.r4 * 4, d.c4 * 4
    outs = {}
    for plane, blk_, ss in (("y", BLK, 0), ("u", CBLK, 1),
                            ("v", CBLK, 1)):
        rec = recon_y if plane == "y" else (recon_u if plane == "u"
                                            else recon_v)
        ys = jnp.asarray([y0 >> ss], jnp.int32)
        xs = jnp.asarray([x0 >> ss], jnp.int32)
        ha = jnp.asarray([by > 0])
        hl = jnp.asarray([bx > 0])
        above, left, corner = _gather_neighbors(rec, ys, xs, blk_,
                                                ha, hl, bd=bd)
        ipred = intra_ops.predict(imode, above, left, corner, blk_,
                                  blk_, have_above=ha, have_left=hl,
                                  bd=bd)
        refp = jnp.asarray(mc.pad_plane(
            refs[d.ref][plane].astype(np.int32), mc.PAD >> ss))
        mpred = mc.mc_blocks(refp, np.array([y0 >> ss], np.int32),
                             np.array([x0 >> ss], np.int32),
                             np.array([d.mv], np.int32), blk_, mc.PAD,
                             ss, bd, kind=interp)
        if d.ii_wedge_idx >= 0:
            m = (wedge_ops.masks_16 if ss == 0
                 else wedge_ops.masks_16_uv)[0, d.ii_wedge_idx] \
                .astype(np.int32)
        else:
            m = (ii_ops.MASKS_Y16 if ss == 0
                 else ii_ops.MASKS_UV8)[d.interintra_mode]
        outs[plane] = ii_ops.blend(ipred, mpred, jnp.asarray(m))
    qy = jnp.asarray(d.qcoeff_y[None])
    dq = quant.dequantize(qy, quant.QuantParams(*qp_j), cc.TX_16X16)
    rec_y = tf.inv_txfm2d_add(dq, outs["y"], cc.DCT_DCT, cc.TX_16X16,
                              bd=bd)[0]
    recon_y = recon_y.at[y0:y0 + BLK, x0:x0 + BLK].set(rec_y)
    cy0, cx0 = y0 // 2, x0 // 2
    for plane in ("u", "v"):
        qc = jnp.asarray(getattr(d, f"qcoeff_{plane}")[None])
        dqc = quant.dequantize(qc, quant.QuantParams(*qp_j), cc.TX_8X8)
        rec_c = tf.inv_txfm2d_add(dqc, outs[plane], cc.DCT_DCT,
                                  cc.TX_8X8, bd=bd)[0]
        if plane == "u":
            recon_u = recon_u.at[cy0:cy0 + CBLK,
                                 cx0:cx0 + CBLK].set(rec_c)
        else:
            recon_v = recon_v.at[cy0:cy0 + CBLK,
                                 cx0:cx0 + CBLK].set(rec_c)
    return recon_y, recon_u, recon_v


def _recon_obmc_blocks(decisions, refs, recon_y, recon_u, recon_v,
                       qp_j, bd, interp=0):
    """OBMC_CAUSAL reconstruction: base single-ref prediction blended
    with the ABOVE then LEFT neighbor-MV predictions over the overlap
    halves (enc_inter_prediction.c:1428-1523 order and masks), then the
    coded residual.  Depends only on parsed neighbor MVs, so it stays
    batch-independent of recon order."""
    from svt_av1_tpu.ops import obmc as obmc_ops
    keys = [k for k, d in decisions.items()
            if d.is_inter and d.motion_mode == 1]
    if not keys:
        return recon_y, recon_u, recon_v
    pads = {}

    def pad_of(renum, plane, cpad):
        if (renum, plane) not in pads:
            pads[(renum, plane)] = jnp.asarray(mc.pad_plane(
                refs[renum][plane].astype(np.int32), cpad))
        return pads[(renum, plane)]

    for k in keys:
        d = decisions[k]
        y0, x0 = k[0] * 4, k[1] * 4
        nbs = []
        for nk in ((k[0] - 4, k[1]), (k[0], k[1] - 4)):
            nd = decisions.get(nk)
            nbs.append(nd if (nd is not None and nd.is_inter) else None)
        above, left = nbs
        preds = {}
        for plane, blk_, ss in (("y", BLK, 0), ("u", CBLK, 1),
                                ("v", CBLK, 1)):
            ys = np.array([y0 >> ss], np.int32)
            xs = np.array([x0 >> ss], np.int32)
            p = mc.mc_blocks(pad_of(d.ref, plane, mc.PAD >> ss), ys, xs,
                             np.array([d.mv], np.int32), blk_, mc.PAD,
                             ss, bd, kind=interp)
            mask = obmc_ops.MASK_Y16 if ss == 0 else obmc_ops.MASK_C8
            if above is not None:
                pa = mc.mc_blocks(pad_of(above.ref, plane,
                                         mc.PAD >> ss), ys, xs,
                                  np.array([above.mv], np.int32), blk_,
                                  mc.PAD, ss, bd, kind=interp)
                p = obmc_ops.blend_above(p, pa, jnp.asarray(mask))
            if left is not None:
                pl = mc.mc_blocks(pad_of(left.ref, plane,
                                         mc.PAD >> ss), ys, xs,
                                  np.array([left.mv], np.int32), blk_,
                                  mc.PAD, ss, bd, kind=interp)
                p = obmc_ops.blend_left(p, pl, jnp.asarray(mask))
            preds[plane] = p
        qy = jnp.asarray(d.qcoeff_y[None])
        dq = quant.dequantize(qy, quant.QuantParams(*qp_j), cc.TX_16X16)
        rec_y = tf.inv_txfm2d_add(dq, preds["y"], cc.DCT_DCT,
                                  cc.TX_16X16, bd=bd)[0]
        recon_y = recon_y.at[y0:y0 + BLK, x0:x0 + BLK].set(rec_y)
        for plane, init in (("u", None), ("v", None)):
            qc = jnp.asarray(getattr(d, f"qcoeff_{plane}")[None])
            dqc = quant.dequantize(qc, quant.QuantParams(*qp_j),
                                   cc.TX_8X8)
            rec_c = tf.inv_txfm2d_add(dqc, preds[plane], cc.DCT_DCT,
                                      cc.TX_8X8, bd=bd)[0]
            cy0, cx0 = y0 // 2, x0 // 2
            if plane == "u":
                recon_u = recon_u.at[cy0:cy0 + CBLK,
                                     cx0:cx0 + CBLK].set(rec_c)
            else:
                recon_v = recon_v.at[cy0:cy0 + CBLK,
                                     cx0:cx0 + CBLK].set(rec_c)
    return recon_y, recon_u, recon_v


def _recon_compound_blocks(decisions, refs, recon_y, recon_u, recon_v,
                           qp_j, bd, interp=0):
    """COMPOUND_AVERAGE reconstruction for two-reference blocks."""
    keys = [k for k, d in decisions.items() if d.is_inter and d.ref2]
    if not keys:
        return recon_y, recon_u, recon_v
    pairs = sorted({(decisions[k].ref, decisions[k].ref2)
                    for k in keys})
    from svt_av1_tpu.ops import wedge as wedge_ops
    for (r0, r1) in pairs:
        pk = [k for k in keys if (decisions[k].ref,
                                  decisions[k].ref2) == (r0, r1)]
        ys = np.array([k[0] * 4 for k in pk], np.int32)
        xs = np.array([k[1] * 4 for k in pk], np.int32)
        mv0 = np.array([decisions[k].mv for k in pk], np.int32)
        mv1 = np.array([decisions[k].mv2 for k in pk], np.int32)
        # per-block blend mask: 64 everywhere is NOT average (different
        # rounding) so masked and average blocks take separate kernels;
        # wedge masks exist for 16x16 (the only size MD codes them at)
        wsel = np.array([decisions[k].comp_type == 1 for k in pk])
        dsel = np.array([decisions[k].comp_type == 2 for k in pk])
        mask_y = mask_uv = None
        if wsel.any():
            assert all(decisions[k].bsize == cc.BLOCK_16X16
                       for k in pk if decisions[k].comp_type == 1), \
                "wedge masks only built for 16x16"
            idx = np.array([decisions[k].wedge_idx for k in pk])
            sgn = np.array([decisions[k].wedge_sign for k in pk])
            mask_y = wedge_ops.masks_16[sgn, idx].astype(np.int32)
            mask_uv = wedge_ops.masks_16_uv[sgn, idx].astype(np.int32)
        p0y = jnp.asarray(mc.pad_plane(
            refs[r0]["y"].astype(np.int32), mc.PAD))
        p1y = jnp.asarray(mc.pad_plane(
            refs[r1]["y"].astype(np.int32), mc.PAD))
        pred_y = mc.mc_blocks_compound(p0y, p1y, ys, xs, mv0, mv1,
                                       BLK, mc.PAD, 0, bd, kind=interp)
        if wsel.any():
            pred_w = mc.mc_blocks_compound(p0y, p1y, ys, xs, mv0, mv1,
                                           BLK, mc.PAD, 0, bd,
                                           kind=interp,
                                           mask=jnp.asarray(mask_y))
            pred_y = jnp.where(jnp.asarray(wsel)[:, None, None],
                               pred_w, pred_y)
        mask_uv_d = None
        if dsel.any():
            inv = np.array([decisions[k].wedge_sign for k in pk],
                           np.int32)
            pred_d, m16 = mc.mc_blocks_compound_diffwtd(
                p0y, p1y, ys, xs, mv0, mv1, BLK, mc.PAD, inv, bd,
                kind=interp)
            pred_y = jnp.where(jnp.asarray(dsel)[:, None, None],
                               pred_d, pred_y)
            mask_uv_d = (m16[:, ::2, ::2] + m16[:, 1::2, ::2]
                         + m16[:, ::2, 1::2] + m16[:, 1::2, 1::2]
                         + 2) >> 2
        qy = jnp.asarray(np.stack([decisions[k].qcoeff_y for k in pk]))
        dq = quant.dequantize(qy, quant.QuantParams(*qp_j), cc.TX_16X16)
        rec_y = tf.inv_txfm2d_add(dq, pred_y, cc.DCT_DCT, cc.TX_16X16,
                                  bd=bd)
        offs = jnp.arange(BLK)
        rows = ys[:, None, None] + offs[None, :, None]
        cols = xs[:, None, None] + offs[None, None, :]
        recon_y = recon_y.at[rows, cols].set(rec_y)
        for plane in ("u", "v"):
            p0c = jnp.asarray(mc.pad_plane(
                refs[r0][plane].astype(np.int32), mc.PAD // 2))
            p1c = jnp.asarray(mc.pad_plane(
                refs[r1][plane].astype(np.int32), mc.PAD // 2))
            pred_c = mc.mc_blocks_compound(p0c, p1c, ys // 2, xs // 2,
                                           mv0, mv1, CBLK, mc.PAD, 1,
                                           bd, kind=interp)
            if wsel.any():
                pred_cw = mc.mc_blocks_compound(
                    p0c, p1c, ys // 2, xs // 2, mv0, mv1, CBLK,
                    mc.PAD, 1, bd, kind=interp,
                    mask=jnp.asarray(mask_uv))
                pred_c = jnp.where(jnp.asarray(wsel)[:, None, None],
                                   pred_cw, pred_c)
            if dsel.any():
                pred_cd = mc.mc_blocks_compound(
                    p0c, p1c, ys // 2, xs // 2, mv0, mv1, CBLK,
                    mc.PAD, 1, bd, kind=interp, mask=mask_uv_d)
                pred_c = jnp.where(jnp.asarray(dsel)[:, None, None],
                                   pred_cd, pred_c)
            qc = jnp.asarray(np.stack(
                [getattr(decisions[k], f"qcoeff_{plane}")
                 for k in pk]))
            dqc = quant.dequantize(qc, quant.QuantParams(*qp_j),
                                   cc.TX_8X8)
            rec_c = tf.inv_txfm2d_add(dqc, pred_c, cc.DCT_DCT,
                                      cc.TX_8X8, bd=bd)
            offc = jnp.arange(CBLK)
            crows = (ys // 2)[:, None, None] + offc[None, :, None]
            ccols = (xs // 2)[:, None, None] + offc[None, None, :]
            if plane == "u":
                recon_u = recon_u.at[crows, ccols].set(rec_c)
            else:
                recon_v = recon_v.at[crows, ccols].set(rec_c)
    return recon_y, recon_u, recon_v


def _signaled_tx_type(d):
    """Luma tx type as a decoder derives it: the signaled type is read
    only for a non-skip luma txb with coefficients; otherwise the spec
    default DCT_DCT applies (and chroma inherits that default)."""
    if not np.any(d.qcoeff_y):
        return cc.DCT_DCT
    return d.tx_type


def _inv_add_mixed(dq, pred, txts, tx_size, bd):
    """Batched inv_txfm2d_add with a per-block tx type array: one
    inverse per distinct type present, selected per block.  Needed
    because the inter tx-type search signals non-DCT luma types (and
    AV1 derives the chroma type from them, spec compute_tx_type)."""
    types = sorted(set(int(t) for t in txts))
    out = tf.inv_txfm2d_add(dq, pred, types[0], tx_size, bd=bd)
    sel = np.asarray(txts)
    for t in types[1:]:
        rec_t = tf.inv_txfm2d_add(dq, pred, t, tx_size, bd=bd)
        out = jnp.where(jnp.asarray(sel == t)[:, None, None], rec_t,
                        out)
    return out


def _recon_inter_blocks_for_ref(decisions, renum, ref, recon_y, recon_u,
                                recon_v, qp_j, bd, gm_model=None,
                                interp=0, blk=BLK):
    cblk = blk // 2
    tx_l = cc.TX_16X16 if blk == 16 else cc.TX_8X8
    tx_c = cc.TX_8X8 if blk == 16 else cc.TX_4X4
    inter_keys = [k for k, d in decisions.items()
                  if d.is_inter and d.ref == renum and not d.ref2
                  and not d.motion_mode and d.interintra_mode < 0
                  and int(cc.block_size_wide[d.bsize]) == blk]
    if inter_keys:
        ys = np.array([k[0] * 4 for k in inter_keys], np.int32)
        xs = np.array([k[1] * 4 for k in inter_keys], np.int32)
        mvs = np.array([decisions[k].mv for k in inter_keys], np.int32)
        wsel = np.array([decisions[k].use_warp for k in inter_keys])
        wplanes = None
        if wsel.any():
            # GLOBALMV + ROTZOOM: whole-frame warp, per-block slices
            assert gm_model is not None and len(gm_model) == 6
            from svt_av1_tpu.ops import warp as warp_ops
            h_, w_ = recon_y.shape
            wplanes = dict(
                y=warp_ops.warp_plane(np.asarray(ref["y"], np.int32),
                                      gm_model, w_, h_, bd=bd),
                u=warp_ops.warp_plane(np.asarray(ref["u"], np.int32),
                                      gm_model, w_ // 2, h_ // 2,
                                      bd=bd, subsampling=1),
                v=warp_ops.warp_plane(np.asarray(ref["v"], np.int32),
                                      gm_model, w_ // 2, h_ // 2,
                                      bd=bd, subsampling=1))
        refp_y = jnp.asarray(mc.pad_plane(ref["y"].astype(np.int32),
                                          mc.PAD))
        pred_y = mc.mc_blocks(refp_y, ys, xs, mvs, blk, mc.PAD, 0, bd,
                              kind=interp)
        if wplanes is not None:
            wy = jnp.asarray(wplanes["y"].astype(np.int32))
            r0 = ys[:, None, None] + np.arange(blk)[None, :, None]
            c0 = xs[:, None, None] + np.arange(blk)[None, None, :]
            pred_y = jnp.where(jnp.asarray(wsel)[:, None, None],
                               wy[r0, c0], pred_y)
        qy = jnp.asarray(np.stack([decisions[k].qcoeff_y
                                   for k in inter_keys]))
        dq = quant.dequantize(qy, quant.QuantParams(*qp_j), tx_l)
        txts_y = [_signaled_tx_type(decisions[k]) for k in inter_keys]
        rec_y = _inv_add_mixed(dq, pred_y, txts_y, tx_l, bd)
        offs = jnp.arange(blk)
        rows = ys[:, None, None] + offs[None, :, None]
        cols = xs[:, None, None] + offs[None, None, :]
        recon_y = recon_y.at[rows, cols].set(rec_y)
        for plane, init in (("u", recon_u), ("v", recon_v)):
            refp_c = jnp.asarray(mc.pad_plane(
                ref[plane].astype(np.int32), mc.PAD // 2))
            pred_c = mc.mc_blocks(refp_c, ys // 2, xs // 2, mvs, cblk,
                                  mc.PAD, 1, bd, kind=interp)
            if wplanes is not None:
                wc = jnp.asarray(wplanes[plane].astype(np.int32))
                rc0 = ((ys // 2)[:, None, None]
                       + np.arange(cblk)[None, :, None])
                cc0 = ((xs // 2)[:, None, None]
                       + np.arange(cblk)[None, None, :])
                pred_c = jnp.where(jnp.asarray(wsel)[:, None, None],
                                   wc[rc0, cc0], pred_c)
            qc = jnp.asarray(np.stack(
                [getattr(decisions[k], f"qcoeff_{plane}")
                 for k in inter_keys]))
            dqc = quant.dequantize(qc, quant.QuantParams(*qp_j),
                                   tx_c)
            from svt_av1_tpu.codec.syntax import _chroma_tx_type_inter
            txts_c = [_chroma_tx_type_inter(
                          _signaled_tx_type(decisions[k]), tx_c,
                          False)
                      for k in inter_keys]
            rec_c = _inv_add_mixed(dqc, pred_c, txts_c, tx_c, bd)
            offc = jnp.arange(cblk)
            crows = (ys // 2)[:, None, None] + offc[None, :, None]
            ccols = (xs // 2)[:, None, None] + offc[None, None, :]
            if plane == "u":
                recon_u = recon_u.at[crows, ccols].set(rec_c)
            else:
                recon_v = recon_v.at[crows, ccols].set(rec_c)
    return recon_y, recon_u, recon_v
