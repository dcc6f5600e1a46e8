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

MODES = (cc.DC_PRED, cc.V_PRED, cc.H_PRED, cc.SMOOTH_PRED, cc.PAETH_PRED)
BLK = 16
CBLK = 8


def _gather_neighbors(recon, ys, xs, n, have_above, have_left, bd=8):
    """Batched neighbor prep with spec substitution rules
    (reconintra build_intra_predictors semantics).

    recon: (H, W) int32; ys/xs: (B,) top-left coords; n: block dim."""
    b = ys.shape[0]
    base = 1 << (bd - 1)
    offs = jnp.arange(n)
    # raw gathers (clamped indices; masked later)
    ay = jnp.maximum(ys - 1, 0)
    above_raw = recon[ay[:, None], xs[:, None] + offs[None, :]]
    lx = jnp.maximum(xs - 1, 0)
    left_raw = recon[ys[:, None] + offs[None, :], lx[:, None]]
    corner_raw = recon[ay, lx]
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
             qp_arrays, lam, n, tx_size, modes, plane_type):
    """One wave step for one plane: returns (best_mode (B,), qcoeff
    (B,kh,kw), new recon)."""
    b = ys.shape[0]
    above, left, corner = _gather_neighbors(recon, ys, xs, n,
                                            have_above, have_left)
    offs = jnp.arange(n)
    rows = ys[:, None, None] + offs[None, :, None]
    cols = xs[:, None, None] + offs[None, None, :]
    src_blk = src[rows, cols]

    zbin, rnd, qv, qshift, deq = qp_arrays
    qp = quant.QuantParams(zbin, rnd, qv, qshift, deq)

    best_cost = None
    best = None
    for mode in modes:
        pred = intra.predict(mode, above, left, corner, n, n,
                             have_above=have_above, have_left=have_left)
        resid = src_blk - pred
        coeffs = tf.fwd_txfm2d(resid, cc.DCT_DCT, tx_size)
        qcoeff, dqcoeff = quant.quantize(coeffs, qp, tx_size)
        rec = tf.inv_txfm2d_add(dqcoeff, pred, cc.DCT_DCT, tx_size)
        dist = jnp.sum((rec - src_blk) ** 2, axis=(1, 2)).astype(jnp.float32)
        aq = jnp.abs(qcoeff)
        bits = (jnp.sum(jnp.log2(1.0 + aq.astype(jnp.float32)), axis=(1, 2))
                * 2.0 + jnp.sum((aq > 0), axis=(1, 2)) + 8.0)
        cost = dist + lam * bits
        pack = (cost, jnp.full((b,), mode, jnp.int32), qcoeff, rec)
        if best is None:
            best = pack
        else:
            take = cost < best[0]
            best = (jnp.where(take, cost, best[0]),
                    jnp.where(take, pack[1], best[1]),
                    jnp.where(take[:, None, None], qcoeff, best[2]),
                    jnp.where(take[:, None, None], rec, best[3]))

    _, best_mode, best_q, best_rec = best
    # scatter chosen recon (masked lanes add zero delta)
    cur = recon[rows, cols]
    delta = jnp.where(valid[:, None, None], best_rec - cur, 0)
    recon = recon.at[rows, cols].add(delta)
    return best_mode, best_q, recon


@functools.lru_cache(maxsize=None)
def _jit_wave_step(n, tx_size, modes, maxb):
    def step(recon, src, ys, xs, valid, have_above, have_left,
             zbin, rnd, qv, qshift, deq, lam):
        return _rd_step(recon, src, ys, xs, valid, have_above, have_left,
                        (zbin, rnd, qv, qshift, deq), lam, n, tx_size,
                        modes, 0)
    return jax.jit(step)


def _wave_schedule(gh: int, gw: int, maxb: int):
    """List of waves; each is (ys4, xs4 block indices, count)."""
    waves = []
    for k in range(gh + gw - 1):
        blocks = [(by, k - by) for by in range(max(0, k - gw + 1),
                                               min(gh, k + 1))]
        for i in range(0, len(blocks), maxb):
            waves.append(blocks[i:i + maxb])
    return waves


def encode_intra_frame(src_y: np.ndarray, src_u: np.ndarray,
                       src_v: np.ndarray, qindex: int,
                       modes=MODES) -> Tuple[Dict, Dict[str, np.ndarray]]:
    """Encode one key frame.  Returns ({(r4,c4): BlockDecision}, recon)."""
    h, w = src_y.shape
    assert h % BLK == 0 and w % BLK == 0, "round 1: dims multiple of 16"
    gh, gw = h // BLK, w // BLK
    maxb = min(gh, gw)

    qp_y = quant.make_quant_params(qindex)
    qstep = quant.dc_q(qindex) / 8.0
    lam = np.float32(0.7 * qstep * qstep)

    recon_y = jnp.asarray(src_y.astype(np.int32)) * 0
    src_y_j = jnp.asarray(src_y.astype(np.int32))
    recon_u = jnp.zeros_like(jnp.asarray(src_u.astype(np.int32)))
    recon_v = jnp.zeros_like(recon_u)
    src_u_j = jnp.asarray(src_u.astype(np.int32))
    src_v_j = jnp.asarray(src_v.astype(np.int32))

    step_y = _jit_wave_step(BLK, cc.TX_16X16, tuple(modes), maxb)
    step_c = _jit_wave_step(CBLK, cc.TX_8X8, (cc.DC_PRED,), maxb)

    waves = _wave_schedule(gh, gw, maxb)
    y_modes = np.zeros((gh, gw), np.int32)
    qy = np.zeros((gh, gw, BLK, BLK), np.int32)
    qu = np.zeros((gh, gw, CBLK, CBLK), np.int32)
    qv_ = np.zeros((gh, gw, CBLK, CBLK), np.int32)

    qp_arr = tuple(jnp.asarray(a) for a in qp_y)
    results = []
    for wave in waves:
        nb = len(wave)
        bys = np.zeros(maxb, np.int32)
        bxs = np.zeros(maxb, np.int32)
        bys[:nb] = [b[0] for b in wave]
        bxs[:nb] = [b[1] for b in wave]
        valid = np.zeros(maxb, bool)
        valid[:nb] = True
        ys = jnp.asarray(bys * BLK)
        xs = jnp.asarray(bxs * BLK)
        va = jnp.asarray(valid)
        hva = jnp.asarray((bys > 0) & valid)
        hvl = jnp.asarray((bxs > 0) & valid)
        m, q, recon_y = step_y(recon_y, src_y_j, ys, xs, va, hva, hvl,
                               *qp_arr, lam)
        # chroma (DC only), same wave
        cys = jnp.asarray(bys * CBLK)
        cxs = jnp.asarray(bxs * CBLK)
        mu, quc, recon_u = step_c(recon_u, src_u_j, cys, cxs, va, hva, hvl,
                                  *qp_arr, lam)
        mv, qvc, recon_v = step_c(recon_v, src_v_j, cys, cxs, va, hva, hvl,
                                  *qp_arr, lam)
        results.append((wave, m, q, quc, qvc))

    for wave, m, q, quc, qvc in results:
        nb = len(wave)
        m = np.asarray(m)[:nb]
        q = np.asarray(q)[:nb]
        quc = np.asarray(quc)[:nb]
        qvc = np.asarray(qvc)[:nb]
        for i, (by, bx) in enumerate(wave):
            y_modes[by, bx] = m[i]
            qy[by, bx] = q[i]
            qu[by, bx] = quc[i]
            qv_[by, bx] = qvc[i]

    decisions = {}
    for by in range(gh):
        for bx in range(gw):
            r4, c4 = by * (BLK >> 2), bx * (BLK >> 2)
            decisions[(r4, c4)] = BlockDecision(
                r4=r4, c4=c4, bsize=cc.BLOCK_16X16,
                y_mode=int(y_modes[by, bx]), uv_mode=cc.DC_PRED,
                tx_type=cc.DCT_DCT, qcoeff_y=qy[by, bx],
                qcoeff_u=qu[by, bx], qcoeff_v=qv_[by, bx])
    recon = dict(y=np.asarray(recon_y).astype(np.uint8),
                 u=np.asarray(recon_u).astype(np.uint8),
                 v=np.asarray(recon_v).astype(np.uint8))
    return decisions, recon


def reconstruct_from_decisions(decisions: Dict, width: int, height: int,
                               qindex: int) -> Dict[str, np.ndarray]:
    """Decoder-side reconstruction from parsed BlockDecisions — shares the
    same wave pipeline ops (used by the verification decoder)."""
    gh, gw = height // BLK, width // BLK
    qp = quant.make_quant_params(qindex)
    recon_y = jnp.zeros((height, width), jnp.int32)
    recon_u = jnp.zeros((height // 2, width // 2), jnp.int32)
    recon_v = jnp.zeros_like(recon_u)

    for by in range(gh):
        for bx in range(gw):
            d = decisions[(by * 4, bx * 4)]
            recon_y = _recon_block(recon_y, d.qcoeff_y, d.y_mode, by * BLK,
                                   bx * BLK, BLK, cc.TX_16X16, d.tx_type, qp)
            recon_u = _recon_block(recon_u, d.qcoeff_u, d.uv_mode, by * CBLK,
                                   bx * CBLK, CBLK, cc.TX_8X8, cc.DCT_DCT, qp)
            recon_v = _recon_block(recon_v, d.qcoeff_v, d.uv_mode, by * CBLK,
                                   bx * CBLK, CBLK, cc.TX_8X8, cc.DCT_DCT, qp)
    return dict(y=np.asarray(recon_y).astype(np.uint8),
                u=np.asarray(recon_u).astype(np.uint8),
                v=np.asarray(recon_v).astype(np.uint8))


@functools.lru_cache(maxsize=None)
def _jit_recon_block(n, tx_size, tx_type, mode):
    def f(recon, q, ys, xs, have_above, have_left,
          zbin, rnd, qv, qshift, deq):
        qp = quant.QuantParams(zbin, rnd, qv, qshift, deq)
        above, left, corner = _gather_neighbors(recon, ys, xs, n,
                                                have_above, have_left)
        pred = intra.predict(mode, above, left, corner, n, n,
                             have_above=have_above, have_left=have_left)
        dq = quant.dequantize(q[None], qp, tx_size)
        rec = tf.inv_txfm2d_add(dq, pred, tx_type, tx_size)[0]
        return jax.lax.dynamic_update_slice(recon, rec, (ys[0], xs[0]))
    return jax.jit(f)


def _recon_block(recon, q, mode, y, x, n, tx_size, tx_type, qp):
    f = _jit_recon_block(n, tx_size, tx_type, int(mode))
    return f(recon, jnp.asarray(q),
             jnp.full((1,), y, jnp.int32), jnp.full((1,), x, jnp.int32),
             jnp.full((1,), y > 0), jnp.full((1,), x > 0),
             *(jnp.asarray(a) for a in qp))
