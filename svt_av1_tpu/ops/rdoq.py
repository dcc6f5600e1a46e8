"""RDOQ — rate-distortion optimized quantization (batched, VPU-only).

Role of the reference's trellis `svt_av1_optimize_b`
(Source/Lib/Codec/full_loop.c:1126): after the uniform quantizer, adjust
coefficient levels so the (distortion + lambda*rate) of the coded block
drops.  The reference walks coefficients serially in scan order with
per-coefficient CDF contexts; a serial DP is hostile to a batched TPU
program, so this is a re-design with the same objective:

1. **level-down pass** — every coefficient with level >= 2 tests level-1
   against the MD rate model; all decisions are independent (no interior
   zeros are created, so scan contexts are not disturbed) and evaluate in
   one vectorized step over (B, N).
2. **eob truncation** — the optimal end-of-block is chosen EXACTLY under
   the MD rate model: prefix-sums of keep/zero costs over scan order give
   the total cost of every legal eob in closed form; an argmin picks the
   winner.  This is the part of the trellis with the largest payoff
   (trailing small levels are expensive: each costs level bits + keeps
   the eob far out) and it vectorizes perfectly.

Rate is priced with the ADAPTED calibrated tables
(rate_est.rdoq_tables_for_qindex — marginal bits measured with live CDF
adaptation), distortion with the same transform-domain proxy MD uses.
Levels stay normative: dequant uses the exact decoder formula, and the
adjusted levels are what the entropy coder emits.

**Default OFF** (presets ship rdoq=False).  Measured result (round 2,
4-point BD-rate on the bench-class clip, qp 20-50): every alpha in
[0.1, 1.0] LOSES 2.7-22% BD-rate.  Cause: this encoder's dead-zone
quantizer (rounding 48/128) + sparsity-biased MD rate curve already
operate past the trellis arbitrage point — the cheapest coefficient
drop available (~200+ SSE/real-bit) is more expensive than moving along
the encoder's own RD curve (~84-130 SSE/bit between adjacent qps), so
no uniform-lambda trade can pay.  The reference's trellis profits from
a plain 0.5-offset quantizer and context-exact rates; replicating its
gain here would need per-coefficient context-exact pricing, not a
lambda rescale.  The component is kept for opt-in use and as the
vehicle for future context-exact pricing.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.ops import quant


@functools.lru_cache(maxsize=None)
def _scan_for(tx_size: int, tx_type: int) -> np.ndarray:
    from svt_av1_tpu.codec import tables as tb
    return np.asarray(tb.get_scan(tx_size, tx_type), np.int32)


def _level_bits(l, level_tbl):
    """True (rate-prediction) per-level bit cost from the calibrated
    table (rate_est.true_tables_for_qindex): level_tbl[0] is the cost
    of a zero before eob; zeros after eob are priced by the eob pass.

    RDOQ must NOT use the sparsity-biased MD decision curve — that
    curve deliberately overprices levels to steer MODE selection (where
    the bias cancels across candidates); in a direct bits-vs-distortion
    tradeoff it zeroes far past the RD optimum."""
    from svt_av1_tpu.codec.rate_est import MAX_LEVEL
    return jnp.take(level_tbl, jnp.minimum(l, MAX_LEVEL), axis=0)


def optimize_levels(coeffs, qcoeff, deq_field, tx_size, tx_type,
                    tbl, lam, s2, alpha=1.0,
                    do_level=True, do_eob=True):
    """Optimize quantized levels of batched blocks.

    coeffs:    (B, n, n) int32 transform coefficients (pre-quant).
    qcoeff:    (B, n, n) int32 levels from the uniform quantizer.
    deq_field: (B|1, n, n) int32 per-position dequant steps
               (quant.dequant_field).
    tbl:       (64 + n*n + 1,) float32 bundle: adapted per-level bit
               costs (64) followed by the adapted eob-position costs
               (rate_est.rdoq_tables_for_qindex).
    lam:       scalar or (B,) float32 lambda.
    s2:        float scalar mapping coeff-domain SSE to pixel SSE.

    Returns (qcoeff', dqcoeff'): adjusted levels + their normative
    dequantization (both (B, n, n) int32).
    """
    b, n, _ = qcoeff.shape
    nn = n * n
    log_scale = quant.tx_log_scale(tx_size)
    scan = _scan_for(tx_size, tx_type)
    level_tbl = tbl[:64]
    eob_tbl = tbl[64:64 + nn + 1]

    # all costs work on magnitudes: the quantizer preserves sign, so
    # |c - sign*dq| == ||c| - dq|
    c = jnp.abs(coeffs.reshape(b, nn)[:, scan]).astype(jnp.float32)
    q = qcoeff.reshape(b, nn)[:, scan]
    dqv = deq_field.reshape(deq_field.shape[0], nn)[:, scan]
    # alpha < 1 compensates for CDF adaptation: the calibrated tables
    # price DEFAULT-CDF bits, but the live coder adapts toward the
    # stream's level distribution, so the true marginal cost of a kept
    # coefficient is well below its static cost (the reference instead
    # re-derives tables from rolling CDFs, enc_dec_process.c:3304).
    lamc = (lam[:, None] if jnp.ndim(lam) else lam) * jnp.float32(alpha)

    l = jnp.abs(q)
    s = jnp.sign(q)
    dq = (l * dqv) >> log_scale
    dq1 = (jnp.maximum(l - 1, 0) * dqv) >> log_scale

    # pass 1: independent level-down for l >= 2
    a_keep = s2 * (c - dq) ** 2 + lamc * _level_bits(l, level_tbl)
    a_down = (s2 * (c - dq1) ** 2
              + lamc * _level_bits(jnp.maximum(l - 1, 0), level_tbl))
    down = (l >= 2) & (a_down < a_keep) & do_level
    l = jnp.where(down, l - 1, l)
    dq = jnp.where(down, dq1, dq)

    # pass 2: exact eob under the MD rate model.
    # cost(eob=k) = sum_{i<k} keep_i + sum_{i>=k} zero_i + lam*eob_tbl[k]
    keep = s2 * (c - dq) ** 2 + lamc * _level_bits(l, level_tbl)
    zero = s2 * c * c
    ka = jnp.cumsum(keep, axis=1)
    za = jnp.cumsum(zero, axis=1)
    ka = jnp.concatenate([jnp.zeros((b, 1), jnp.float32), ka], axis=1)
    za = jnp.concatenate([jnp.zeros((b, 1), jnp.float32), za], axis=1)
    cost_k = ka + (za[:, -1:] - za) + lamc * eob_tbl[None, :nn + 1]
    # legal eob: 0 (all-zero block) or just past a nonzero level
    legal = jnp.concatenate(
        [jnp.ones((b, 1), bool), l > 0], axis=1)
    k_best = jnp.argmin(jnp.where(legal, cost_k, jnp.float32(np.inf)),
                        axis=1)
    keep_m = jnp.arange(nn, dtype=jnp.int32)[None, :] < k_best[:, None]
    l = jnp.where(keep_m | (not do_eob), l, 0)

    q_scan = s * l
    dq_scan = s * ((l * dqv) >> log_scale)
    out_q = jnp.zeros((b, nn), qcoeff.dtype).at[:, scan].set(q_scan)
    out_dq = jnp.zeros((b, nn), qcoeff.dtype).at[:, scan].set(dq_scan)
    return out_q.reshape(b, n, n), out_dq.reshape(b, n, n)
