"""Context-exact transform-block rate estimation on device.

The MD-side counterpart of the reference's warm coefficient-rate
estimate (av1_cost_coeffs_txb role; md_rate_estimation.c +
enc_dec_process.c:3304-3318 rolling-CDF refresh): every quantized
coefficient is priced with the SAME context model the entropy coder
will use — base-level context from the 5-neighbor magnitude sum,
base-range context from the 3-neighbor sum, eob-position class, and
the golomb tail — reading per-symbol bit costs from tables derived
from a live (chained) CDF state.

This replaces the round-2 sparsity-biased analytic curve
(intra_encoder._txb_bits): that curve approximated "concentration
seeking" globally; the context model expresses it exactly — zeros in
quiet neighborhoods cost ~0.1 bit, levels in dense neighborhoods get
cheap symbols — so skip-vs-code and level decisions match what the
coder actually pays.

TPU mapping: the neighbor sums are pad+slice VPU ops; the per-symbol
costs are gathers from tiny tables (42x4, 21x4, 4x3).  Gathers of
this size lower to efficient one-hot selects on TPU; everything is
batched over (B, n, n) blocks.

Tables are built host-side by codec/rate_est.py:exact_coef_tables from
a FrameCDFs state (the default state, or the per-slot chained state
when presets.adapted_rates is on) and passed as runtime args — one
compile serves every frame/qindex.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class CoefTables(NamedTuple):
    """Per-(tx_size, plane) bit-cost tables (all float32 device args).

    base:     (42, 4)  coeff_base symbol bits per nz-map context
    base_eob: (4, 3)   coeff_base_eob symbol bits per eob-position class
    br:       (21, 4)  coeff_br (base-range) symbol bits per br context
    eob:      (ncoeffs + 1,) total eob-position signaling bits per eob
              value (eob_pt symbol + context-coded extra bit + literal
              offset bits); [0] unused
    skip:     (2,) [txb_skip=0 (coded) bits, txb_skip=1 (skip) bits]
    dc_sign:  ()  mean DC-sign symbol bits (ctx 0)
    """
    base: jnp.ndarray
    base_eob: jnp.ndarray
    br: jnp.ndarray
    eob: jnp.ndarray
    skip: jnp.ndarray
    dc_sign: jnp.ndarray


def _statics(n: int):
    """Static (numpy) context maps for an (n, n) 2-D-class txb:
    (scan-position map, nz-ctx offset map, br region offsets,
    eob-position class per eob value)."""
    from svt_av1_tpu.codec import constants as cc
    from svt_av1_tpu.codec import tables as tb
    tx_size = {4: cc.TX_4X4, 8: cc.TX_8X8, 16: cc.TX_16X16,
               32: cc.TX_32X32}[n]
    scan = np.asarray(tb.get_scan(tx_size, cc.DCT_DCT))
    pos = np.zeros(scan.shape[0], np.int32)
    pos[scan] = np.arange(scan.shape[0], dtype=np.int32)
    pos = pos.reshape(n, n)
    off = tb.nz_map_ctx_offset(tx_size).reshape(n, n)
    rr, cmat = np.mgrid[0:n, 0:n]
    br_off = np.where((rr < 2) & (cmat < 2), 7, 14).astype(np.int32)
    br_off[0, 0] = 0
    hw = n * n
    e = np.arange(hw + 1, dtype=np.int64)
    si = e - 1
    ectx = np.where(si <= 0, 0,
                    np.where(si <= hw // 8, 1,
                             np.where(si <= hw // 4, 2, 3))).astype(np.int32)
    return pos, off, br_off, ectx


# cache of static maps keyed by n (host-side, built once)
_STATICS = {}


def get_statics(n: int):
    if n not in _STATICS:
        _STATICS[n] = _statics(n)
    return _STATICS[n]


def _lut(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather from a tiny flat table; clip mode keeps OOB (masked-out
    lanes) in range."""
    return jnp.take(table.reshape(-1), idx, mode="clip")


def txb_bits_exact(qabs: jnp.ndarray, t: CoefTables, n: int) -> jnp.ndarray:
    """Context-exact coded bits for a batch of 2-D-class txbs.

    qabs: (B, n, n) int32 |quantized levels| in RASTER order.
    Returns (B,) float32 bits including the txb_skip flag (skip cost
    for all-zero blocks).

    Exact vs the range coder up to (a) DC sign priced at the ctx-0 mean
    instead of the actual sign symbol and (b) the coder's ~1/32768
    probability quantization — both sub-0.5-bit per block.
    """
    pos_np, off_np, broff_np, ectx_np = get_statics(n)
    pos = jnp.asarray(pos_np)
    lv3 = jnp.minimum(qabs, 3)
    p3 = jnp.pad(lv3, ((0, 0), (0, 2), (0, 2)))
    mag = (p3[:, :n, 1:n + 1] + p3[:, 1:n + 1, :n]
           + p3[:, 1:n + 1, 1:n + 1] + p3[:, :n, 2:n + 2]
           + p3[:, 2:n + 2, :n])
    ctxb = jnp.minimum((mag + 1) >> 1, 4) + jnp.asarray(off_np)
    ctxb = ctxb.at[:, 0, 0].set(0)            # DC short-circuits to 0

    nzm = qabs > 0
    eob = jnp.max(jnp.where(nzm, pos + 1, 0), axis=(1, 2))     # (B,)
    e3 = eob[:, None, None]
    before = pos < (e3 - 1)
    is_eob = pos == (e3 - 1)

    sym = lv3
    base_cost = _lut(t.base, ctxb * 4 + sym)
    base_sum = jnp.sum(jnp.where(before, base_cost, 0.0), axis=(1, 2))

    # the eob coefficient codes coeff_base_eob (symbols level-1 in 0..2)
    ectx = jnp.take(jnp.asarray(ectx_np), eob, mode="clip")
    sym_e = jnp.sum(jnp.where(is_eob, sym, 0), axis=(1, 2)) - 1
    eob_coef = _lut(t.base_eob, ectx * 3 + jnp.clip(sym_e, 0, 2))

    # base-range rounds (level >= 3); same ctx every round
    lv15 = jnp.minimum(qabs, 15)
    p15 = jnp.pad(lv15, ((0, 0), (0, 1), (0, 1)))
    magr = (p15[:, :n, 1:n + 1] + p15[:, 1:n + 1, :n]
            + p15[:, 1:n + 1, 1:n + 1])
    ctxr = jnp.minimum((magr + 1) >> 1, 6) + jnp.asarray(broff_np)
    brr = jnp.clip(qabs - 3, 0, 12)
    full = brr // 3
    extra = brr - 3 * full
    br_cost = (full.astype(jnp.float32) * _lut(t.br, ctxr * 4 + 3)
               + jnp.where(brr < 12, _lut(t.br, ctxr * 4 + extra), 0.0))
    br_sum = jnp.sum(jnp.where(qabs >= 3, br_cost, 0.0), axis=(1, 2))

    # golomb tail (level > 14): write_golomb(level-15) = 2*len(l-14)-1
    gl = jnp.where(
        qabs > 14,
        2.0 * jnp.floor(jnp.log2(jnp.maximum(
            qabs - 14, 1).astype(jnp.float32))) + 1.0,
        0.0)
    gl_sum = jnp.sum(gl, axis=(1, 2))

    # signs: 1 bit each; DC re-priced with the ctx-0 mean symbol cost
    nz_cnt = jnp.sum(nzm, axis=(1, 2)).astype(jnp.float32)
    dc_nz = nzm[:, 0, 0]
    sign_sum = nz_cnt + jnp.where(dc_nz, t.dc_sign - 1.0, 0.0)

    coded = (t.skip[0] + jnp.take(t.eob, eob, mode="clip")
             + base_sum + eob_coef + br_sum + gl_sum + sign_sum)
    return jnp.where(eob > 0, coded, t.skip[1])
