"""AV1 quantization / dequantization (JAX, batched).

Behavioral reference: full_loop.c svt_aom_quantize_b_c_ii (quantize),
md_config_process.c svt_av1_build_quantizer + inv_transforms.c
svt_aom_invert_quant (table construction), dc/ac qlookup tables
(normative, codec/data/av1_quant_tables.npz).

TPU design: quantization is a pure elementwise program over batched
coefficient blocks (B, N) — no scan-order serialization is needed to
*compute* levels (eob derivation happens in the coefficient-coding stage);
everything runs on the VPU in int32.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.codec import constants as cc

_DATA = os.path.join(os.path.dirname(__file__), "..", "codec", "data",
                     "av1_quant_tables.npz")


@functools.lru_cache(maxsize=1)
def _q_tables():
    return dict(np.load(_DATA))


def dc_q(qindex: int, delta: int = 0, bd: int = 8) -> int:
    q = int(np.clip(qindex + delta, 0, 255))
    key = {8: "dc_qlookup", 10: "dc_qlookup_10", 12: "dc_qlookup_12"}[bd]
    return int(_q_tables()[key][q])


def ac_q(qindex: int, delta: int = 0, bd: int = 8) -> int:
    q = int(np.clip(qindex + delta, 0, 255))
    key = {8: "ac_qlookup", 10: "ac_qlookup_10", 12: "ac_qlookup_12"}[bd]
    return int(_q_tables()[key][q])


def invert_quant(d: int):
    """(quant, shift) fixed-point reciprocal of quantizer step d."""
    t = d
    l = 0
    while t > 1:
        t >>= 1
        l += 1
    m = 1 + (1 << (16 + l)) // d
    return m - (1 << 16), 1 << (16 - l)


class QuantParams(NamedTuple):
    """Per-(qindex, plane) quantizer constants for DC ([0]) and AC ([1])."""
    zbin: np.ndarray         # (2,) int32
    round: np.ndarray        # (2,) int32
    quant: np.ndarray        # (2,) int32
    quant_shift: np.ndarray  # (2,) int32
    dequant: np.ndarray      # (2,) int32


@functools.lru_cache(maxsize=None)
def make_quant_params(qindex: int, dc_delta: int = 0, ac_delta: int = 0,
                      bd: int = 8) -> QuantParams:
    qzbin_factor = 64 if qindex == 0 else 80
    qrounding_factor = 64 if qindex == 0 else 48
    zbin, rnd, quant, qshift, deq = ([] for _ in range(5))
    for i in range(2):
        q = dc_q(qindex, dc_delta, bd) if i == 0 else ac_q(qindex, ac_delta, bd)
        qv, sv = invert_quant(q)
        quant.append(qv)
        qshift.append(sv)
        zbin.append((qzbin_factor * q + 64) >> 7)
        rnd.append((qrounding_factor * q) >> 7)
        deq.append(q)
    mk = lambda v: np.array(v, dtype=np.int32)
    return QuantParams(mk(zbin), mk(rnd), mk(quant), mk(qshift), mk(deq))


def tx_log_scale(tx_size: int) -> int:
    """av1_get_tx_scale: 0 (<=16pt), 1 (32pt), 2 (64pt) by square-up size."""
    up = int(cc.tx_size_sqr_up[tx_size])
    return max(0, up - cc.TX_16X16)


def quantize(coeffs: jnp.ndarray, qp: QuantParams, tx_size: int,
             dc_mask: jnp.ndarray | None = None):
    """Quantize batched coefficient blocks.

    coeffs: (B, H, W) int32 in transform domain (coded region).
    dc_mask: (H, W) bool marking the DC position (row0,col0); derived here
             if None.
    Returns (qcoeff, dqcoeff): (B, H, W) int32 each; dqcoeff matches the
    normative dequantizer so inv_txfm2d_add(dqcoeff, ...) is the decoder
    reconstruction.
    """
    log_scale = tx_log_scale(tx_size)
    b, h, w = coeffs.shape
    if dc_mask is None:
        m = np.zeros((h, w), dtype=bool)
        m[0, 0] = True
        dc_mask = jnp.asarray(m)
    sel = dc_mask[None].astype(jnp.int32)  # 1 at DC

    def pick(arr):
        """(2,) shared or (B, 2) per-block constants -> (B|1, H, W)."""
        arr = jnp.asarray(arr)
        if arr.ndim == 2:
            return jnp.where(sel == 1, arr[:, 0, None, None],
                             arr[:, 1, None, None])
        return jnp.where(sel == 1, arr[0], arr[1])

    # zbin/round are rounded down by the tx scale (ROUND_POWER_OF_TWO)
    zbin = pick(qp.zbin)
    rnd = pick(qp.round)
    if log_scale:
        zbin = (zbin + (1 << (log_scale - 1))) >> log_scale
        rnd = (rnd + (1 << (log_scale - 1))) >> log_scale
    quant = pick(qp.quant)
    qshift = pick(qp.quant_shift)
    deq = pick(qp.dequant)

    sign = jnp.where(coeffs < 0, -1, 1)
    abs_c = jnp.abs(coeffs)
    tmp = jnp.clip(abs_c + rnd, -32768, 32767)
    tmp32 = ((((tmp * quant) >> 16) + tmp) * qshift) >> (16 - log_scale)
    nonzero = abs_c >= zbin
    tmp32 = jnp.where(nonzero, tmp32, 0)
    qcoeff = sign * tmp32
    dqcoeff = sign * ((tmp32 * deq) >> log_scale)
    return qcoeff, dqcoeff


def dequant_field(qp: QuantParams, h: int, w: int) -> jnp.ndarray:
    """(B|1, h, w) per-position dequant steps (DC at [0,0], AC elsewhere);
    leading axis is B when qp carries per-block rows."""
    m = np.zeros((h, w), dtype=bool)
    m[0, 0] = True
    sel = jnp.asarray(m)[None]
    arr = jnp.asarray(qp.dequant)
    if arr.ndim == 2:
        return jnp.where(sel, arr[:, 0, None, None], arr[:, 1, None, None])
    return jnp.where(sel, arr[0], arr[1])


def dequantize(qcoeff: jnp.ndarray, qp: QuantParams, tx_size: int):
    """Normative dequant of levels (decoder side / verification)."""
    log_scale = tx_log_scale(tx_size)
    b, h, w = qcoeff.shape
    m = np.zeros((h, w), dtype=bool)
    m[0, 0] = True
    sel = jnp.asarray(m)[None]
    dq_arr = jnp.asarray(qp.dequant)
    deq = jnp.where(sel, dq_arr[0], dq_arr[1])
    sign = jnp.where(qcoeff < 0, -1, 1)
    return sign * ((jnp.abs(qcoeff) * deq) >> log_scale)
