"""Pallas TPU kernel: fused forward transform + quantize + dequantize
for 16x16 blocks.

The MD inner loop's hottest sequence (fwd_txfm2d -> quantize -> dequant)
runs as one VMEM-resident kernel: residual tiles stream HBM->VMEM once,
both matmuls hit the MXU, and the quantizer runs as an epilogue — no
intermediate HBM round trips (the XLA path materializes coeffs between
ops).  Grid is over block tiles; each program handles TILE_B blocks.

Numerics match ops/transforms.fwd_txfm2d + ops/quant.quantize exactly
(same float32 matmuls and int32 quantizer; tested in interpret mode and
vs the XLA path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.ops import quant as quant_mod
from svt_av1_tpu.ops import transforms as tf

TILE_B = 64
N = 16


def _kernel(resid_ref, fv_ref, fh_ref, qparams_ref, coef_ref, qc_ref,
            dqc_ref):
    # resid: (TILE_B*N, N) f32 view of TILE_B blocks stacked row-wise
    x = resid_ref[:].astype(jnp.float32)
    fh = fh_ref[:]                     # (N, N)
    fv = fv_ref[:]                     # (N, N)
    # SAME op order as ops/transforms.fwd_txfm2d (vertical then
    # horizontal) so the float32 rounding matches the XLA path exactly
    x3 = x.reshape(TILE_B, N, N)
    y1 = jax.lax.dot_general(x3, fv, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    y1 = jnp.swapaxes(y1, 1, 2)        # (b, i, w)
    y2 = jax.lax.dot_general(y1, fh, (((2,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    coeff = jnp.round(y2).astype(jnp.int32).reshape(TILE_B * N, N)

    # quantizer epilogue (AC params everywhere, DC fixed at (0,0) lanes)
    zbin_dc = qparams_ref[0, 0]
    zbin_ac = qparams_ref[0, 1]
    rnd_dc = qparams_ref[0, 2]
    rnd_ac = qparams_ref[0, 3]
    q_dc = qparams_ref[0, 4]
    q_ac = qparams_ref[0, 5]
    qs_dc = qparams_ref[0, 6]
    qs_ac = qparams_ref[0, 7]
    dq_dc = qparams_ref[0, 8]
    dq_ac = qparams_ref[0, 9]
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_B * N, N), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_B * N, N), 1)
    is_dc = ((rows % N) == 0) & (cols == 0)
    zbin = jnp.where(is_dc, zbin_dc, zbin_ac)
    rnd = jnp.where(is_dc, rnd_dc, rnd_ac)
    qv = jnp.where(is_dc, q_dc, q_ac)
    qs = jnp.where(is_dc, qs_dc, qs_ac)
    dq = jnp.where(is_dc, dq_dc, dq_ac)

    coef_ref[:] = coeff
    sign = jnp.where(coeff < 0, -1, 1)
    abs_c = jnp.abs(coeff)
    tmp = jnp.clip(abs_c + rnd, -32768, 32767)
    tmp32 = ((((tmp * qv) >> 16) + tmp) * qs) >> 16
    tmp32 = jnp.where(abs_c >= zbin, tmp32, 0)
    qc_ref[:] = sign * tmp32
    dqc_ref[:] = sign * (tmp32 * dq)


@functools.lru_cache(maxsize=None)
def _build(interpret: bool):
    def call(resid2d, fv, fh, qparams, nt):
        return pl.pallas_call(
            _kernel,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((TILE_B * N, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((TILE_B * N, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_B * N, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_B * N, N), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(resid2d.shape, jnp.int32),
                jax.ShapeDtypeStruct(resid2d.shape, jnp.int32),
                jax.ShapeDtypeStruct(resid2d.shape, jnp.int32),
            ],
            interpret=interpret,
        )(resid2d, fv, fh, qparams)

    return call


def fwd_txfm_quant_16x16(resid: jnp.ndarray, qindex: int,
                         interpret: bool = False):
    """Fused DCT_DCT 16x16 forward transform + quantize over a block
    batch.  resid: (B, 16, 16) int; returns (qcoeff, dqcoeff) (B,16,16)
    int32 — identical to the unfused ops path."""
    b = resid.shape[0]
    pad = (-b) % TILE_B
    if pad:
        resid = jnp.concatenate(
            [resid, jnp.zeros((pad, N, N), resid.dtype)], axis=0)
    bt = resid.shape[0]
    fv, fh, _, _ = tf._fwd_matrices(cc.DCT_DCT, cc.TX_16X16)
    qp = quant_mod.make_quant_params(qindex)
    qparams = np.array([[qp.zbin[0], qp.zbin[1], qp.round[0], qp.round[1],
                         qp.quant[0], qp.quant[1], qp.quant_shift[0],
                         qp.quant_shift[1], qp.dequant[0], qp.dequant[1],
                         0, 0, 0, 0, 0, 0]], dtype=np.int32)
    resid2d = resid.astype(jnp.float32).reshape(bt * N, N)
    call = _build(interpret)
    coef, qc, dqc = call(resid2d, jnp.asarray(fv), jnp.asarray(fh),
                         jnp.asarray(qparams), bt // TILE_B)
    coef = coef.reshape(bt, N, N)[:b]
    qc = qc.reshape(bt, N, N)[:b]
    dqc = dqc.reshape(bt, N, N)[:b]
    return coef, qc, dqc


def fwd_txfm_quant_16x16_qp(resid: jnp.ndarray, qp, interpret=False):
    """Fused path with already-built QuantParams (traced arrays, frame
    quantizer — not the per-block AQ rows).  Returns (coeff, qcoeff,
    dqcoeff), each (B, 16, 16) int32 matching the unfused ops path."""
    b = resid.shape[0]
    pad = (-b) % TILE_B
    if pad:
        resid = jnp.concatenate(
            [resid, jnp.zeros((pad, N, N), resid.dtype)], axis=0)
    bt = resid.shape[0]
    fv, fh, _, _ = tf._fwd_matrices(cc.DCT_DCT, cc.TX_16X16)
    zbin, rnd, qv, qshift, deq = (jnp.asarray(a).astype(jnp.int32)
                                  for a in qp)
    zero = jnp.zeros((), jnp.int32)
    qparams = jnp.stack([zbin[0], zbin[1], rnd[0], rnd[1], qv[0], qv[1],
                         qshift[0], qshift[1], deq[0], deq[1],
                         zero, zero, zero, zero, zero,
                         zero]).reshape(1, 16)
    resid2d = resid.astype(jnp.float32).reshape(bt * N, N)
    call = _build(interpret)
    coef, qc, dqc = call(resid2d, jnp.asarray(fv), jnp.asarray(fh),
                         qparams, bt // TILE_B)
    return (coef.reshape(bt, N, N)[:b], qc.reshape(bt, N, N)[:b],
            dqc.reshape(bt, N, N)[:b])
