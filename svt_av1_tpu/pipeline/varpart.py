"""Variable square partitions (32x32 / 16x16) for intra frames.

TPU design: a 2:1 wavefront over the 32x32 grid.  Each wave step first
runs the four 16x16 sub-blocks sequentially in z-order (writing recon,
so intra prediction chains stay exact), then evaluates the 32x32
PARTITION_NONE candidate from the SAME outside neighbors (the sub
writes are interior, so its gathers are unaffected) and keeps whichever
costs less; the recon region is overwritten when the 32 wins.  This is
a bottom-up merge that needs no speculative recon rollback.

The reference's analog is the PD0->refinement->PD1 depth funnel
(enc_dec_process.c perform_pred_depth_refinement); here depth selection
is exact RD over both depths, batched over the frame wave.

Round-1 scope: intra frames on quality presets, DLF off (interior
16-edges of a 32 transform must not be deblocked; mask-aware DLF comes
with the general filter stage)."""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.codec.syntax import BlockDecision
from svt_av1_tpu.ops import quant
from svt_av1_tpu.pipeline.intra_encoder import (
    BLK, CBLK, MODES, _rd_step, _rd_step_chroma, _gather_block,
    _scatter_blocks, tr_bl_avail, _wave_schedule)

# z-order of the 16x16 sub-blocks within a 32x32
_SUBS = ((0, 0), (0, 1), (1, 0), (1, 1))
# net extra signaling of SPLIT (3 extra partition/mode/uv symbol groups)
SPLIT_EXTRA_BITS = 24.0


def _schedule32(gh32, gw32, gh16, gw16, maxb):
    """2:1 wavefront over the 32-grid + per-slot static flags."""
    waves = _wave_schedule(gh32, gw32, maxb)
    nw = len(waves)
    bys = np.zeros((nw, maxb), np.int32)
    bxs = np.zeros((nw, maxb), np.int32)
    valid = np.zeros((nw, maxb), bool)
    v32 = np.zeros((nw, maxb), bool)       # full 32 block inside frame
    tr32 = np.zeros((nw, maxb), bool)
    bl32 = np.zeros((nw, maxb), bool)
    sub_valid = np.zeros((nw, maxb, 4), bool)
    sub_tr = np.zeros((nw, maxb, 4), bool)
    sub_bl = np.zeros((nw, maxb, 4), bool)
    for i, wave in enumerate(waves):
        for j, (by, bx) in enumerate(wave):
            valid[i, j] = True
            full = (by * 2 + 2 <= gh16) and (bx * 2 + 2 <= gw16)
            v32[i, j] = full
            t, b = tr_bl_avail(by, bx, gh32, gw32, m=2)
            tr32[i, j], bl32[i, j] = t, b
            for s, (dr, dc) in enumerate(_SUBS):
                sy, sx = by * 2 + dr, bx * 2 + dc
                if sy < gh16 and sx < gw16:
                    sub_valid[i, j, s] = True
                    st, sb = tr_bl_avail(sy, sx, gh16, gw16, m=4)
                    sub_tr[i, j, s], sub_bl[i, j, s] = st, sb
    return (waves, bys, bxs, valid, v32, tr32, bl32, sub_valid, sub_tr,
            sub_bl)


def _fill_coords(waves, bys, bxs):
    for i, wave in enumerate(waves):
        for j, (by, bx) in enumerate(wave):
            bys[i, j] = by
            bxs[i, j] = bx


def _frame_program_fn(nw, maxb, modes, bd=8):
    def frame(ry, ru, rv, sy, su, sv, bys, bxs, valid, v32, tr32, bl32,
              sub_valid, sub_tr, sub_bl, zbin, rnd, qv_, qshift, deq,
              lam):
        qp = (zbin, rnd, qv_, qshift, deq)
        ch32 = jnp.zeros((nw, maxb), bool)
        m32a = jnp.zeros((nw, maxb), jnp.int32)
        uv32a = jnp.zeros((nw, maxb), jnp.int32)
        q32a = jnp.zeros((nw, maxb, 32, 32), jnp.int32)
        qu32a = jnp.zeros((nw, maxb, 16, 16), jnp.int32)
        qv32a = jnp.zeros((nw, maxb, 16, 16), jnp.int32)
        m16a = jnp.zeros((nw, maxb, 4), jnp.int32)
        uv16a = jnp.zeros((nw, maxb, 4), jnp.int32)
        q16a = jnp.zeros((nw, maxb, 4, 16, 16), jnp.int32)
        qu16a = jnp.zeros((nw, maxb, 4, 8, 8), jnp.int32)
        qv16a = jnp.zeros((nw, maxb, 4, 8, 8), jnp.int32)

        def body(i, carry):
            (ry, ru, rv, ch, m32c, uv32c, q32c, qu32c, qv32c, m16c,
             uv16c, q16c, qu16c, qv16c) = carry
            by = bys[i]
            bx = bxs[i]
            va = valid[i]
            total16 = jnp.zeros(by.shape, jnp.float32)
            subs = []
            for s, (dr, dc) in enumerate(_SUBS):
                ys = by * 32 + dr * 16
                xs = bx * 32 + dc * 16
                sva = sub_valid[i, :, s] & va
                ha = (ys > 0) & sva
                hl = (xs > 0) & sva
                m, q, ry, cost = _rd_step(
                    ry, sy, ys, xs, sva, ha, hl, qp, lam, BLK,
                    cc.TX_16X16, modes, 0,
                    tr_avail=sub_tr[i, :, s] & sva,
                    bl_avail=sub_bl[i, :, s] & sva, bd=bd,
                    return_cost=True)
                total16 = total16 + jnp.where(sva, cost, 0.0)
                um, qu, qvq, ru, rv = _rd_step_chroma(
                    ru, rv, su, sv, ys // 2, xs // 2, sva, ha, hl, qp,
                    lam, bd=bd)
                subs.append((m, q, um, qu, qvq))

            # 32x32 candidate: outside neighbors only (sub writes are
            # interior), so it reads the post-sub recon safely
            va32 = va & v32[i]
            ys32 = by * 32
            xs32 = bx * 32
            ha32 = (ys32 > 0) & va32
            hl32 = (xs32 > 0) & va32
            m32, q32, rec32, c32 = _rd_step(
                ry, sy, ys32, xs32, va32, ha32, hl32, qp, lam, 32,
                cc.TX_32X32, modes, 0, tr_avail=tr32[i] & va32,
                bl_avail=bl32[i] & va32, bd=bd, no_write=True)
            choose = va32 & (c32 < total16 + lam * SPLIT_EXTRA_BITS)

            cur32 = _gather_block(ry, ys32, xs32, 32, 32)
            ry = _scatter_blocks(ry, jnp.where(choose[:, None, None],
                                               rec32, cur32),
                                 ys32, xs32, va)
            uvm32, qu32, qv32, recu32, recv32 = _rd_step_chroma(
                ru, rv, su, sv, ys32 // 2, xs32 // 2, choose, ha32 & choose,
                hl32 & choose, qp, lam, bd=bd, n=16,
                tx_size=cc.TX_16X16, no_write=True)
            curu = _gather_block(ru, ys32 // 2, xs32 // 2, 16, 16)
            curv = _gather_block(rv, ys32 // 2, xs32 // 2, 16, 16)
            ru = _scatter_blocks(ru, jnp.where(choose[:, None, None],
                                               recu32, curu),
                                 ys32 // 2, xs32 // 2, va)
            rv = _scatter_blocks(rv, jnp.where(choose[:, None, None],
                                               recv32, curv),
                                 ys32 // 2, xs32 // 2, va)

            m16s = jnp.stack([s_[0] for s_ in subs], axis=1)
            q16s = jnp.stack([s_[1] for s_ in subs], axis=1)
            uv16s = jnp.stack([s_[2] for s_ in subs], axis=1)
            qu16s = jnp.stack([s_[3] for s_ in subs], axis=1)
            qv16s = jnp.stack([s_[4] for s_ in subs], axis=1)
            return (ry, ru, rv, ch.at[i].set(choose),
                    m32c.at[i].set(m32), uv32c.at[i].set(uvm32),
                    q32c.at[i].set(q32), qu32c.at[i].set(qu32),
                    qv32c.at[i].set(qv32), m16c.at[i].set(m16s),
                    uv16c.at[i].set(uv16s), q16c.at[i].set(q16s),
                    qu16c.at[i].set(qu16s), qv16c.at[i].set(qv16s))

        init = (ry, ru, rv, ch32, m32a, uv32a, q32a, qu32a, qv32a, m16a,
                uv16a, q16a, qu16a, qv16a)
        return jax.lax.fori_loop(0, nw, body, init)

    return frame


@functools.lru_cache(maxsize=None)
def _jit_program(nw, maxb, modes, bd=8):
    return jax.jit(_frame_program_fn(nw, maxb, modes, bd))


def encode_intra_frame_varpart(src_y, src_u, src_v, qindex: int,
                               modes=MODES, bd: int = 8
                               ) -> Tuple[Dict, Dict[str, np.ndarray]]:
    """Intra frame with 32/16 square partition decisions."""
    h, w = src_y.shape
    assert h % BLK == 0 and w % BLK == 0
    gh16, gw16 = h // 16, w // 16
    gh32, gw32 = (gh16 + 1) // 2, (gw16 + 1) // 2
    maxb = max(1, min(gh32, gw32))
    sched = _schedule32(gh32, gw32, gh16, gw16, maxb)
    (waves, bys, bxs, valid, v32, tr32, bl32, sub_valid, sub_tr,
     sub_bl) = sched
    _fill_coords(waves, bys, bxs)
    nw = len(waves)
    qp_y = quant.make_quant_params(qindex, bd=bd)
    qstep = quant.dc_q(qindex, bd=bd) / 8.0
    lam = np.float32(0.7 * qstep * qstep)
    prog = _jit_program(nw, maxb, tuple(modes), bd)
    out = prog(jnp.zeros((h, w), jnp.int32),
               jnp.zeros((h // 2, w // 2), jnp.int32),
               jnp.zeros((h // 2, w // 2), jnp.int32),
               jnp.asarray(src_y.astype(np.int32)),
               jnp.asarray(src_u.astype(np.int32)),
               jnp.asarray(src_v.astype(np.int32)),
               jnp.asarray(bys), jnp.asarray(bxs), jnp.asarray(valid),
               jnp.asarray(v32), jnp.asarray(tr32), jnp.asarray(bl32),
               jnp.asarray(sub_valid), jnp.asarray(sub_tr),
               jnp.asarray(sub_bl), *(jnp.asarray(a) for a in qp_y), lam)
    (ry, ru, rv, ch, m32, uv32, q32, qu32, qv32, m16, uv16, q16, qu16,
     qv16) = [np.asarray(o) for o in out]

    decisions = {}
    for i, wave in enumerate(waves):
        for j, (by, bx) in enumerate(wave):
            if ch[i, j] and v32_ok(by, bx, gh16, gw16):
                r4, c4 = by * 8, bx * 8
                decisions[(r4, c4)] = BlockDecision(
                    r4=r4, c4=c4, bsize=cc.BLOCK_32X32,
                    y_mode=int(m32[i, j]), uv_mode=int(uv32[i, j]),
                    tx_type=cc.DCT_DCT, qcoeff_y=q32[i, j],
                    qcoeff_u=qu32[i, j], qcoeff_v=qv32[i, j])
            else:
                for s, (dr, dc) in enumerate(_SUBS):
                    sy16, sx16 = by * 2 + dr, bx * 2 + dc
                    if sy16 >= gh16 or sx16 >= gw16:
                        continue
                    r4, c4 = sy16 * 4, sx16 * 4
                    decisions[(r4, c4)] = BlockDecision(
                        r4=r4, c4=c4, bsize=cc.BLOCK_16X16,
                        y_mode=int(m16[i, j, s]),
                        uv_mode=int(uv16[i, j, s]), tx_type=cc.DCT_DCT,
                        qcoeff_y=q16[i, j, s], qcoeff_u=qu16[i, j, s],
                        qcoeff_v=qv16[i, j, s])
    dt = np.uint8 if bd == 8 else np.uint16
    recon = dict(y=ry.astype(dt), u=ru.astype(dt), v=rv.astype(dt))
    return decisions, recon


def v32_ok(by, bx, gh16, gw16) -> bool:
    return by * 2 + 2 <= gh16 and bx * 2 + 2 <= gw16
