"""Variable square partitions (64 / 32 / 16) for intra frames.

TPU design: a 2:1 wavefront over the 64x64 superblock grid.  Each wave
step walks one SB per slot, batched across slots:

  for each 32x32 quadrant in z-order:
      run the four 16x16 sub-blocks sequentially in z-order (writing
      recon, so intra prediction chains stay exact), then evaluate the
      32x32 PARTITION_NONE candidate from the SAME outside neighbors
      (the sub writes are interior, so its gathers are unaffected) and
      keep whichever costs less;
  then evaluate the 64x64 PARTITION_NONE candidate (TX_64X64, coded
  32x32 coefficient region) against the chosen quadrant total and
  overwrite the SB recon when it wins.

This is a bottom-up merge that needs no speculative recon rollback —
the reference's analog is the PD0 -> refinement -> PD1 depth funnel
(enc_dec_process.c perform_pred_depth_refinement); here depth selection
is exact RD over all three depths, batched over the frame wave.

Scope: intra frames on quality presets, DLF off (interior edges of a
merged transform must not be deblocked; mask-aware DLF comes with the
general filter stage)."""
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
    _scatter_blocks, split_fi_mode, tr_bl_avail, _wave_schedule)

# z-order of sub-blocks within their parent
_SUBS = ((0, 0), (0, 1), (1, 0), (1, 1))
# net extra signaling of SPLIT (3 extra partition/mode/uv symbol groups)
SPLIT_EXTRA_BITS = 24.0


def _schedule64(gh64, gw64, gh16, gw16, maxb):
    """2:1 wavefront over the 64-grid + static per-slot availability for
    every level of the SB's square tree."""
    gh32, gw32 = (gh16 + 1) // 2, (gw16 + 1) // 2
    waves = _wave_schedule(gh64, gw64, maxb)
    nw = len(waves)
    sh = (nw, maxb)
    bys = np.zeros(sh, np.int32)
    bxs = np.zeros(sh, np.int32)
    valid = np.zeros(sh, bool)
    v64 = np.zeros(sh, bool)
    tr64 = np.zeros(sh, bool)
    bl64 = np.zeros(sh, bool)
    q_valid = np.zeros(sh + (4,), bool)     # full 32 quadrant in frame
    q_any = np.zeros(sh + (4,), bool)       # quadrant overlaps frame
    q_tr = np.zeros(sh + (4,), bool)
    q_bl = np.zeros(sh + (4,), bool)
    s_valid = np.zeros(sh + (4, 4), bool)   # 16 sub inside frame
    s_tr = np.zeros(sh + (4, 4), bool)
    s_bl = np.zeros(sh + (4, 4), bool)
    for i, wave in enumerate(waves):
        for j, (by, bx) in enumerate(wave):
            bys[i, j] = by
            bxs[i, j] = bx
            valid[i, j] = True
            v64[i, j] = (by * 4 + 4 <= gh16) and (bx * 4 + 4 <= gw16)
            t, b = tr_bl_avail(by, bx, gh64, gw64, m=1)
            tr64[i, j], bl64[i, j] = t, b
            for q, (qr, qc) in enumerate(_SUBS):
                qy, qx = by * 2 + qr, bx * 2 + qc
                if qy * 2 < gh16 and qx * 2 < gw16:
                    q_any[i, j, q] = True
                full = (qy * 2 + 2 <= gh16) and (qx * 2 + 2 <= gw16)
                q_valid[i, j, q] = full and qy < gh32 and qx < gw32
                if qy < gh32 and qx < gw32:
                    t, b = tr_bl_avail(qy, qx, gh32, gw32, m=2)
                    q_tr[i, j, q], q_bl[i, j, q] = t, b
                for s, (sr, sc) in enumerate(_SUBS):
                    sy, sx = qy * 2 + sr, qx * 2 + sc
                    if sy < gh16 and sx < gw16:
                        s_valid[i, j, q, s] = True
                        st, sb = tr_bl_avail(sy, sx, gh16, gw16, m=4)
                        s_tr[i, j, q, s], s_bl[i, j, q, s] = st, sb
    return (waves, bys, bxs, valid, v64, tr64, bl64, q_valid, q_any,
            q_tr, q_bl, s_valid, s_tr, s_bl)


def _frame_program_fn(nw, maxb, modes, bd=8, do64=True):
    uv_dct = (cc.DCT_DCT,) * 4

    def frame(ry, ru, rv, sy, su, sv, bys, bxs, valid, v64, tr64, bl64,
              q_valid, q_any, q_tr, q_bl, s_valid, s_tr, s_bl,
              zbin, rnd, qv_, qshift, deq, lam):
        qp = (zbin, rnd, qv_, qshift, deq)
        z = lambda *shape: jnp.zeros((nw, maxb) + shape, jnp.int32)
        acc = dict(
            ch64=jnp.zeros((nw, maxb), bool),
            m64=z(), uv64=z(), q64=z(32, 32), qu64=z(32, 32),
            qv64=z(32, 32),
            ch32=jnp.zeros((nw, maxb, 4), bool),
            m32=z(4), uv32=z(4), q32=z(4, 32, 32), qu32=z(4, 16, 16),
            qv32=z(4, 16, 16),
            m16=z(4, 4), uv16=z(4, 4), q16=z(4, 4, 16, 16),
            qu16=z(4, 4, 8, 8), qv16=z(4, 4, 8, 8))
        names = list(acc.keys())

        def body(i, carry):
            ry, ru, rv = carry[0], carry[1], carry[2]
            a = dict(zip(names, carry[3:]))
            by = bys[i]
            bx = bxs[i]
            va = valid[i]
            total_sb = jnp.zeros(by.shape, jnp.float32)

            for q, (qr, qc) in enumerate(_SUBS):
                qy16 = by * 4 + qr * 2         # quadrant top in 16-grid
                qx16 = bx * 4 + qc * 2
                total16 = jnp.zeros(by.shape, jnp.float32)
                subs = []
                for s, (sr, sc) in enumerate(_SUBS):
                    ys = (qy16 + sr) * 16
                    xs = (qx16 + sc) * 16
                    sva = s_valid[i, :, q, s] & va
                    ha = (ys > 0) & sva
                    hl = (xs > 0) & sva
                    m, qy_c, ry, cost = _rd_step(
                        ry, sy, ys, xs, sva, ha, hl, qp, lam, BLK,
                        cc.TX_16X16, modes, 0,
                        tr_avail=s_tr[i, :, q, s] & sva,
                        bl_avail=s_bl[i, :, q, s] & sva, bd=bd,
                        return_cost=True)
                    total16 = total16 + jnp.where(sva, cost, 0.0)
                    um, qu, qvq, ru, rv = _rd_step_chroma(
                        ru, rv, su, sv, ys // 2, xs // 2, sva, ha, hl,
                        qp, lam, bd=bd)
                    subs.append((m, qy_c, um, qu, qvq))

                # 32x32 candidate from outside neighbors
                va32 = va & q_valid[i, :, q]
                ys32 = qy16 * 16
                xs32 = qx16 * 16
                ha32 = (ys32 > 0) & va32
                hl32 = (xs32 > 0) & va32
                m32, q32c, rec32, c32 = _rd_step(
                    ry, sy, ys32, xs32, va32, ha32, hl32, qp, lam, 32,
                    cc.TX_32X32, modes, 0,
                    tr_avail=q_tr[i, :, q] & va32,
                    bl_avail=q_bl[i, :, q] & va32, bd=bd, no_write=True)
                choose = va32 & (c32 < total16 + lam * SPLIT_EXTRA_BITS)
                cur32 = _gather_block(ry, ys32, xs32, 32, 32)
                ry = _scatter_blocks(
                    ry, jnp.where(choose[:, None, None], rec32, cur32),
                    ys32, xs32, va & q_any[i, :, q])
                uvm32, qu32, qv32, recu32, recv32 = _rd_step_chroma(
                    ru, rv, su, sv, ys32 // 2, xs32 // 2, choose,
                    ha32 & choose, hl32 & choose, qp, lam, bd=bd, n=16,
                    tx_size=cc.TX_16X16, no_write=True)
                curu = _gather_block(ru, ys32 // 2, xs32 // 2, 16, 16)
                curv = _gather_block(rv, ys32 // 2, xs32 // 2, 16, 16)
                ru = _scatter_blocks(
                    ru, jnp.where(choose[:, None, None], recu32, curu),
                    ys32 // 2, xs32 // 2, va & q_any[i, :, q])
                rv = _scatter_blocks(
                    rv, jnp.where(choose[:, None, None], recv32, curv),
                    ys32 // 2, xs32 // 2, va & q_any[i, :, q])

                chosen_cost = jnp.where(
                    choose, c32 + lam * 0.0,
                    total16 + lam * SPLIT_EXTRA_BITS)
                total_sb = total_sb + jnp.where(q_any[i, :, q],
                                                chosen_cost, 0.0)

                a["ch32"] = a["ch32"].at[i, :, q].set(choose)
                a["m32"] = a["m32"].at[i, :, q].set(m32)
                a["uv32"] = a["uv32"].at[i, :, q].set(uvm32)
                a["q32"] = a["q32"].at[i, :, q].set(q32c)
                a["qu32"] = a["qu32"].at[i, :, q].set(qu32)
                a["qv32"] = a["qv32"].at[i, :, q].set(qv32)
                m16s = jnp.stack([t[0] for t in subs], axis=1)
                q16s = jnp.stack([t[1] for t in subs], axis=1)
                uv16s = jnp.stack([t[2] for t in subs], axis=1)
                qu16s = jnp.stack([t[3] for t in subs], axis=1)
                qv16s = jnp.stack([t[4] for t in subs], axis=1)
                a["m16"] = a["m16"].at[i, :, q].set(m16s)
                a["uv16"] = a["uv16"].at[i, :, q].set(uv16s)
                a["q16"] = a["q16"].at[i, :, q].set(q16s)
                a["qu16"] = a["qu16"].at[i, :, q].set(qu16s)
                a["qv16"] = a["qv16"].at[i, :, q].set(qv16s)

            if do64:
                # 64x64 candidate (TX_64X64: 32x32 coded coefficients)
                va64 = va & v64[i]
                ys64 = by * 64
                xs64 = bx * 64
                ha64 = (ys64 > 0) & va64
                hl64 = (xs64 > 0) & va64
                m64, q64c, rec64, c64 = _rd_step(
                    ry, sy, ys64, xs64, va64, ha64, hl64, qp, lam, 64,
                    cc.TX_64X64, modes, 0, tr_avail=tr64[i] & va64,
                    bl_avail=bl64[i] & va64, bd=bd, no_write=True)
                ch64 = va64 & (c64 < total_sb + lam * SPLIT_EXTRA_BITS)
                cur64 = _gather_block(ry, ys64, xs64, 64, 64)
                ry = _scatter_blocks(
                    ry, jnp.where(ch64[:, None, None], rec64, cur64),
                    ys64, xs64, va)
                uvm64, qu64, qv64, recu64, recv64 = _rd_step_chroma(
                    ru, rv, su, sv, ys64 // 2, xs64 // 2, ch64,
                    ha64 & ch64, hl64 & ch64, qp, lam, bd=bd, n=32,
                    tx_size=cc.TX_32X32, no_write=True,
                    uv_tx_types=uv_dct)
                curu = _gather_block(ru, ys64 // 2, xs64 // 2, 32, 32)
                curv = _gather_block(rv, ys64 // 2, xs64 // 2, 32, 32)
                ru = _scatter_blocks(
                    ru, jnp.where(ch64[:, None, None], recu64, curu),
                    ys64 // 2, xs64 // 2, va)
                rv = _scatter_blocks(
                    rv, jnp.where(ch64[:, None, None], recv64, curv),
                    ys64 // 2, xs64 // 2, va)
                a["ch64"] = a["ch64"].at[i].set(ch64)
                a["m64"] = a["m64"].at[i].set(m64)
                a["uv64"] = a["uv64"].at[i].set(uvm64)
                a["q64"] = a["q64"].at[i].set(q64c)
                a["qu64"] = a["qu64"].at[i].set(qu64)
                a["qv64"] = a["qv64"].at[i].set(qv64)

            return (ry, ru, rv) + tuple(a[k] for k in names)

        init = (ry, ru, rv) + tuple(acc[k] for k in names)
        out = jax.lax.fori_loop(0, nw, body, init)
        return out

    return frame


@functools.lru_cache(maxsize=None)
def _jit_program(nw, maxb, modes, bd=8, do64=True):
    return jax.jit(_frame_program_fn(nw, maxb, modes, bd, do64=do64))


def encode_intra_frame_varpart(src_y, src_u, src_v, qindex: int,
                               modes=MODES, bd: int = 8, do64=True
                               ) -> Tuple[Dict, Dict[str, np.ndarray]]:
    """Intra frame with 64/32/16 square partition decisions."""
    h, w = src_y.shape
    assert h % BLK == 0 and w % BLK == 0
    gh16, gw16 = h // 16, w // 16
    gh64, gw64 = (gh16 + 3) // 4, (gw16 + 3) // 4
    maxb = max(1, min(gh64, (gw64 + 1) // 2))
    sched = _schedule64(gh64, gw64, gh16, gw16, maxb)
    (waves, bys, bxs, valid, v64, tr64, bl64, q_valid, q_any, q_tr,
     q_bl, s_valid, s_tr, s_bl) = sched
    nw = len(waves)
    qp_y = quant.make_quant_params(qindex, bd=bd)
    qstep = quant.dc_q(qindex, bd=bd) / 8.0
    lam = np.float32(0.7 * qstep * qstep)
    prog = _jit_program(nw, maxb, tuple(modes), bd, do64)
    # recon planes padded up to whole SBs so 64-level gathers stay
    # in-bounds; the coded size (h, w) is cropped at the end
    ph, pw = gh64 * 64, gw64 * 64
    out = prog(jnp.zeros((ph, pw), jnp.int32),
               jnp.zeros((ph // 2, pw // 2), jnp.int32),
               jnp.zeros((ph // 2, pw // 2), jnp.int32),
               jnp.asarray(_pad_to(src_y.astype(np.int32), ph, pw)),
               jnp.asarray(_pad_to(src_u.astype(np.int32), ph // 2,
                                   pw // 2)),
               jnp.asarray(_pad_to(src_v.astype(np.int32), ph // 2,
                                   pw // 2)),
               jnp.asarray(bys), jnp.asarray(bxs), jnp.asarray(valid),
               jnp.asarray(v64), jnp.asarray(tr64), jnp.asarray(bl64),
               jnp.asarray(q_valid), jnp.asarray(q_any),
               jnp.asarray(q_tr), jnp.asarray(q_bl),
               jnp.asarray(s_valid), jnp.asarray(s_tr),
               jnp.asarray(s_bl), *(jnp.asarray(a) for a in qp_y), lam)
    (ry, ru, rv, ch64, m64, uv64, q64, qu64, qv64, ch32, m32, uv32,
     q32, qu32, qv32, m16, uv16, q16, qu16, qv16) = \
        [np.asarray(o) for o in out]

    decisions = {}
    for i, wave in enumerate(waves):
        for j, (by, bx) in enumerate(wave):
            if ch64[i, j]:
                r4, c4 = by * 16, bx * 16
                decisions[(r4, c4)] = BlockDecision(
                    r4=r4, c4=c4, bsize=cc.BLOCK_64X64,
                    y_mode=int(m64[i, j]), uv_mode=int(uv64[i, j]),
                    tx_type=cc.DCT_DCT, qcoeff_y=q64[i, j],
                    qcoeff_u=qu64[i, j], qcoeff_v=qv64[i, j])
                continue  # (64: filter-intra illegal, modes are raw)
            for q, (qr, qc) in enumerate(_SUBS):
                qy16, qx16 = by * 4 + qr * 2, bx * 4 + qc * 2
                if qy16 >= gh16 or qx16 >= gw16:
                    continue
                if ch32[i, j, q]:
                    r4, c4 = qy16 * 4, qx16 * 4
                    ym32, fi32 = split_fi_mode(int(m32[i, j, q]))
                    decisions[(r4, c4)] = BlockDecision(
                        r4=r4, c4=c4, bsize=cc.BLOCK_32X32,
                        y_mode=ym32, uv_mode=int(uv32[i, j, q]),
                        tx_type=cc.DCT_DCT, qcoeff_y=q32[i, j, q],
                        qcoeff_u=qu32[i, j, q], qcoeff_v=qv32[i, j, q],
                        filter_intra_mode=fi32)
                    continue
                for s, (sr, sc) in enumerate(_SUBS):
                    sy16, sx16 = qy16 + sr, qx16 + sc
                    if sy16 >= gh16 or sx16 >= gw16:
                        continue
                    r4, c4 = sy16 * 4, sx16 * 4
                    ym16, fi16 = split_fi_mode(int(m16[i, j, q, s]))
                    decisions[(r4, c4)] = BlockDecision(
                        r4=r4, c4=c4, bsize=cc.BLOCK_16X16,
                        y_mode=ym16,
                        uv_mode=int(uv16[i, j, q, s]),
                        tx_type=cc.DCT_DCT,
                        qcoeff_y=q16[i, j, q, s],
                        qcoeff_u=qu16[i, j, q, s],
                        qcoeff_v=qv16[i, j, q, s],
                        filter_intra_mode=fi16)
    dt = np.uint8 if bd == 8 else np.uint16
    recon = dict(y=ry[:h, :w].astype(dt), u=ru[:h // 2, :w // 2].astype(dt),
                 v=rv[:h // 2, :w // 2].astype(dt))
    return decisions, recon


def _pad_to(x: np.ndarray, h: int, w: int) -> np.ndarray:
    if x.shape == (h, w):
        return x
    return np.pad(x, ((0, h - x.shape[0]), (0, w - x.shape[1])),
                  mode="edge")


def v32_ok(by, bx, gh16, gw16) -> bool:
    return by * 2 + 2 <= gh16 and bx * 2 + 2 <= gw16
