"""Device-mesh scale-out: batched multi-stream encoding.

The reference scales by running many pthread pipelines on one host
(enc_handle.c level_of_parallelism).  The TPU-native analog (BASELINE
config 5) shards *independent streams/frames* across chips over ICI with
``jax.sharding``: every device runs the same fixed-shape whole-frame
program on its shard of the stream batch — no cross-device traffic in
steady state.  A second mesh axis ("spatial") is reserved for
tile-sharded single-stream encodes of large frames.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from svt_av1_tpu.ops import quant
from svt_av1_tpu.pipeline import intra_encoder as ie


def make_mesh(n_devices: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()[:n_devices]
    return Mesh(np.array(devices), axis_names=("stream",))


@functools.lru_cache(maxsize=None)
def _sharded_frame_program(mesh: Mesh, gh: int, gw: int, modes):
    """The full per-frame MD+recon program, vmapped over frames and
    sharded over the mesh's stream axis."""
    single = ie._frame_program_fn(gh, gw, modes)

    def batched(sy, su, sv, zbin, rnd, qv, qshift, deq, lam,
                cy_t, cuv_t, txbb, modeb, uvb, eoby, eobuv, rqly,
                rqluv):
        return jax.vmap(
            lambda a, b, c: single(a, b, c, zbin, rnd, qv, qshift, deq,
                                   lam, cy_t, cuv_t, txbb, modeb, uvb,
                                   eoby, eobuv, rqly, rqluv)
        )(sy, su, sv)

    s = NamedSharding(mesh, P("stream"))
    rep = NamedSharding(mesh, P())
    return jax.jit(batched,
                   in_shardings=(s,) * 3 + (rep,) * 15,
                   out_shardings=(s,) * 10)


def encode_intra_frames_sharded(frames: List[Tuple], qindex: int,
                                mesh: Mesh, modes=ie.MODES):
    """Multi-stream all-intra encode: len(frames) must be a multiple of
    the mesh size.  Same results as pipeline.encode_intra_frames, with
    the frame batch sharded across devices."""
    h, w = frames[0][0].shape
    gh, gw = h // ie.BLK, w // ie.BLK
    qp_y = quant.make_quant_params(qindex)
    qstep = quant.dc_q(qindex) / 8.0
    lam = np.float32(0.7 * qstep * qstep)
    prog = _sharded_frame_program(mesh, gh, gw, tuple(modes))
    sy = np.stack([f[0] for f in frames]).astype(np.uint8)
    su = np.stack([f[1] for f in frames]).astype(np.uint8)
    sv = np.stack([f[2] for f in frames]).astype(np.uint8)
    from svt_av1_tpu.codec.rate_est import md_rate_args
    rt = md_rate_args(qindex, tuple(modes), ie.UV_MODES)
    with mesh:
        out = prog(sy, su, sv, *(np.asarray(a) for a in qp_y), lam, *rt)
    (ry, ru, rv, ym_a, um_a, qy_a, qu_a, qv_a, _au, _av) = \
        [np.asarray(o) for o in out]
    results = []
    for fi in range(len(frames)):
        decisions = ie._collect_decisions_dense(
            gh, gw, ym_a[fi], um_a[fi], qy_a[fi], qu_a[fi], qv_a[fi])
        recon = dict(y=ry[fi], u=ru[fi], v=rv[fi])
        results.append((decisions, recon))
    return results


def demo_multi_stream(n_devices: int, height: int = 64, width: int = 64,
                      qindex: int = 140, devices=None):
    """One sharded multi-stream encode step end-to-end (used by
    __graft_entry__.dryrun_multichip)."""
    mesh = make_mesh(n_devices, devices=devices)
    rng = np.random.default_rng(0)
    frames = []
    for _ in range(n_devices):
        y = rng.integers(0, 256, (height, width)).astype(np.uint8)
        u = rng.integers(0, 256, (height // 2, width // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (height // 2, width // 2)).astype(np.uint8)
        frames.append((y, u, v))
    return encode_intra_frames_sharded(frames, qindex, mesh)


# --------------------------------------------------------------------------
# multi-stream GOP (inter) path: the real pipeline, sharded
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _sharded_inter_step(mesh: Mesh, h: int, w: int, R: int, modes,
                        bd: int, ring: bool, rad2: int, rad0: int,
                        ncand: int, dlf_on: bool, cdef_on: bool,
                        hp: bool = False, obmc: bool = False,
                        interintra: bool = False,
                        skip_mode: bool = False,
                        tx_search: bool = False,
                        split8: bool = False):
    """P1 (MD) + P2 (DLF/CDEF) fused per frame, vmapped over a stream
    batch and sharded over the mesh's stream axis.  Bodies are the
    SAME traced functions the single-chip fast-GOP path jits
    (gop_fast._build_p1/_build_p2) with the SAME feature flags, so
    per-stream results are bit-identical to the single-stream encoder.

    The step returns the nested pytree ``(p1_outs, p2_outs)`` (not a
    flat tuple): out_shardings is a single stream-sharding broadcast
    over the whole tree, so the output arity of the underlying
    programs can evolve without touching this path."""
    from svt_av1_tpu.pipeline import gop_fast as gf
    p1 = gf._build_p1(h, w, R, modes, bd, ring, R == 2, rad2, rad0,
                      hp, obmc, interintra, skip_mode and R == 2,
                      tx_search, split8)
    p2 = gf._build_p2(h, w, bd, ncand, dlf_on, cdef_on, True, True,
                      split8)
    gh, gw = h // ie.BLK, w // ie.BLK

    def step(src_pack, refs_y, refs_u, refs_v, zbin, rnd, qv, qshift,
             deq, lam, cy_t, cuv_t, txbb, modeb, uvb, eoby, eobuv,
             dlf_y, dlf_uv, cands, damping):
        outs = p1(src_pack, refs_y, refs_u, refs_v, zbin, rnd, qv,
                  qshift, deq, lam, cy_t, cuv_t, txbb, modeb, uvb,
                  eoby, eobuv)
        qy_f, qu_f, qv_f = outs[15], outs[16], outs[17]
        skip16 = ((jnp.abs(qy_f).max(axis=1) == 0)
                  & (jnp.abs(qu_f).max(axis=1) == 0)
                  & (jnp.abs(qv_f).max(axis=1) == 0)).reshape(gh, gw)
        inter16 = outs[5].reshape(gh, gw)
        extra = ()
        if split8:
            split16 = outs[25].reshape(gh, gw)
            skip8 = gf._derive_skip8(qy_f, qu_f, qv_f, skip16,
                                     split16, gh, gw)
            extra = (split16, skip8)
        p2_outs = p2(src_pack, outs[0], outs[1], outs[2], skip16,
                     dlf_y, dlf_uv, cands, damping, outs[22], inter16,
                     outs[23], *extra, mergeh=outs[28],
                     mergev=outs[29])
        return tuple(outs), tuple(p2_outs)

    batched = jax.vmap(step, in_axes=(0,) * 19 + (None, 0))
    s = NamedSharding(mesh, P("stream"))
    rep = NamedSharding(mesh, P())
    return jax.jit(batched,
                   in_shardings=(s,) * 19 + (rep, s),
                   out_shardings=s)


def run_inter_frames_sharded(src_packs, refs_per_stream, qindices,
                             mesh: Mesh, modes, bd: int = 8,
                             ring: bool = True, rad2: int = 8,
                             rad0: int = 7, cdef_cands=None,
                             dlf_on: bool = True, cdef_on: bool = True,
                             exact_rates: bool = False,
                             hp: bool = False, obmc: bool = False,
                             interintra: bool = False,
                             skip_mode: bool = False,
                             tx_search: bool = False,
                             split8: bool = False):
    """One inter frame for EACH of N independent GOP streams, sharded
    over the mesh.  All streams must share frame geometry and the same
    reference-enum layout (same GOP schedule position); qindex may
    differ per stream.  Returns a list of gop_fast.PendingInterFrame —
    finish each with gop_fast.collect_inter_frame (host EC per stream,
    embarrassingly parallel across streams).

    This is the scale-out analog of the reference's multi-instance
    thread provisioning (enc_handle.c level_of_parallelism): every
    device advances one stream through the SAME fixed-shape program;
    steady-state traffic is stream-local so sharding rides ICI with no
    cross-device collectives."""
    from svt_av1_tpu.codec.rate_est import md_rate_args
    from svt_av1_tpu.pipeline import gop_fast as gf
    from svt_av1_tpu.pipeline.cdef_stage import SEARCH_SET, cdef_damping
    N = len(src_packs)
    h = src_packs[0].shape[0] * 2 // 3
    w = src_packs[0].shape[1]
    ref_enums = sorted(refs_per_stream[0])
    R = len(ref_enums)
    assert all(sorted(r) == ref_enums for r in refs_per_stream)
    cands = np.asarray(cdef_cands if cdef_cands is not None
                       else SEARCH_SET, np.int32)
    step = _sharded_inter_step(mesh, h, w, R, tuple(modes), bd, ring,
                               rad2, rad0, len(cands), dlf_on, cdef_on,
                               hp, obmc, interintra, skip_mode,
                               tx_search, split8)
    sp = np.stack([np.asarray(s, np.uint8) for s in src_packs])
    ry = jnp.stack([jnp.stack([jnp.asarray(r[e]["y"]).astype(jnp.int32)
                               for e in ref_enums])
                    for r in refs_per_stream])
    ru = jnp.stack([jnp.stack([jnp.asarray(r[e]["u"]).astype(jnp.int32)
                               for e in ref_enums])
                    for r in refs_per_stream])
    rv = jnp.stack([jnp.stack([jnp.asarray(r[e]["v"]).astype(jnp.int32)
                               for e in ref_enums])
                    for r in refs_per_stream])
    qps, lams, rts = [], [], []
    for q in qindices:
        qps.append([np.asarray(a) for a in quant.make_quant_params(
            q, bd=bd)])
        qstep = quant.dc_q(q, bd=bd) / 8.0
        lams.append(np.float32(0.7 * qstep * qstep))
        rts.append(md_rate_args(q, tuple(modes), ie.UV_MODES,
                                inter_frame=True, exact=exact_rates))
    qp_b = [np.stack([qp[i] for qp in qps]) for i in range(5)]
    # per-stream rate args stacked leaf-wise (slots may hold CoefTables
    # pytrees when exact_rates is on)
    rt_b = [jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *(rt[i] for rt in rts))
            for i in range(7)]
    dlf_y = np.stack([gf.dlf_ladder_params(q, False) for q in qindices])
    dlf_uv = np.stack([gf.dlf_ladder_params(q, True) for q in qindices])
    damp = np.asarray([cdef_damping(q) for q in qindices], np.int32)
    with mesh:
        out_p1, out_p2 = step(sp, ry, ru, rv, *qp_b, np.asarray(lams),
                              *rt_b, dlf_y, dlf_uv, cands, damp)
    pends = []
    for i in range(N):
        outs = [o[i] for o in out_p1]
        p2_outs = [o[i] for o in out_p2]
        pend = gf.PendingInterFrame(outs, p2_outs, ref_enums, h, w,
                                    qindices[i])
        pend.cdef_cands = cands
        pend.cdef_on = cdef_on
        pend.dlf_on = dlf_on
        pends.append(pend)
    return pends


def demo_gop_streams(n_devices: int, height: int = 64, width: int = 64,
                     qindex: int = 120, devices=None, n_inter: int = 2):
    """N independent hierarchical GOP streams on an n-device mesh:
    sharded intra keys, then n_inter sharded inter steps (single-ref P
    then compound B) with DLF+CDEF on, recon chained ON DEVICE between
    steps.  Returns per-stream lists of (decisions, recon) —
    exercises HME, GM fit, pass A/B, skip-merge, masked DLF and CDEF
    through the real fast-GOP programs."""
    from svt_av1_tpu.codec import mv_pred
    from svt_av1_tpu.pipeline import gop_fast as gf
    mesh = make_mesh(n_devices, devices=devices)
    rng = np.random.default_rng(7)
    base = rng.integers(20, 235, (height, width + 8 * n_devices)
                        ).astype(np.uint8)
    k = np.ones((3, 3)) / 9.0
    from numpy.lib.stride_tricks import sliding_window_view
    sm = sliding_window_view(base.astype(np.float32), (3, 3))
    base = sm.reshape(*sm.shape[:2], 9).dot(k.reshape(9)).astype(np.uint8)
    streams = []
    for s in range(n_devices):
        frames = []
        for t in range(1 + n_inter):
            y = base[:height - 2, s * 4 + t:s * 4 + t + width].copy()
            y = np.pad(y, ((0, 2), (0, 0)), mode="edge")
            u = (y[::2, ::2] // 2 + 60).astype(np.uint8)
            v = np.full((height // 2, width // 2), 128, np.uint8)
            frames.append((y, u, v))
        streams.append(frames)
    keys = encode_intra_frames_sharded([st[0] for st in streams],
                                       qindex, mesh)
    results = [[kr] for kr in keys]
    dpb = [{mv_pred.LAST_FRAME:
            {k2: np.asarray(v2) for k2, v2 in kr[1].items()}}
           for kr in keys]
    from svt_av1_tpu.pipeline.cdef_stage import SEARCH_SET
    for t in range(1, 1 + n_inter):
        src_packs = []
        for st in streams:
            y, u, v = st[t]
            src_packs.append(np.concatenate(
                [y, np.concatenate([u, v], axis=1)], axis=0))
        qs = [qindex + 8 * ((s + t) % 3) for s in range(n_devices)]
        # reduced search effort (speed-preset shape): the dryrun
        # compiles the whole vmapped program on a CPU mesh, where
        # unrolled candidate loops dominate compile time
        pends = run_inter_frames_sharded(
            src_packs, dpb, qs, mesh, modes=ie.MODES[:2],
            ring=False, rad2=4, rad0=2, cdef_cands=SEARCH_SET[:2])
        for s, pend in enumerate(pends):
            decisions, recon, hdr = gf.collect_inter_frame(pend)
            results[s].append((decisions, recon))
            planes = {k2: np.asarray(v2) for k2, v2 in recon.items()
                      if k2 in ("y", "u", "v")}
            if t == 1 and n_inter > 1:
                dpb[s] = {mv_pred.LAST_FRAME: dpb[s][mv_pred.LAST_FRAME],
                          mv_pred.ALTREF_FRAME: planes}
            else:
                dpb[s] = {mv_pred.LAST_FRAME: planes}
    return results
