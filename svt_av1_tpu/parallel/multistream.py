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
