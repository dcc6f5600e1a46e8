"""Device-mesh scale-out: batched multi-stream encoding.

The reference scales by running many pthread pipelines on one host
(enc_handle.c level_of_parallelism).  The TPU-native analog (BASELINE
config 5) shards *independent streams* across chips over ICI with
``jax.sharding`` — each device runs the same fixed-shape wave program on
its own streams, no cross-device traffic in steady state; collectives
only aggregate encoder stats.  A second mesh axis ("spatial") is reserved
for tile-sharded single-stream encodes of large frames.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.ops import intra, quant, transforms as tf
from svt_av1_tpu.pipeline import intra_encoder as ie


def make_mesh(n_devices: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()[:n_devices]
    return Mesh(np.array(devices), axis_names=("stream",))


def multi_stream_wave_step(recon, src, ys, xs, valid, have_above, have_left,
                           zbin, rnd, qv, qshift, deq, lam):
    """One MD+recon wave step over a leading stream axis.

    recon/src: (S, H, W); ys/xs/valid/have_*: (S, B).  All per-stream work
    is independent — vmap over streams, shard the stream axis."""
    fn = functools.partial(_single_stream_step,
                           zbin=zbin, rnd=rnd, qv=qv, qshift=qshift,
                           deq=deq, lam=lam)
    return jax.vmap(fn)(recon, src, ys, xs, valid, have_above, have_left)


def _single_stream_step(recon, src, ys, xs, valid, have_above, have_left,
                        *, zbin, rnd, qv, qshift, deq, lam):
    mode, q, recon = ie._rd_step(
        recon, src, ys, xs, valid, have_above, have_left,
        (zbin, rnd, qv, qshift, deq), lam, ie.BLK, cc.TX_16X16,
        ie.MODES, 0)
    return mode, q, recon


def sharded_step(mesh: Mesh):
    """jit the multi-stream step with stream-axis sharding over the mesh."""
    s = NamedSharding(mesh, P("stream"))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        multi_stream_wave_step,
        in_shardings=(s, s, s, s, s, s, s, rep, rep, rep, rep, rep, rep),
        out_shardings=(s, s, s))


def demo_multi_stream(n_devices: int, height: int = 64, width: int = 64,
                      qindex: int = 140) -> Tuple:
    """Build tiny per-stream inputs, run ONE sharded wave step end-to-end.

    Used by __graft_entry__.dryrun_multichip to validate the multi-chip
    path compiles and executes."""
    mesh = make_mesh(n_devices)
    S = n_devices
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (S, height, width)).astype(np.int32)
    recon = np.zeros_like(src)
    maxb = min(height, width) // ie.BLK
    ys = np.zeros((S, maxb), np.int32)
    xs = np.tile(np.arange(maxb, dtype=np.int32) * ie.BLK, (S, 1))
    valid = np.ones((S, maxb), bool)
    have_above = np.zeros((S, maxb), bool)
    have_left = np.tile(np.arange(maxb) > 0, (S, 1))
    qp = quant.make_quant_params(qindex)
    lam = np.float32(100.0)
    step = sharded_step(mesh)
    with mesh:
        mode, q, recon2 = step(recon, src, ys, xs, valid, have_above,
                               have_left, *(np.asarray(a) for a in qp), lam)
        jax.block_until_ready((mode, q, recon2))
    return mode, q, recon2
