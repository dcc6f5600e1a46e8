"""Motion-compensated temporal filtering (MCTF) stage.

Encoder-side denoiser applied to key-frame sources and mini-GoP bases
before encoding (reference: temporal_filtering.c via the
picture-decision process, Docs/Appendix-Alt-Refs.md).

TPU design (round-5 rewrite): the WHOLE filter — per-neighbor HME,
batched luma+chroma MC, the 32x32 tile assembly, NLM subblock
weighting and the weighted average for all three planes — is ONE
jitted device program with a single host pull of the three filtered
planes.  The previous host-orchestrated version issued ~10 separate
device round trips per call plus per-block Python assembly loops,
which cost 3.5-4.7 s per filtered frame on a tunneled TPU; the fused
program runs the same math in one dispatch."""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.ops import mc, tf as tf_ops
from svt_av1_tpu.pipeline import me as me_pipe

BLK32 = 32


def _tile16_to_32(a16, g32h, g32w):
    """(nb16, 16, 16) quadrant blocks -> (nb32, 32, 32) tiles."""
    g16h, g16w = g32h * 2, g32w * 2
    a = a16.reshape(g16h, g16w, 16, 16)
    a = a.reshape(g32h, 2, g32w, 2, 16, 16).transpose(0, 2, 1, 4, 3, 5)
    return a.reshape(g32h * g32w, 32, 32)


def _quad16(a16, g32h, g32w):
    """(nb16, ...) per-16-block values -> (nb32, 4, ...) quadrants in
    (0,0),(0,1),(1,0),(1,1) order."""
    g16h, g16w = g32h * 2, g32w * 2
    a = a16.reshape((g16h, g16w) + a16.shape[1:])
    a = a.reshape((g32h, 2, g32w, 2) + a16.shape[1:])
    a = jnp.moveaxis(a, 2, 1)                  # (g32h, g32w, 2, 2, ...)
    return a.reshape((g32h * g32w, 4) + a16.shape[1:])


def _clamp_mvs_traced(mvs, ys, xs, blk, h, w, pad=mc.PAD):
    r = jnp.clip(mvs[..., 0], (-(ys + pad - 8)) * 8,
                 (h + pad - 8 - (ys + blk)) * 8)
    c = jnp.clip(mvs[..., 1], (-(xs + pad - 8)) * 8,
                 (w + pad - 8 - (xs + blk)) * 8)
    return jnp.stack([r & ~1, c & ~1], axis=-1).astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _jit_tf(h32: int, w32: int, F: int, decay: float):
    """One fused program: (center y/u/v, neighbors y/u/v stacked) ->
    filtered (y, u, v)."""
    g16h, g16w = h32 // 16, w32 // 16
    nb16 = g16h * g16w
    g32h, g32w = h32 // 32, w32 // 32
    nb32 = g32h * g32w
    ys16 = jnp.asarray((np.arange(nb16) // g16w * 16), jnp.int32)
    xs16 = jnp.asarray((np.arange(nb16) % g16w * 16), jnp.int32)
    h64 = (h32 + 63) & ~63
    w64 = (w32 + 63) & ~63
    hme = me_pipe.hme_core(h64, w64, 8, 8, 7)
    pad64 = ((0, h64 - h32), (0, w64 - w32))

    def run(cy, cu, cv, ny, nu, nv):
        src64 = jnp.pad(cy, pad64, mode="edge")
        preds = []       # (F, nb16, 16, 16)
        errs = []        # (F, nb16)
        mvss = []        # (F, nb16, 2)
        cpreds = {"u": [], "v": []}
        for f in range(F):
            ref64 = jnp.pad(ny[f], pad64, mode="edge")
            mvy, mvx, ssd = hme(src64, ref64)
            mvy = mvy[:g16h, :g16w].reshape(nb16)
            mvx = mvx[:g16h, :g16w].reshape(nb16)
            ssd = ssd[:g16h, :g16w].reshape(nb16)
            mvs = jnp.stack([mvy * 8, mvx * 8], axis=-1)
            mvs = _clamp_mvs_traced(mvs, ys16, xs16, 16, h32, w32)
            refp = jnp.pad(ny[f], mc.PAD, mode="edge")
            preds.append(mc.mc_blocks(refp, ys16, xs16, mvs, 16,
                                      mc.PAD, 0))
            errs.append(ssd)
            mvss.append(mvs)
            for plane, nc in (("u", nu), ("v", nv)):
                refc = jnp.pad(nc[f], mc.PAD // 2, mode="edge")
                cpreds[plane].append(
                    mc.mc_blocks(refc, ys16 // 2, xs16 // 2, mvs, 8,
                                 mc.PAD, 1))

        centers = cy.reshape(g32h, 32, g32w, 32).transpose(0, 2, 1, 3)
        centers = centers.reshape(nb32, 32, 32)
        preds32 = jnp.stack([_tile16_to_32(p, g32h, g32w)
                             for p in preds], axis=1)  # (nb32, F, 32, 32)
        berr = jnp.stack([_quad16(e, g32h, g32w) for e in errs],
                         axis=1).astype(jnp.float32) / 256.0
        bmvs = jnp.stack([_quad16(m, g32h, g32w) for m in mvss],
                         axis=1).astype(jnp.float32) / 8.0
        wsub = tf_ops.subblock_weights(centers, preds32, berr, bmvs,
                                       decay, 16.0)       # (nb32, F, 4)
        out = tf_ops.temporal_filter(centers, preds32, berr, bmvs,
                                     decay_factor=decay)
        fy = out.reshape(g32h, g32w, 32, 32).transpose(0, 2, 1, 3)
        fy = fy.reshape(h32, w32)

        # chroma: luma MVs (halved by MC subsampling) + luma NLM weights
        wq = wsub.reshape(nb32, F, 2, 2)
        wpix = jnp.repeat(jnp.repeat(wq, 8, axis=2), 8, axis=3)
        couts = []
        for plane, cp in (("u", cu), ("v", cv)):
            cc_ = cp.reshape(g32h, 16, g32w, 16).transpose(0, 2, 1, 3)
            cc_ = cc_.reshape(nb32, 16, 16).astype(jnp.float32)
            cpred = jnp.stack([_tile16_to_16(p, g32h, g32w)
                               for p in cpreds[plane]], axis=1)
            accum = (cc_ * tf_ops.TF_WEIGHT_SCALE
                     + (cpred.astype(jnp.float32) * wpix).sum(axis=1))
            count = tf_ops.TF_WEIGHT_SCALE + wpix.sum(axis=1)
            fc32 = jnp.clip(jnp.round(accum / count), 0, 255)
            fc = fc32.reshape(g32h, g32w, 16, 16).transpose(0, 2, 1, 3)
            couts.append(fc.reshape(h32 // 2, w32 // 2))
        return fy, couts[0], couts[1]

    return jax.jit(run)


def _tile16_to_16(a8, g32h, g32w):
    """(nb16, 8, 8) chroma quadrant blocks -> (nb32, 16, 16) tiles."""
    g16h, g16w = g32h * 2, g32w * 2
    a = a8.reshape(g16h, g16w, 8, 8)
    a = a.reshape(g32h, 2, g32w, 2, 8, 8).transpose(0, 2, 1, 4, 3, 5)
    return a.reshape(g32h * g32w, 16, 16)


def mctf_filter_frame(center: Tuple[np.ndarray, np.ndarray, np.ndarray],
                      neighbors: List[Tuple[np.ndarray, ...]],
                      decay: float = 80.0) -> Tuple[np.ndarray, ...]:
    """Filter ``center`` (y, u, v) against motion-compensated
    ``neighbors`` (list of (y, u, v) source frames).

    decay ~ 2*(5.5 + noise_sigma)^2 in the reference's error domain
    (temporal_filtering.c tf_decay_factor); 80 suits moderate noise."""
    cy, cu, cv = center
    if not neighbors:
        return center
    h, w = cy.shape
    h32 = (h + 31) & ~31
    w32 = (w + 31) & ~31
    pad = ((0, h32 - h), (0, w32 - w))
    ch, cw = cu.shape
    cpadc = ((0, h32 // 2 - ch), (0, w32 // 2 - cw))
    F = len(neighbors)
    run = _jit_tf(h32, w32, F, float(decay))
    cyp = np.pad(cy, pad, mode="edge").astype(np.int32)
    cup = np.pad(cu, cpadc, mode="edge").astype(np.int32)
    cvp = np.pad(cv, cpadc, mode="edge").astype(np.int32)
    ny = np.stack([np.pad(n[0], pad, mode="edge") for n in neighbors]
                  ).astype(np.int32)
    nu = np.stack([np.pad(n[1], cpadc, mode="edge") for n in neighbors]
                  ).astype(np.int32)
    nv = np.stack([np.pad(n[2], cpadc, mode="edge") for n in neighbors]
                  ).astype(np.int32)
    fy, fu, fv = jax.device_get(run(cyp, cup, cvp, ny, nu, nv))
    return (fy[:h, :w].astype(cy.dtype),
            fu[:ch, :cw].astype(cu.dtype),
            fv[:ch, :cw].astype(cv.dtype))
