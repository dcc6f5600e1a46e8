"""Motion-compensated temporal filtering (MCTF) stage.

Encoder-side denoiser applied to key-frame sources before encoding
(reference: temporal_filtering.c via the picture-decision process,
Docs/Appendix-Alt-Refs.md).  TPU design: per neighbor frame, one HME
call gives per-16x16 MVs + errors; one batched MC gathers predictions;
the NLM weighting (ops/tf.py) then filters every 32x32 block of the
frame in a single device batch.  Luma only in round 1 (chroma passes
through) — the filter is non-normative."""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from svt_av1_tpu.ops import mc, tf as tf_ops
from svt_av1_tpu.pipeline import me as me_pipe

BLK32 = 32


def mctf_filter_frame(center: Tuple[np.ndarray, np.ndarray, np.ndarray],
                      neighbors: List[Tuple[np.ndarray, ...]],
                      decay: float = 80.0) -> Tuple[np.ndarray, ...]:
    """Filter the luma of ``center`` against motion-compensated
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
    cyp = np.pad(cy, pad, mode="edge").astype(np.int32)
    g16h, g16w = h32 // 16, w32 // 16
    nb16 = g16h * g16w
    ys16 = (np.arange(nb16) // g16w * 16).astype(np.int32)
    xs16 = (np.arange(nb16) % g16w * 16).astype(np.int32)

    ch, cw = cu.shape
    cpadc = ((0, h32 // 2 - ch), (0, w32 // 2 - cw))
    cup = np.pad(cu, cpadc, mode="edge").astype(np.int32)
    cvp = np.pad(cv, cpadc, mode="edge").astype(np.int32)
    preds16 = []
    errs16 = []
    mvs16 = []
    cpreds16 = {"u": [], "v": []}
    for (ny, nu, nv) in neighbors:
        nyp = np.pad(ny, pad, mode="edge").astype(np.int32)
        mv_y, mv_x, ssd = me_pipe.hierarchical_me(cyp, nyp)
        mvs = np.stack([mv_y.reshape(-1) * 8, mv_x.reshape(-1) * 8],
                       axis=-1).astype(np.int32)
        mvs = mc.clamp_mvs_for_pad(mvs, ys16, xs16, 16, h32, w32)
        refp = np.asarray(mc.pad_plane(nyp, mc.PAD))
        p = np.asarray(mc.mc_blocks(refp, ys16, xs16, mvs, 16, mc.PAD))
        preds16.append(p)
        errs16.append(ssd.reshape(-1))
        mvs16.append(mvs)
        for plane, nc in (("u", nu), ("v", nv)):
            ncp = np.pad(nc, cpadc, mode="edge").astype(np.int32)
            refc = np.asarray(mc.pad_plane(ncp, mc.PAD // 2))
            pc = np.asarray(mc.mc_blocks(refc, ys16 // 2, xs16 // 2,
                                         mvs, 8, mc.PAD, 1))
            cpreds16[plane].append(pc)

    # assemble 16x16 tiles into (nb32, F, 32, 32) + per-quadrant stats
    g32h, g32w = h32 // 32, w32 // 32
    nb32 = g32h * g32w
    F = len(neighbors)
    preds = np.zeros((nb32, F, 32, 32), np.int32)
    berr = np.zeros((nb32, F, 4), np.float32)
    bmvs = np.zeros((nb32, F, 4, 2), np.float32)
    centers = np.zeros((nb32, 32, 32), np.int32)
    for b32 in range(nb32):
        r32, c32 = b32 // g32w, b32 % g32w
        centers[b32] = cyp[r32 * 32:r32 * 32 + 32, c32 * 32:c32 * 32 + 32]
        for q, (dr, dc) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            b16 = (r32 * 2 + dr) * g16w + (c32 * 2 + dc)
            for f in range(F):
                preds[b32, f, dr * 16:dr * 16 + 16,
                      dc * 16:dc * 16 + 16] = preds16[f][b16]
                berr[b32, f, q] = errs16[f][b16] / 256.0
                bmvs[b32, f, q] = mvs16[f][b16] / 8.0
    import jax.numpy as jnp
    wsub = np.asarray(tf_ops.subblock_weights(
        jnp.asarray(centers), jnp.asarray(preds), jnp.asarray(berr),
        jnp.asarray(bmvs), decay, 16.0))             # (nb32, F, 4)
    out = np.asarray(tf_ops.temporal_filter(
        centers, preds, berr, bmvs, decay_factor=decay))
    fy = np.zeros((h32, w32), np.int32)
    for b32 in range(nb32):
        r32, c32 = b32 // g32w, b32 % g32w
        fy[r32 * 32:r32 * 32 + 32, c32 * 32:c32 * 32 + 32] = out[b32]

    # chroma: luma MVs (halved by MC subsampling) + luma NLM weights
    couts = {}
    for plane, cp in (("u", cup), ("v", cvp)):
        cpreds = np.zeros((nb32, F, 16, 16), np.float32)
        cc_ = np.zeros((nb32, 16, 16), np.float32)
        for b32 in range(nb32):
            r32, c32 = b32 // g32w, b32 % g32w
            cc_[b32] = cp[r32 * 16:r32 * 16 + 16,
                          c32 * 16:c32 * 16 + 16]
            for q, (dr, dc) in enumerate(((0, 0), (0, 1), (1, 0),
                                          (1, 1))):
                b16 = (r32 * 2 + dr) * g16w + (c32 * 2 + dc)
                for f in range(F):
                    cpreds[b32, f, dr * 8:dr * 8 + 8,
                           dc * 8:dc * 8 + 8] = \
                        cpreds16[plane][f][b16]
        wq = wsub.reshape(nb32, F, 2, 2)
        wpix = np.repeat(np.repeat(wq, 8, axis=2), 8, axis=3)
        accum = (cc_ * tf_ops.TF_WEIGHT_SCALE
                 + (cpreds * wpix).sum(axis=1))
        count = tf_ops.TF_WEIGHT_SCALE + wpix.sum(axis=1)
        fc32 = np.clip(np.round(accum / count), 0, 255)
        fc = np.zeros((h32 // 2, w32 // 2), np.float64)
        for b32 in range(nb32):
            r32, c32 = b32 // g32w, b32 % g32w
            fc[r32 * 16:r32 * 16 + 16, c32 * 16:c32 * 16 + 16] = \
                fc32[b32]
        couts[plane] = fc[:ch, :cw].astype(cu.dtype)
    return fy[:h, :w].astype(cy.dtype), couts["u"], couts["v"]
