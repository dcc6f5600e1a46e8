"""TPL — temporal dependency model.

Re-expression of the reference's TPL machine (src_ops_process.c:1347
dispenser / :1571 synthesizer / :1585 svt_aom_generate_r0beta;
Docs/Appendix-TPL.md): estimate how much each frame's content is
referenced by the future, then spend bits where they propagate.

TPU-first split:
  * dispenser — ONE batched device program per lookahead frame: every
    16x16 block computes an open-loop DC-intra SATD cost and an inter
    SATD cost at its HME motion vector (reference runs a mini encode
    per 16x16 across 6-12 dispenser threads; here it is a single MXU
    batch over all blocks).
  * synthesizer — vectorized numpy backprop over the mini-GoP
    dependency graph in reverse decode order: each block pushes its
    propagated distortion onto the (up to 4) reference blocks its
    motion-compensated region overlaps, weighted by overlap area.

Outputs per frame: r0 = intra / (intra + propagated) — small r0 means
the frame seeds much of the future and deserves a lower qindex
(rc_process.c:781 crf_qindex_calc role) — and a per-64x64 beta map for
per-SB delta-q on key frames.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.ops import mc, satd
from svt_av1_tpu.pipeline import me as me_pipe

BLK = 16


def _satd16(diff: jnp.ndarray) -> jnp.ndarray:
    """(B, 16, 16) residuals -> (B,) SATD via four 8x8 Hadamards (the
    reference's tpl satd path tiles 8x8 the same way)."""
    b = diff.shape[0]
    tiles = diff.reshape(b, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4)
    tiles = tiles.reshape(b * 4, 8, 8)
    return satd.satd(tiles).reshape(b, 4).sum(axis=1)


def tpl_costs_core(h: int, w: int):
    """Traceable dispenser cost step (composable into the batched
    mini-GoP TPL program, pipeline/gop_fast.py)."""
    gh, gw = h // BLK, w // BLK
    nb = gh * gw
    ys = (np.arange(nb) // gw * BLK).astype(np.int32)
    xs = (np.arange(nb) % gw * BLK).astype(np.int32)

    def run(src, refp, mvs):
        """(intra_cost, inter_cost): (nb,) SATD costs."""
        blocks = src.reshape(gh, BLK, gw, BLK).transpose(0, 2, 1, 3)
        blocks = blocks.reshape(nb, BLK, BLK).astype(jnp.int32)
        # open-loop DC prediction from source neighbors (row above /
        # column left of each block; frame edge falls back to the other
        # side or mid-grey)
        above = jnp.pad(src, ((1, 0), (0, 0)), mode="edge")[
            :-1].reshape(gh, BLK, gw, BLK).transpose(0, 2, 1, 3)
        above_row = above.reshape(nb, BLK, BLK)[:, 0, :].astype(jnp.int32)
        left = jnp.pad(src, ((0, 0), (1, 0)), mode="edge")[
            :, :-1].reshape(gh, BLK, gw, BLK).transpose(0, 2, 1, 3)
        left_col = left.reshape(nb, BLK, BLK)[:, :, 0].astype(jnp.int32)
        dc = ((above_row.sum(1) + left_col.sum(1) + BLK)
              // (2 * BLK))[:, None, None]
        intra_cost = _satd16(blocks - dc)
        pred = mc.mc_blocks(refp, jnp.asarray(ys), jnp.asarray(xs), mvs,
                            BLK, mc.PAD, 0, 8)
        inter_cost = _satd16(blocks - pred)
        return intra_cost, inter_cost

    return run, ys, xs


@functools.lru_cache(maxsize=None)
def _jit_tpl_costs(h: int, w: int):
    run, ys, xs = tpl_costs_core(h, w)
    return jax.jit(run), ys, xs


def tpl_frame_stats(src_y: np.ndarray, refs: Optional[List[np.ndarray]]
                    ) -> Dict[str, np.ndarray]:
    """Dispenser step for one frame.

    refs: list of candidate (source) reference planes — per block the
    cheapest reference wins (the reference TPL's multi-ref ME).  None or
    empty = intra-only anchor."""
    if refs is not None and not isinstance(refs, (list, tuple)):
        refs = [refs]
    h, w = src_y.shape
    gh, gw = h // BLK, w // BLK
    nb = gh * gw
    run, ys, xs = _jit_tpl_costs(h, w)
    src_j = jnp.asarray(src_y.astype(np.int32))
    if not refs:
        z = np.zeros((nb, 2), np.int32)
        refp = mc.pad_plane(src_y.astype(np.int32), mc.PAD)
        intra, _ = run(src_j, jnp.asarray(refp), jnp.asarray(z))
        intra = np.asarray(intra).astype(np.float64)
        return dict(intra=intra, inter=np.full(nb, np.inf), mv=z,
                    ref_sel=np.zeros(nb, np.int32), gh=gh, gw=gw)
    intra = None
    best_inter = None
    best_mv = None
    ref_sel = None
    for ri, ref_y in enumerate(refs):
        mv_y, mv_x, _ = me_pipe.hierarchical_me(src_y, ref_y,
                                                rad2=8, rad0=4)
        mvs = np.stack([mv_y.reshape(nb) * 8, mv_x.reshape(nb) * 8],
                       axis=-1).astype(np.int32)
        mvs = mc.clamp_mvs_for_pad(mvs[:, None], ys[:, None],
                                   xs[:, None], BLK, h, w)[:, 0]
        refp = mc.pad_plane(ref_y.astype(np.int32), mc.PAD)
        ic, ec = run(src_j, jnp.asarray(refp), jnp.asarray(mvs))
        ec = np.asarray(ec).astype(np.float64)
        if best_inter is None:
            intra = np.asarray(ic).astype(np.float64)
            best_inter, best_mv = ec, mvs
            ref_sel = np.zeros(nb, np.int32)
        else:
            take = ec < best_inter
            best_inter = np.where(take, ec, best_inter)
            best_mv = np.where(take[:, None], mvs, best_mv)
            ref_sel = np.where(take, ri, ref_sel)
    return dict(intra=intra, inter=best_inter, mv=best_mv,
                ref_sel=ref_sel, gh=gh, gw=gw)


def synthesize(stats: List[Dict], deps: List) -> List[np.ndarray]:
    """Backprop propagated distortion (synthesizer analog).

    stats[i]: dispenser output for lookahead frame i; deps[i]: list of
    the reference indices within ``stats`` matching the refs passed to
    tpl_frame_stats (None/[] for anchors).  Frames are processed in
    reverse list order — callers order the list so every frame precedes
    the frames that reference it.  Returns mc_dep[i]: (nb,) propagated
    distortion arriving at each block."""
    gh, gw = stats[0]["gh"], stats[0]["gw"]
    nb = gh * gw
    mc_dep = [np.zeros(nb) for _ in stats]
    bys = np.arange(nb) // gw * BLK
    bxs = np.arange(nb) % gw * BLK
    for i in range(len(stats) - 1, -1, -1):
        dep_i = deps[i]
        if dep_i is None:
            continue
        if not isinstance(dep_i, (list, tuple)):
            dep_i = [dep_i]
        if not dep_i:
            continue
        st = stats[i]
        intra = st["intra"]
        inter = np.minimum(st["inter"], intra)
        saved = intra - inter                      # distortion avoided
        ratio = np.where(intra > 0, saved / np.maximum(intra, 1e-9), 0.0)
        flow = saved + mc_dep[i] * ratio           # total value of ref
        # scatter onto the <=4 overlapped ref blocks (bilinear by area),
        # into the per-block winning reference frame
        ry = np.clip(bys + st["mv"][:, 0] // 8, 0, gh * BLK - BLK)
        rx = np.clip(bxs + st["mv"][:, 1] // 8, 0, gw * BLK - BLK)
        b0y, b0x = ry // BLK, rx // BLK
        fy, fx = ry - b0y * BLK, rx - b0x * BLK
        for ri, r in enumerate(dep_i):
            sel = st["ref_sel"] == ri
            acc = mc_dep[r]
            for dy, wy in ((0, BLK - fy), (1, fy)):
                for dx, wx in ((0, BLK - fx), (1, fx)):
                    w = (wy * wx) / (BLK * BLK) * sel
                    by = np.minimum(b0y + dy, gh - 1)
                    bx = np.minimum(b0x + dx, gw - 1)
                    np.add.at(acc, by * gw + bx, flow * w)
    return mc_dep


def r0_of(stats: Dict, mc_dep: np.ndarray) -> float:
    """Frame-level r0 (generate_r0beta): intra energy over intra +
    propagated — in (0, 1]; small = heavily referenced."""
    intra = float(stats["intra"].sum())
    dep = float(mc_dep.sum())
    return intra / max(intra + dep, 1e-9)


def beta_qmap(stats: Dict, mc_dep: np.ndarray, base_q: int,
              bd: int = 8) -> np.ndarray:
    """Per-64x64 qindex map from per-SB beta (generate_r0beta per-SB
    path): SBs feeding the future more than average get a lower q.
    Deltas are multiples of 1 << delta_q_res (= 4), clamped to keep the
    decoder's CurrentQIndex congruence (see api.encoder._variance_qmap)."""
    gh, gw = stats["gh"], stats["gw"]
    intra = stats["intra"].reshape(gh, gw)
    dep = mc_dep.reshape(gh, gw)
    sh, sw = (gh + 3) // 4, (gw + 3) // 4
    ph, pw = sh * 4 - gh, sw * 4 - gw
    intra = np.pad(intra, ((0, ph), (0, pw)), mode="edge")
    dep = np.pad(dep, ((0, ph), (0, pw)), mode="edge")
    i_sb = intra.reshape(sh, 4, sw, 4).sum(axis=(1, 3))
    d_sb = dep.reshape(sh, 4, sw, 4).sum(axis=(1, 3))
    r_sb = i_sb / np.maximum(i_sb + d_sb, 1e-9)
    r_fr = intra.sum() / max(intra.sum() + dep.sum(), 1e-9)
    beta = r_fr / np.maximum(r_sb, 1e-9)   # >1: SB more load-bearing
    delta = np.clip(np.round(-2.0 * np.log2(beta)), -3, 3) * 4
    res_mask = (1 << 2) - 1
    delta_hi = (255 - base_q) & ~res_mask
    delta = np.clip(delta.astype(np.int32), None, delta_hi)
    return np.clip(base_q + delta, 1, 255)


def tpl_adjust_qindex(base_q: int, r0: float, layer: int) -> int:
    """CRF qindex from r0 (crf_qindex_calc analog): boost-only — scale
    the quantizer step DOWN by a power of r0 (r0=1, nothing references
    this frame -> unchanged; small r0 -> heavily referenced -> lower q),
    strongest for base-layer/key frames.  Applied on top of the layered
    q so leaves keep their offsets."""
    strength = 0.5 if layer == 0 else 0.25
    factor = float(np.clip(r0 ** strength, 0.3, 1.0))
    from svt_av1_tpu.ops import quant
    target = quant.dc_q(base_q) * factor
    # invert the dc_q table
    lo, hi = 1, 255
    while lo < hi:
        mid = (lo + hi) // 2
        if quant.dc_q(mid) < target:
            lo = mid + 1
        else:
            hi = mid
    return int(np.clip(lo, 1, 255))
