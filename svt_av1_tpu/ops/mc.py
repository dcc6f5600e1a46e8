"""Motion compensation: batched block prediction from a padded reference.

Built on the bit-exact subpel convolve (ops/convolve.py, behavioral
reference: inter_prediction.c svt_av1_convolve_2d_sr).  Reference planes
are edge-replicated by ``pad`` pixels, which is equivalent to the spec's
per-sample coordinate clamping (spec 7.11.3.4) as long as every MV keeps
the filter window inside the padded plane — `clamp_mv_for_pad` enforces
that bound and matches what the encoder signals.

MVs are (row, col) in 1/8 luma pel throughout.  Luma phase = (mv & 7)*2,
chroma (4:2:0) phase = mv & 15 at half-resolution coordinates (the
clamp_mv_to_umv_border_sb q4 scaling).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.ops.convolve import (convolve_2d_compound_avg,
                                      convolve_2d_sr)

PAD = 80  # default reference padding in luma pixels


def pad_plane(plane: np.ndarray, pad: int) -> np.ndarray:
    """Edge-replicated padding (== spec sample-coordinate clamping)."""
    return np.pad(np.asarray(plane), pad, mode="edge")


def clamp_mv_for_pad(mv, y: int, x: int, blk: int, h: int, w: int,
                     pad: int = PAD):
    """Clamp an MV so the 8-tap window of a block at (y, x) stays inside
    a pad-extended plane.  Bounds in 1/8 pel, preserving parity."""
    lo_r = (-(y + pad - 4)) * 8
    hi_r = (h + pad - 4 - (y + blk)) * 8
    lo_c = (-(x + pad - 4)) * 8
    hi_c = (w + pad - 4 - (x + blk)) * 8
    r = max(lo_r, min(hi_r, int(mv[0])))
    c = max(lo_c, min(hi_c, int(mv[1])))
    return (r & ~1, c & ~1)  # keep 1/4-pel precision


def clamp_mvs_for_pad(mvs: np.ndarray, ys: np.ndarray, xs: np.ndarray,
                      blk: int, h: int, w: int,
                      pad: int = PAD) -> np.ndarray:
    """Vectorized clamp_mv_for_pad: mvs (..., 2) against ys/xs blocks.

    Margin 8 (not 4): at the bound, the chroma half-resolution gather
    window (full-pel offset mv>>4 plus the 8-tap reach of -3..+4)
    lands exactly one row past a pad of pad/2 with a 4-px margin —
    hit by far HME seeds at frame edges."""
    mvs = np.asarray(mvs, np.int64)
    r = np.clip(mvs[..., 0], (-(ys + pad - 8)) * 8,
                (h + pad - 8 - (ys + blk)) * 8)
    c = np.clip(mvs[..., 1], (-(xs + pad - 8)) * 8,
                (w + pad - 8 - (xs + blk)) * 8)
    return np.stack([r & ~1, c & ~1], axis=-1).astype(np.int32)


def mc_blocks(ref_padded: jnp.ndarray, ys, xs, mvs, blk: int,
              pad: int, subsampling: int = 0, bd: int = 8,
              kind: int = 0) -> jnp.ndarray:
    """Batched MC: predict (B, blk, blk) blocks.

    ref_padded: (H/ss + 2*pad_p, W/ss + 2*pad_p) int32 plane where
                pad_p = pad >> subsampling.
    ys/xs: (B,) block top-left coords in *plane* pixels (already >> ss).
    mvs: (B, 2) int32 MVs in 1/8 **luma** pel.
    """
    ys = jnp.asarray(ys, jnp.int32)
    xs = jnp.asarray(xs, jnp.int32)
    mvs = jnp.asarray(mvs, jnp.int32)
    pad_p = pad >> subsampling
    # q4 (1/16-plane-pel) vector per clamp_mv_to_umv_border_sb
    mvq_r = mvs[:, 0] * (2 >> subsampling)
    mvq_c = mvs[:, 1] * (2 >> subsampling)
    full_r = (mvq_r >> 4)
    full_c = (mvq_c >> 4)
    phase_r = mvq_r & 15
    phase_c = mvq_c & 15
    start_r = ys + full_r - 3 + pad_p
    start_c = xs + full_c - 3 + pad_p
    win = blk + 7
    offs = jnp.arange(win)
    rows = start_r[:, None, None] + offs[None, :, None]
    cols = start_c[:, None, None] + offs[None, None, :]
    windows = ref_padded[rows, cols]
    return convolve_2d_sr(windows, phase_c, phase_r, blk, blk,
                          kind_x=kind, kind_y=kind, bd=bd)


def mc_block_np(ref_plane: np.ndarray, y: int, x: int, mv, blk: int,
                subsampling: int = 0, bd: int = 8,
                pad: int = PAD) -> np.ndarray:
    """Single-block host MC (decoder reconstruction path)."""
    pad_p = pad >> subsampling
    padded = pad_plane(ref_plane.astype(np.int32), pad_p)
    out = mc_blocks(jnp.asarray(padded), np.array([y]), np.array([x]),
                    np.array([mv], np.int32), blk, pad,
                    subsampling=subsampling, bd=bd)
    return np.asarray(out[0])


def mc_blocks_compound(refp0: jnp.ndarray, refp1: jnp.ndarray, ys, xs,
                       mvs0, mvs1, blk: int, pad: int,
                       subsampling: int = 0, bd: int = 8,
                       kind: int = 0, mask=None) -> jnp.ndarray:
    """Batched compound MC from two references: COMPOUND_AVERAGE, or
    masked (wedge) blending when ``mask`` ((B, blk, blk) 0..64 weights
    for ref0, already plane-subsampled) is given."""
    ys = jnp.asarray(ys, jnp.int32)
    xs = jnp.asarray(xs, jnp.int32)
    pad_p = pad >> subsampling
    win = blk + 7
    offs = jnp.arange(win)

    def gather(refp, mvs):
        mvs = jnp.asarray(mvs, jnp.int32)
        mvq_r = mvs[:, 0] * (2 >> subsampling)
        mvq_c = mvs[:, 1] * (2 >> subsampling)
        start_r = ys + (mvq_r >> 4) - 3 + pad_p
        start_c = xs + (mvq_c >> 4) - 3 + pad_p
        rows = start_r[:, None, None] + offs[None, :, None]
        cols = start_c[:, None, None] + offs[None, None, :]
        return refp[rows, cols], mvq_c & 15, mvq_r & 15

    w0, px0, py0 = gather(refp0, mvs0)
    w1, px1, py1 = gather(refp1, mvs1)
    if mask is not None:
        from svt_av1_tpu.ops.convolve import convolve_2d_compound_masked
        return convolve_2d_compound_masked(w0, w1, px0, py0, px1, py1,
                                           blk, blk, mask, kind=kind,
                                           bd=bd)
    return convolve_2d_compound_avg(w0, w1, px0, py0, px1, py1,
                                    blk, blk, kind=kind, bd=bd)


def mc_blocks_compound_diffwtd(refp0, refp1, ys, xs, mvs0, mvs1,
                               blk: int, pad: int, inverse, bd: int = 8,
                               kind: int = 0):
    """COMPOUND_DIFFWTD luma MC: returns (pred, mask); the mask is
    derived from the luma CONV_BUF difference (normative) and must be
    2x2-subsampled and passed as ``mask`` to mc_blocks_compound for the
    chroma planes."""
    from svt_av1_tpu.ops.convolve import convolve_2d_compound_diffwtd
    ys = jnp.asarray(ys, jnp.int32)
    xs = jnp.asarray(xs, jnp.int32)
    win = blk + 7
    offs = jnp.arange(win)

    def gather(refp, mvs):
        mvs = jnp.asarray(mvs, jnp.int32)
        mvq_r = mvs[:, 0] * 2
        mvq_c = mvs[:, 1] * 2
        start_r = ys + (mvq_r >> 4) - 3 + pad
        start_c = xs + (mvq_c >> 4) - 3 + pad
        rows = start_r[:, None, None] + offs[None, :, None]
        cols = start_c[:, None, None] + offs[None, None, :]
        return refp[rows, cols], mvq_c & 15, mvq_r & 15

    w0, px0, py0 = gather(refp0, mvs0)
    w1, px1, py1 = gather(refp1, mvs1)
    return convolve_2d_compound_diffwtd(w0, w1, px0, py0, px1, py1,
                                        blk, blk, inverse, kind=kind,
                                        bd=bd)
