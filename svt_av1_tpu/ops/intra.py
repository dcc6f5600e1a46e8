"""AV1 intra predictors (JAX, batched).

Normative prediction (AV1 spec §7.11.2; behavioral reference:
intra_prediction.c svt_aom_*_predictor_*).  All predictors operate on
prepared neighbor arrays and are batched over blocks:

  above:      (B, W) int32 — reconstructed row above the block
  left:       (B, H) int32 — reconstructed column left of the block
  above_left: (B,)   int32 — corner sample
  returns     (B, H, W) int32 prediction

Neighbor preparation (availability substitution, edge extension) is in
``prepare_neighbors`` and must be applied first — predictors assume all
inputs are populated.

Smooth weights / directional derivatives are normative spec tables loaded
from codec/data/av1_intra_tables.npz.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from svt_av1_tpu.codec import constants as cc

_DATA = os.path.join(os.path.dirname(__file__), "..", "codec", "data",
                     "av1_intra_tables.npz")

SM_WEIGHT_LOG2 = 8


@functools.lru_cache(maxsize=1)
def _tables():
    return dict(np.load(_DATA))


@functools.lru_cache(maxsize=None)
def sm_weights(n: int) -> np.ndarray:
    """Smooth weights for block dimension n (spec Sm_Weights_Tx_*)."""
    arr = _tables()["sm_weight_arrays"]
    return arr[n:2 * n].astype(np.int32)


def dc_pred(above, left, bd: int = 8):
    b, w = above.shape
    h = left.shape[1]
    total = jnp.sum(above, axis=1) + jnp.sum(left, axis=1)
    avg = (total + ((w + h) >> 1)) // (w + h)
    return jnp.broadcast_to(avg[:, None, None], (b, h, w))


def dc_top_pred(above, h: int):
    b, w = above.shape
    avg = (jnp.sum(above, axis=1) + (w >> 1)) >> int(np.log2(w))
    return jnp.broadcast_to(avg[:, None, None], (b, h, w))


def dc_left_pred(left, w: int):
    b, h = left.shape
    avg = (jnp.sum(left, axis=1) + (h >> 1)) >> int(np.log2(h))
    return jnp.broadcast_to(avg[:, None, None], (b, h, w))


def dc_128_pred(b: int, h: int, w: int, bd: int = 8):
    return jnp.full((b, h, w), 1 << (bd - 1), dtype=jnp.int32)


def v_pred(above, h: int):
    b, w = above.shape
    return jnp.broadcast_to(above[:, None, :], (b, h, w))


def h_pred(left, w: int):
    b, h = left.shape
    return jnp.broadcast_to(left[:, :, None], (b, h, w))


def paeth_pred(above, left, above_left):
    b, w = above.shape
    h = left.shape[1]
    t = above[:, None, :]           # (B,1,W)
    l = left[:, :, None]            # (B,H,1)
    tl = above_left[:, None, None]  # (B,1,1)
    base = t + l - tl
    p_t = jnp.abs(base - t)
    p_l = jnp.abs(base - l)
    p_tl = jnp.abs(base - tl)
    pred = jnp.where((p_l <= p_t) & (p_l <= p_tl), l,
                     jnp.where(p_t <= p_tl, t, tl))
    return jnp.broadcast_to(pred, (b, h, w))


def smooth_pred(above, left, h: int, w: int):
    b = above.shape[0]
    wh = jnp.asarray(sm_weights(h))          # (H,)
    ww = jnp.asarray(sm_weights(w))          # (W,)
    below = left[:, h - 1][:, None, None]    # bottom-left sample
    right = above[:, w - 1][:, None, None]   # top-right sample
    t = above[:, None, :]
    l = left[:, :, None]
    scale = 1 << SM_WEIGHT_LOG2
    total = (wh[None, :, None] * t + (scale - wh[None, :, None]) * below +
             ww[None, None, :] * l + (scale - ww[None, None, :]) * right)
    log2 = SM_WEIGHT_LOG2 + 1
    pred = (total + (1 << (log2 - 1))) >> log2
    return jnp.broadcast_to(pred, (b, h, w))


def smooth_v_pred(above, left, h: int, w: int):
    b = above.shape[0]
    wh = jnp.asarray(sm_weights(h))
    below = left[:, h - 1][:, None, None]
    t = above[:, None, :]
    scale = 1 << SM_WEIGHT_LOG2
    total = wh[None, :, None] * t + (scale - wh[None, :, None]) * below
    pred = (total + (scale >> 1)) >> SM_WEIGHT_LOG2
    return jnp.broadcast_to(pred, (b, h, w))


def smooth_h_pred(above, left, h: int, w: int):
    b = above.shape[0]
    ww = jnp.asarray(sm_weights(w))
    right = above[:, w - 1][:, None, None]
    l = left[:, :, None]
    scale = 1 << SM_WEIGHT_LOG2
    total = ww[None, None, :] * l + (scale - ww[None, None, :]) * right
    pred = (total + (scale >> 1)) >> SM_WEIGHT_LOG2
    return jnp.broadcast_to(pred, (b, h, w))


MODE_TO_ANGLE = {cc.V_PRED: 90, cc.H_PRED: 180, cc.D45_PRED: 45,
                 cc.D135_PRED: 135, cc.D113_PRED: 113, cc.D157_PRED: 157,
                 cc.D203_PRED: 203, cc.D67_PRED: 67}


@functools.lru_cache(maxsize=1)
def dr_derivative() -> np.ndarray:
    return _tables()["dr_intra_derivative"].astype(np.int32)


def get_dx(angle: int) -> int:
    d = dr_derivative()
    if 0 < angle < 90:
        return int(d[angle])
    if 90 < angle < 180:
        return int(d[180 - angle])
    return 1


def get_dy(angle: int) -> int:
    d = dr_derivative()
    if 90 < angle < 180:
        return int(d[angle - 90])
    if 180 < angle < 270:
        return int(d[270 - angle])
    return 1


def z2_pred(above, left, above_left, h: int, w: int, angle: int):
    """Directional prediction, zone 2 (90 < angle < 180), upsample off
    (normative dr_prediction_z2 with enable_intra_edge_filter = 0).

    Uses only above[0..w-1], left[0..h-1] and the corner — no
    above-right / below-left samples."""
    assert 90 < angle < 180
    dx = get_dx(angle)
    dy = get_dy(angle)
    b = above.shape[0]
    # arrays with the corner at index 0
    atab = jnp.concatenate([above_left[:, None], above], axis=1)  # (B, w+1)
    ltab = jnp.concatenate([above_left[:, None], left], axis=1)   # (B, h+1)
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    x = -(r + 1) * dx                        # (h, 1)
    base1 = (x >> 6) + c                     # (h, w)
    shift1 = ((x & 63) >> 1) * np.ones_like(c)
    y = (r << 6) - (c + 1) * dy
    base2 = y >> 6
    shift2 = (y & 63) >> 1
    use_above = base1 >= -1
    # clamp gather indices into valid range; selection masks out the rest
    ia = np.clip(base1 + 1, 0, w - 1)
    il = np.clip(base2 + 1, 0, h - 1)
    av = (atab[:, ia] * (32 - shift1)[None]
          + atab[:, ia + 1] * shift1[None] + 16) >> 5
    lv = (ltab[:, il] * (32 - shift2)[None]
          + ltab[:, il + 1] * shift2[None] + 16) >> 5
    return jnp.where(jnp.asarray(use_above)[None], av, lv)


def z1_pred(above_ext, h: int, w: int, angle: int):
    """Directional zone 1 (angle < 90), upsample off.

    above_ext: (B, w+h+1) — above row extended across the top-right
    (prepared with availability replication); last entry duplicates
    above_ext[w+h-1] so idx+1 gathers stay in range."""
    assert 0 < angle < 90
    dx = get_dx(angle)
    max_base_x = w + h - 1
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    x = (r + 1) * dx
    base = (x >> 6) + c
    shift = ((x & 63) >> 1) * np.ones_like(c)
    idx = np.minimum(base, max_base_x)
    val = (above_ext[:, idx] * (32 - shift)[None]
           + above_ext[:, idx + 1] * shift[None] + 16) >> 5
    return jnp.where(jnp.asarray(base >= max_base_x)[None],
                     above_ext[:, max_base_x][:, None, None], val)


def z3_pred(left_ext, h: int, w: int, angle: int):
    """Directional zone 3 (angle > 180), upsample off.

    left_ext: (B, w+h+1) — left column extended across the bottom-left."""
    assert 180 < angle < 270
    dy = get_dy(angle)
    max_base_y = w + h - 1
    r = np.arange(h)[:, None]
    c = np.arange(w)[None, :]
    y = (c + 1) * dy
    base = (y >> 6) + r
    shift = ((y & 63) >> 1) * np.ones_like(r)
    idx = np.minimum(base, max_base_y)
    val = (left_ext[:, idx] * (32 - shift)[None]
           + left_ext[:, idx + 1] * shift[None] + 16) >> 5
    return jnp.where(jnp.asarray(base >= max_base_y)[None],
                     left_ext[:, max_base_y][:, None, None], val)


def cfl_ac_420(luma, h: int, w: int):
    """CfL luma AC buffer for 4:2:0 (spec cfl_luma_subsampling_420 +
    subtract_average; behavioral reference intra_prediction.c:420,448):
    2x2 box sum << 1 (q3), minus the rounded block average.

    luma: (B, 2h, 2w) int32 reconstructed luma.  Returns (B, h, w) q3."""
    sub = ((luma[:, 0::2, 0::2] + luma[:, 0::2, 1::2]
            + luma[:, 1::2, 0::2] + luma[:, 1::2, 1::2]) << 1)
    npel_log2 = int(np.log2(h * w))
    ro = (h * w) // 2
    avg = (jnp.sum(sub, axis=(1, 2)) + ro) >> npel_log2
    return sub - avg[:, None, None]


def cfl_predict(dc_pred, ac_q3, alpha_q3, bd: int = 8):
    """CfL prediction: dc + round(alpha_q3 * ac_q3 / 64), signed
    rounding, clipped (reference C_DEFAULT/cfl_c.c get_scaled_luma_q0).

    alpha_q3: scalar or (B,) or (B,1,1) int32 in [-16, 16]."""
    a = jnp.asarray(alpha_q3)
    if a.ndim == 1:
        a = a[:, None, None]
    v = a * ac_q3
    scaled = jnp.where(v < 0, -((-v + 32) >> 6), (v + 32) >> 6)
    return jnp.clip(dc_pred + scaled, 0, (1 << bd) - 1)


def predict(mode: int, above, left, above_left, h: int, w: int,
            have_above=None, have_left=None, bd: int = 8):
    """Dispatch a single intra mode (static) over a batch.

    have_above/have_left: optional (B,) bool arrays — only DC consults them
    (spec: DC averages only available edges); other modes rely on
    ``prepare_neighbors`` substitution.
    """
    b = above.shape[0]
    if mode == cc.DC_PRED:
        if have_above is None:
            return dc_pred(above, left, bd)
        ha = have_above.astype(jnp.int32)
        hl = have_left.astype(jnp.int32)
        full = dc_pred(above, left, bd)
        top = dc_top_pred(above, h)
        lft = dc_left_pred(left, w)
        none = dc_128_pred(b, h, w, bd)
        return jnp.where((ha & hl)[:, None, None].astype(bool), full,
               jnp.where(ha[:, None, None].astype(bool), top,
               jnp.where(hl[:, None, None].astype(bool), lft, none)))
    if mode == cc.V_PRED:
        return v_pred(above, h)
    if mode == cc.H_PRED:
        return h_pred(left, w)
    if mode == cc.SMOOTH_PRED:
        return smooth_pred(above, left, h, w)
    if mode == cc.SMOOTH_V_PRED:
        return smooth_v_pred(above, left, h, w)
    if mode == cc.SMOOTH_H_PRED:
        return smooth_h_pred(above, left, h, w)
    if mode == cc.PAETH_PRED:
        return paeth_pred(above, left, above_left)
    if mode in (cc.D135_PRED, cc.D113_PRED, cc.D157_PRED):
        return z2_pred(above, left, above_left, h, w, MODE_TO_ANGLE[mode])
    raise NotImplementedError(f"intra mode {mode}")


# ---------------------------------------------------------------------------
# recursive filter intra (spec 7.11.2.3; reference filterintra_c.c
# svt_av1_filter_intra_predictor / intra_prediction.c:2474 highbd)
# ---------------------------------------------------------------------------

# normative Intra_Filter_Taps (5 modes x 8 outputs x 7 inputs)
FILTER_INTRA_TAPS = np.array([
    [[-6, 10, 0, 0, 0, 12, 0], [-5, 2, 10, 0, 0, 9, 0],
     [-3, 1, 1, 10, 0, 7, 0], [-3, 1, 1, 2, 10, 5, 0],
     [-4, 6, 0, 0, 0, 2, 12], [-3, 2, 6, 0, 0, 2, 9],
     [-3, 2, 2, 6, 0, 2, 7], [-3, 1, 2, 2, 6, 3, 5]],
    [[-10, 16, 0, 0, 0, 10, 0], [-6, 0, 16, 0, 0, 6, 0],
     [-4, 0, 0, 16, 0, 4, 0], [-2, 0, 0, 0, 16, 2, 0],
     [-10, 16, 0, 0, 0, 0, 10], [-6, 0, 16, 0, 0, 0, 6],
     [-4, 0, 0, 16, 0, 0, 4], [-2, 0, 0, 0, 16, 0, 2]],
    [[-8, 8, 0, 0, 0, 16, 0], [-8, 0, 8, 0, 0, 16, 0],
     [-8, 0, 0, 8, 0, 16, 0], [-8, 0, 0, 0, 8, 16, 0],
     [-4, 4, 0, 0, 0, 0, 16], [-4, 0, 4, 0, 0, 0, 16],
     [-4, 0, 0, 4, 0, 0, 16], [-4, 0, 0, 0, 4, 0, 16]],
    [[-2, 8, 0, 0, 0, 10, 0], [-1, 3, 8, 0, 0, 6, 0],
     [-1, 2, 3, 8, 0, 4, 0], [0, 1, 2, 3, 8, 2, 0],
     [-1, 4, 0, 0, 0, 3, 10], [-1, 3, 4, 0, 0, 4, 6],
     [-1, 2, 3, 4, 0, 4, 4], [-1, 2, 2, 3, 4, 3, 3]],
    [[-12, 14, 0, 0, 0, 14, 0], [-10, 0, 14, 0, 0, 12, 0],
     [-9, 0, 0, 14, 0, 11, 0], [-8, 0, 0, 0, 14, 10, 0],
     [-10, 12, 0, 0, 0, 0, 14], [-9, 1, 12, 0, 0, 0, 12],
     [-8, 0, 0, 12, 0, 1, 11], [-7, 0, 0, 1, 12, 1, 9]],
], np.int32)

FILTER_INTRA_MODES = 5


def filter_intra_pred(above, left, above_left, fi_mode: int, h: int,
                      w: int, bd: int = 8):
    """Recursive filter-intra prediction, batched over B blocks.

    4x2 tiles in an anti-diagonal wavefront (tile (tr, tc) reads its
    above, above-right and left tiles); each wave is one small einsum
    over all ready tiles.  Bit-exact vs the reference scalar loop."""
    b = above.shape[0]
    buf = jnp.zeros((b, h + 1, w + 1), jnp.int32)
    buf = buf.at[:, 0, 0].set(above_left)
    buf = buf.at[:, 0, 1:].set(above[:, :w])
    buf = buf.at[:, 1:, 0].set(left[:, :h])
    taps = jnp.asarray(FILTER_INTRA_TAPS[fi_mode])          # (8, 7)
    nh, nw = h // 2, w // 4
    hi = (1 << bd) - 1
    for wv in range(2 * (nh - 1) + nw):
        tiles = [(tr, tc) for tr in range(nh) for tc in range(nw)
                 if 2 * tr + tc == wv]
        if not tiles:
            continue
        ps = []
        for tr, tc in tiles:
            r, c = 2 * tr + 1, 4 * tc + 1
            ps.append(jnp.stack(
                [buf[:, r - 1, c - 1], buf[:, r - 1, c],
                 buf[:, r - 1, c + 1], buf[:, r - 1, c + 2],
                 buf[:, r - 1, c + 3], buf[:, r, c - 1],
                 buf[:, r + 1, c - 1]], axis=-1))
        p = jnp.stack(ps, axis=1)                            # (B, T, 7)
        acc = jnp.einsum("btj,kj->btk", p, taps,
                         preferred_element_type=jnp.int32)
        # ROUND_POWER_OF_TWO_SIGNED(acc, 4), then pixel clip
        mag = (jnp.abs(acc) + 8) >> 4
        out = jnp.clip(jnp.where(acc < 0, -mag, mag), 0, hi)
        for ti, (tr, tc) in enumerate(tiles):
            r, c = 2 * tr + 1, 4 * tc + 1
            buf = jax.lax.dynamic_update_slice(
                buf, out[:, ti].reshape(b, 2, 4), (0, r, c))
    return buf[:, 1:, 1:]


def filter_intra_pred_multi(above, left, above_left, fi_modes, h: int,
                            w: int, bd: int = 8):
    """All requested filter-intra modes in ONE wavefront pass: modes are
    stacked along the batch axis with per-sample tap matrices, so the
    trace cost is that of a single mode.  Returns (M, B, h, w)."""
    b = above.shape[0]
    m = len(fi_modes)
    above_m = jnp.tile(above, (m, 1))
    left_m = jnp.tile(left, (m, 1))
    corner_m = jnp.tile(above_left, (m,))
    taps_m = jnp.repeat(jnp.asarray(FILTER_INTRA_TAPS[list(fi_modes)]),
                        b, axis=0)                       # (M*B, 8, 7)
    bm = b * m
    buf = jnp.zeros((bm, h + 1, w + 1), jnp.int32)
    buf = buf.at[:, 0, 0].set(corner_m)
    buf = buf.at[:, 0, 1:].set(above_m[:, :w])
    buf = buf.at[:, 1:, 0].set(left_m[:, :h])
    nh, nw = h // 2, w // 4
    hi = (1 << bd) - 1
    for wv in range(2 * (nh - 1) + nw):
        tiles = [(tr, tc) for tr in range(nh) for tc in range(nw)
                 if 2 * tr + tc == wv]
        if not tiles:
            continue
        ps = []
        for tr, tc in tiles:
            r, c = 2 * tr + 1, 4 * tc + 1
            ps.append(jnp.stack(
                [buf[:, r - 1, c - 1], buf[:, r - 1, c],
                 buf[:, r - 1, c + 1], buf[:, r - 1, c + 2],
                 buf[:, r - 1, c + 3], buf[:, r, c - 1],
                 buf[:, r + 1, c - 1]], axis=-1))
        p = jnp.stack(ps, axis=1)                        # (MB, T, 7)
        acc = jnp.einsum("btj,bkj->btk", p, taps_m,
                         preferred_element_type=jnp.int32)
        mag = (jnp.abs(acc) + 8) >> 4
        out = jnp.clip(jnp.where(acc < 0, -mag, mag), 0, hi)
        for ti, (tr, tc) in enumerate(tiles):
            r, c = 2 * tr + 1, 4 * tc + 1
            buf = jax.lax.dynamic_update_slice(
                buf, out[:, ti].reshape(bm, 2, 4), (0, r, c))
    return buf[:, 1:, 1:].reshape(m, b, h, w)
