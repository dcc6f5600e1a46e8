"""Inter-intra compound (ops/interintra.py + syntax + MD + recon).

Behavioral reference: inter_prediction.c:2110-2214 (ii_weights1d,
build_smooth_interintra_mask, combine_interintra),
entropy_coding.c:5109-5137 (interintra flag/mode/wedge syntax).
"""
import numpy as np

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec.decoder import Decoder
from svt_av1_tpu.ops import interintra as ii_ops


def test_ii_masks():
    """Normative mask construction for the 16x16/8x8 grid."""
    assert ii_ops.MASKS_Y16.shape == (4, 16, 16)
    assert np.all(ii_ops.MASKS_Y16[ii_ops.II_DC] == 32)
    v = ii_ops.MASKS_Y16[ii_ops.II_V]
    assert v[0, 0] == 60 and v[15, 0] == ii_ops.II_WEIGHTS_1D[120]
    assert np.all(v == v[:, :1])          # vertical: constant rows
    hmask = ii_ops.MASKS_Y16[ii_ops.II_H]
    assert np.array_equal(hmask, v.T)
    sm = ii_ops.MASKS_Y16[ii_ops.II_SMOOTH]
    assert sm[3, 7] == ii_ops.II_WEIGHTS_1D[3 * 8]
    # blend: m=32 (DC) is the symmetric average
    out = ii_ops.blend(np.full((4, 4), 100), np.full((4, 4), 50),
                       np.full((4, 4), 32))
    assert np.all(out == (32 * 100 + 32 * 50 + 32) >> 6)


def _smooth(a):
    a = np.pad(a, 1, mode="edge")
    return ((a[:-2, :-2] + a[:-2, 1:-1] + a[:-2, 2:] + a[1:-1, :-2]
             + a[1:-1, 1:-1] + a[1:-1, 2:] + a[2:, :-2] + a[2:, 1:-1]
             + a[2:, 2:]) / 9)


def test_interintra_e2e_roundtrip(monkeypatch):
    """A smooth gradient region wiping over textured motion: the intra
    component predicts the gradient, the inter component the texture —
    interintra wins at the boundary and decodes bit-exactly.

    Tool-isolation test (see test_obmc_e2e_roundtrip): part8 and
    tx_search are pinned off — 8x8 splits and ADST types absorb the
    wipe-boundary residual that interintra's blend removes, so with
    them on the interintra candidate legitimately stops winning on
    this synthetic clip.  The interintra machinery (masks, mode pick,
    syntax, decode) is what is under test."""
    import dataclasses

    from svt_av1_tpu.pipeline import presets as presets_mod
    orig = presets_mod.features_for
    monkeypatch.setattr(
        presets_mod, "features_for",
        lambda m: dataclasses.replace(orig(m), part8=False,
                                      tx_search=False))
    rng = np.random.default_rng(21)
    h = w = 64
    tex = _smooth(rng.integers(0, 255, (h, w + 32)).astype(np.float32))
    yy, xx = np.mgrid[0:h, 0:w]
    grad = np.clip(60 + yy * 2, 0, 255)
    n = 5
    frames = []
    for t in range(n):
        # texture pans 4 px/frame under a diagonal gradient wipe: at
        # the boundary neither pure inter (texture MV) nor pure intra
        # (gradient) predicts the block; the smooth-mask blend does.
        # qp 45 keeps enough rate pressure that the residual cannot
        # simply be coded away (round-5 recalibration after multi-seed
        # HME improved the pure-inter baseline).
        y = tex[:, 4 * t:4 * t + w].copy()
        m = (yy + xx) < min(2 * h, 20 * t)
        y[m] = grad[m]
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 135, np.uint8)
        frames.append((y.astype(np.uint8), u, v))
    cfg = EncoderConfig(source_width=w, source_height=h, qp=45,
                        intra_period_length=31, hierarchical_levels=2,
                        enc_mode=6, enable_tf=0)
    enc = Encoder(cfg)
    assert enc._feat.interintra and enc.sp.enable_interintra_compound
    for i, (y, u, v) in enumerate(frames):
        enc.send_picture(y, u, v, eos=(i == n - 1))
    pkts = []
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    disp = [p for p in pkts if p.displayed]
    dec = Decoder()
    decoded = []
    ii = 0
    for p in pkts:
        for rec in dec.decode_temporal_unit(p.data):
            decoded.append(rec)
            for d in rec.get("decisions", {}).values():
                if d.is_inter and d.interintra_mode >= 0:
                    ii += 1
    assert len(decoded) == n
    for i, (p, rec) in enumerate(zip(disp, decoded)):
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)
    assert ii > 0, "expected interintra winners at the wipe boundary"
