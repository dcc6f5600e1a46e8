"""OBMC_CAUSAL motion mode (ops/obmc.py + syntax + MD + recon).

Behavioral reference: inter_prediction.c:2406-2430 (normative
obmc_mask_N), enc_inter_prediction.c:1428-1523 (above-then-left blend
order, blend_a64_vmask/hmask semantics), entropy_coding.c
write_motion_mode / motion_mode_allowed, spec 7.11.3.9.
"""
import numpy as np

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec.decoder import Decoder
from svt_av1_tpu.ops import obmc as obmc_ops


def test_obmc_blend_semantics():
    """Mask weights the CURRENT prediction; rows/cols past the overlap
    are untouched (mask 64)."""
    cur = np.full((1, 16, 16), 100, np.int32)
    nb = np.full((1, 16, 16), 40, np.int32)
    out = obmc_ops.blend_above(cur, nb, obmc_ops.MASK_Y16)
    # row 0: (36*100 + 28*40 + 32) >> 6
    assert out[0, 0, 0] == (36 * 100 + 28 * 40 + 32) >> 6
    assert np.all(out[0, 8:] == 100)       # beyond the 8-row overlap
    outl = obmc_ops.blend_left(cur, nb, obmc_ops.MASK_Y16)
    assert outl[0, 0, 0] == (36 * 100 + 28 * 40 + 32) >> 6
    assert np.all(outl[0, :, 8:] == 100)


def _smooth(a):
    a = np.pad(a, 1, mode="edge")
    return ((a[:-2, :-2] + a[:-2, 1:-1] + a[:-2, 2:] + a[1:-1, :-2]
             + a[1:-1, 1:-1] + a[1:-1, 2:] + a[2:, :-2] + a[2:, 1:-1]
             + a[2:, 2:]) / 9)


def test_obmc_e2e_roundtrip(monkeypatch):
    """Non-affine motion (sinusoidal row displacement) gives adjacent
    block rows different MVs; OBMC wins on the seams, the motion_mode
    flag codes, and encoder recon == decoder recon bit-exactly.

    This is a tool-isolation test: part8 and tx_search are pinned off
    because both legitimately out-RD OBMC on exactly this seam content
    (8x8 splits model the per-row motion directly; ADST tx types code
    the smooth seam residual almost as well as the OBMC blend removes
    it — verified by A/B in round 5, where OBMC wins 1 block without
    tx_search and 0 with it, with the motion-mode alternatives priced
    through the same tx funnel).  The OBMC machinery itself (masks,
    blend order, syntax, decode) is what is under test."""
    import dataclasses

    from svt_av1_tpu.pipeline import presets as presets_mod
    orig = presets_mod.features_for
    monkeypatch.setattr(
        presets_mod, "features_for",
        lambda m: dataclasses.replace(orig(m), part8=False,
                                      tx_search=False))
    rng = np.random.default_rng(11)
    h = w = 64
    tex = _smooth(rng.integers(0, 255, (h, w + 48)).astype(np.float32))
    yy = np.mgrid[0:h, 0:w][0]
    n = 5
    frames = []
    for t in range(n):
        shift = ((8 + 6 * np.sin(yy[:, 0] / 10.0)) * t / (n - 1)
                 if t else np.zeros(h))
        y = np.stack([tex[r, int(round(shift[r])):
                          int(round(shift[r])) + w]
                      for r in range(h)]).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 135, np.uint8)
        frames.append((y, u, v))
    cfg = EncoderConfig(source_width=w, source_height=h, qp=50,
                        intra_period_length=31, hierarchical_levels=2,
                        enc_mode=6, enable_tf=0)
    enc = Encoder(cfg)
    assert enc._feat.obmc
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
    obmc = 0
    for p in pkts:
        for rec in dec.decode_temporal_unit(p.data):
            decoded.append(rec)
            for d in rec.get("decisions", {}).values():
                if d.is_inter and d.motion_mode:
                    obmc += 1
    assert len(decoded) == n
    for i, (p, rec) in enumerate(zip(disp, decoded)):
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)
    assert obmc > 0, "expected OBMC_CAUSAL winners on the motion seams"
