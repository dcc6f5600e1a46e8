"""Rectangular (HORZ/VERT) partition leaves, produced by the device
pair-merge in the fast GOP path (gop_fast._build_p1 rect merges): a
32x32 parent whose top/bottom (or left/right) halves each move
uniformly but differently codes PARTITION_HORZ/VERT with two skip
32x16 / 16x32 leaves.  Streams must decode bit-exactly — including the
mask-aware DLF, whose interior edges switch off over a merged rect
leaf (spec 7.14; reference d1 rect compare,
product_coding_loop.c:10350-10420)."""
import numpy as np
import pytest

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.codec.decoder import Decoder


def _encode_decode(frames, w, h):
    cfg = EncoderConfig(source_width=w, source_height=h, qp=35,
                        intra_period_length=-1, hierarchical_levels=2,
                        enc_mode=6)
    enc = Encoder(cfg)
    for i, (y, u, v) in enumerate(frames):
        enc.send_picture(y, u, v, eos=(i == len(frames) - 1))
    pkts = []
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    dec = Decoder()
    decoded = []
    rect_seen = set()
    for p in pkts:
        for rec in dec.decode_temporal_unit(p.data):
            decoded.append(rec)
        for d in (dec.last_decisions or {}).values():
            if d.bsize in (cc.BLOCK_32X16, cc.BLOCK_16X32):
                rect_seen.add(d.bsize)
    disp = [p for p in pkts if p.displayed]
    assert len(decoded) == len(disp)
    for i, (p, rec) in enumerate(zip(disp, decoded)):
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)
    return rect_seen


def _two_motion_frames(n, w, h, horz: bool, seed=7):
    """Two uniform-motion halves split at an odd 16-multiple (48), so
    32x32 parents straddling the seam hold two internally-uniform
    pairs with different MVs -> the rect merge, not merge32, fires."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 250, (h, w)).astype(np.int32)
    # low-pass for stable subpel-free motion
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
            + np.roll(base, (1, 1), (0, 1))) // 4
    u0 = rng.integers(60, 200, (h // 2, w // 2)).astype(np.uint8)
    frames = []
    for t in range(n):
        y = np.empty((h, w), np.int32)
        if horz:
            y[:48] = np.roll(base[:48], 2 * t, axis=1)
            y[48:] = np.roll(base[48:], -2 * t, axis=1)
        else:
            y[:, :48] = np.roll(base[:, :48], 2 * t, axis=0)
            y[:, 48:] = np.roll(base[:, 48:], -2 * t, axis=0)
        frames.append((y.astype(np.uint8), u0, u0))
    return frames


@pytest.mark.parametrize("horz", [True, False])
def test_rect_merge_roundtrip(horz):
    w = h = 96
    frames = _two_motion_frames(5, w, h, horz)
    rect = _encode_decode(frames, w, h)
    want = cc.BLOCK_32X16 if horz else cc.BLOCK_16X32
    assert want in rect, f"expected rect leaves, saw {rect}"
