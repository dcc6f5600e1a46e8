"""Tile columns: uniform tile_info syntax, tile-clamped intra
availability in MD + reconstruction, size-prefixed tile groups,
tile-parallel native EC — encoder recon must equal decoder output."""
import numpy as np
import pytest

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec import obu
from svt_av1_tpu.codec.decoder import Decoder


def test_tile_layout():
    # 352 px -> 6 SB cols; log2=1 -> 2 tiles of 3 SBs
    assert obu.tile_cols_layout(352, 1) == [(0, 3), (3, 6)]
    assert obu.tile_cols_layout(352, 0) == [(0, 6)]
    # 128 px -> 2 SB cols; log2=1 -> 2 tiles of 1
    assert obu.tile_cols_layout(128, 1) == [(0, 1), (1, 2)]


@pytest.mark.parametrize("w,h,log2", [(128, 64, 1), (352, 64, 2)])
def test_tiles_roundtrip(w, h, log2):
    rng = np.random.default_rng(5)
    frames = []
    for t in range(3):
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        frames.append((y, u, v))
    cfg = EncoderConfig(source_width=w, source_height=h, qp=35,
                        tile_columns=log2)
    enc = Encoder(cfg)
    enc.send_pictures(frames, eos=True)
    dec = Decoder()
    n = 0
    while True:
        p = enc.get_packet()
        if p is None:
            break
        outs = dec.decode_temporal_unit(p.data)
        assert len(outs) == 1
        for pl in ("y", "u", "v"):
            assert np.array_equal(outs[0][pl], p.recon[pl]), (n, pl)
        n += 1
    assert n == 3


def test_tiles_stream_differs_from_single():
    rng = np.random.default_rng(6)
    y = rng.integers(0, 256, (64, 128)).astype(np.uint8)
    u = rng.integers(0, 256, (32, 64)).astype(np.uint8)
    v = rng.integers(0, 256, (32, 64)).astype(np.uint8)

    def run(cols):
        enc = Encoder(EncoderConfig(source_width=128, source_height=64,
                                    qp=35, tile_columns=cols))
        enc.send_pictures([(y, u, v)], eos=True)
        return enc.get_packet()

    p1 = run(0)
    p2 = run(1)
    assert p1.data != p2.data
    # tiling costs a little (contexts reset, clamped prediction)
    assert len(p2.data) != len(p1.data) or p1.data != p2.data
