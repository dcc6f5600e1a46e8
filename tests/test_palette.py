"""Screen-content palette (spec 5.11.46-49), round 4.

* tile-coder round trip of hand-built palette blocks (size/colors with
  the neighbor color cache, reordered index-map symbols);
* full-API A/B on synthetic screen content: palette blocks chosen,
  bits drop materially, and the stream decodes bit-exactly.
"""
import dataclasses

import numpy as np

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.codec import palette as pal
from svt_av1_tpu.codec.decoder import Decoder
from svt_av1_tpu.codec.syntax import BlockDecision, TileDecoder, TileEncoder
from svt_av1_tpu.pipeline import presets


def test_color_index_context_inverse():
    rng = np.random.default_rng(1)
    for n in range(2, 9):
        cmap = rng.integers(0, n, (16, 16)).astype(np.uint8)
        dec_map = np.zeros_like(cmap)
        dec_map[0, 0] = cmap[0, 0]
        for (r, c) in pal.diagonal_scan(16, 16):
            ctx_e, coded = pal.color_index_ctx(cmap, r, c)
            ctx_d, _ = pal.color_index_ctx(dec_map, r, c)
            assert ctx_e == ctx_d, (n, r, c)
            dec_map[r, c] = pal.inv_color_index(dec_map, r, c, coded)
        assert np.array_equal(dec_map, cmap), n


def test_tile_coder_palette_roundtrip():
    rng = np.random.default_rng(0)
    W = H = 64
    blocks = {}
    for r4 in range(0, 16, 4):
        for c4 in range(0, 16, 4):
            if (r4 + c4) % 8 == 0:
                n = 2 + (r4 // 4 + c4 // 4) % 6
                colors = np.sort(rng.choice(256, n, replace=False)) \
                    .astype(np.uint16)
                cmap = rng.integers(0, n, (16, 16)).astype(np.uint8)
                blocks[(r4, c4)] = BlockDecision(
                    r4=r4, c4=c4, bsize=cc.BLOCK_16X16,
                    y_mode=cc.DC_PRED, uv_mode=cc.DC_PRED,
                    tx_type=cc.DCT_DCT,
                    qcoeff_y=rng.integers(-2, 3, (16, 16))
                    .astype(np.int32),
                    qcoeff_u=np.zeros((8, 8), np.int32),
                    qcoeff_v=np.zeros((8, 8), np.int32),
                    palette=colors, palette_map=cmap)
            else:
                blocks[(r4, c4)] = BlockDecision(
                    r4=r4, c4=c4, bsize=cc.BLOCK_16X16,
                    y_mode=cc.V_PRED, uv_mode=cc.DC_PRED,
                    tx_type=cc.DCT_DCT,
                    qcoeff_y=rng.integers(-2, 3, (16, 16))
                    .astype(np.int32),
                    qcoeff_u=np.zeros((8, 8), np.int32),
                    qcoeff_v=np.zeros((8, 8), np.int32))
    enc = TileEncoder(W, H, 80, frame_is_intra=True)
    enc.allow_palette = True
    data = enc.encode(blocks, leaf_size=16, use_native=False)
    dec = TileDecoder(W, H, 80, frame_is_intra=True)
    dec.allow_palette = True
    out = dec.decode(data)
    for k, b in blocks.items():
        o = out[k]
        if b.palette is not None:
            assert np.array_equal(o.palette, b.palette), k
            assert np.array_equal(o.palette_map, b.palette_map), k
        else:
            assert o.palette is None, k
        assert np.array_equal(o.qcoeff_y, b.qcoeff_y), k


def _screen_frame(h=96, w=128):
    rng = np.random.default_rng(7)
    y = np.full((h, w), 235, np.uint8)
    for _ in range(40):
        r, c = rng.integers(0, h - 2), rng.integers(0, w - 12)
        y[r:r + 2, c:c + rng.integers(4, 12)] = 16
    y[:, 64:] = np.where((np.arange(64)[None, :] // 8
                          + np.arange(h)[:, None] // 8) % 2, 190, 30)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    return y, u, u.copy()


def test_palette_e2e_gain_and_roundtrip():
    y, u, v = _screen_frame()
    h, w = y.shape

    def run(palette):
        orig = presets.features_for
        presets.features_for = lambda m: dataclasses.replace(
            orig(m), palette=palette, varpart=False)
        try:
            cfg = EncoderConfig(source_width=w, source_height=h,
                                qp=35, enc_mode=6)
            enc = Encoder(cfg)
            enc.send_picture(y, u, v, eos=True)
            pkt = enc.get_packet()
        finally:
            presets.features_for = orig
        dec = Decoder()
        rec = dec.decode_temporal_unit(pkt.data)[0]
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], pkt.recon[pl]), pl
        npal = sum(1 for d in rec["decisions"].values()
                   if getattr(d, "palette", None) is not None)
        return len(pkt.data), npal

    b0, n0 = run(False)
    b1, n1 = run(True)
    assert n0 == 0 and n1 > 0
    assert b1 < 0.8 * b0, (b0, b1)
