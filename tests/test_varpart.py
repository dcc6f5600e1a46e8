"""Variable square partitions (64/32/16): selection behavior, decode
equality, and RD sanity vs the fixed-16 grid."""
import numpy as np
import pytest

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.codec.decoder import Decoder


def _mixed_content(h=96, w=128, seed=2):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (100 + 50 * np.sin(xx / 40.0) + 30 * np.cos(yy / 33.0)).astype(
        np.int32)
    y[:48, :48] = rng.integers(0, 256, (48, 48))  # textured corner
    y = np.clip(y, 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)
    return y, u, v


def _run(enc_mode, qp=40):
    y, u, v = _mixed_content()
    cfg = EncoderConfig(source_width=128, source_height=96, qp=qp,
                        enc_mode=enc_mode)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    return (y, u, v), enc.get_packet()


def test_varpart_decode_matches():
    _, pkt = _run(enc_mode=4)
    rec = Decoder().decode_temporal_unit(pkt.data)[0]
    for p in ("y", "u", "v"):
        assert np.array_equal(rec[p], pkt.recon[p]), p


def test_varpart_selects_both_depths():
    _, pkt = _run(enc_mode=4)
    ds = Decoder().decode_temporal_unit(pkt.data)[0]["decisions"]
    sizes = {d.bsize for d in ds.values()}
    assert sizes & {cc.BLOCK_32X32, cc.BLOCK_64X64}, \
        "smooth regions should merge to 32/64"
    assert cc.BLOCK_16X16 in sizes, "textured regions should stay at 16"
    # coverage: leaf areas must tile the frame exactly
    area = sum(int(cc.block_size_wide[d.bsize]) ** 2 for d in ds.values())
    assert area == 128 * 96


def test_varpart_rd_not_worse():
    """At the same q, varpart must not lose on both bytes AND PSNR."""
    (y, _, _), p4 = _run(enc_mode=4)
    _, p10 = _run(enc_mode=10)

    def psnr(p):
        mse = np.mean((p.recon["y"].astype(np.float64) - y) ** 2)
        return 10 * np.log10(255 ** 2 / mse)

    assert (len(p4.data) <= len(p10.data) * 1.02
            or psnr(p4) >= psnr(p10) - 0.05)


def test_varpart_odd_dims():
    """16-aligned but not 32-aligned dims: edge 32-slots force SPLIT."""
    rng = np.random.default_rng(1)
    h, w = 80, 112  # 5x7 grid of 16, not divisible by 32
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 120, np.uint8)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        enc_mode=4)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    pkt = enc.get_packet()
    rec = Decoder().decode_temporal_unit(pkt.data)[0]
    for p in ("y", "u", "v"):
        assert np.array_equal(rec[p], pkt.recon[p]), p
