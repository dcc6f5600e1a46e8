"""End-to-end inter (IPPP) encode -> decode: recon equality, compression
gain, and inter-block selection on translating content."""
import numpy as np
import pytest

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec import obu
from svt_av1_tpu.codec.decoder import Decoder


def _moving_scene(n_frames, h=96, w=128, seed=3):
    """Textured background translating 2px/frame + static block."""
    rng = np.random.default_rng(seed)
    bigw = w + 8 * n_frames
    base = rng.integers(0, 255, (h // 4, bigw // 4)).astype(np.uint8)
    base = np.kron(base, np.ones((4, 4), np.uint8))  # blocky texture
    frames = []
    for i in range(n_frames):
        dx = 2 * i
        y = base[:, dx:dx + w].copy()
        y[48:64, 48:64] = 200  # static block-aligned square (zero MV)
        u = np.full((h // 2, w // 2), 100 + i, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        frames.append((y, u, v))
    return frames


@pytest.fixture(scope="module")
def gop_run():
    frames = _moving_scene(4)
    cfg = EncoderConfig(source_width=128, source_height=96, qp=40,
                        intra_period_length=-1)
    enc = Encoder(cfg)
    pkts = []
    for i, (y, u, v) in enumerate(frames):
        # TF lookahead (enable_tf default) adds latency: collect as
        # ready + drain at EOS
        enc.send_picture(y, u, v, eos=(i == len(frames) - 1))
        p = enc.get_packet()
        if p is not None:
            pkts.append(p)
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    return frames, pkts


def test_frame_types(gop_run):
    _, pkts = gop_run
    assert pkts[0].frame_type == obu.KEY_FRAME
    for p in pkts[1:]:
        assert p.frame_type == obu.INTER_FRAME


def test_inter_frames_cheaper(gop_run):
    _, pkts = gop_run
    key_size = len(pkts[0].data)
    for p in pkts[1:]:
        assert len(p.data) < key_size * 0.6, \
            f"P frame {p.pts}: {len(p.data)}B vs key {key_size}B"


def test_decode_matches_encoder_recon(gop_run):
    _, pkts = gop_run
    dec = Decoder()
    for p in pkts:
        rec = dec.decode_temporal_unit(p.data)[0]
        for plane in ("y", "u", "v"):
            assert np.array_equal(rec[plane], p.recon[plane]), \
                (p.pts, plane)


def test_inter_blocks_used_with_motion(gop_run):
    _, pkts = gop_run
    dec = Decoder()
    dec.decode_temporal_unit(pkts[0].data)
    rec = dec.decode_temporal_unit(pkts[1].data)[0]
    ds = rec["decisions"]
    inter = [d for d in ds.values() if d.is_inter]
    assert len(inter) > len(ds) // 2, \
        f"only {len(inter)}/{len(ds)} blocks inter on translating scene"
    # the moving texture should produce nonzero MVs somewhere
    assert any(d.mv != (0, 0) for d in inter)
    # the static square region should be zero-MV (block at pixel 48,48)
    static = ds[(12, 12)]
    if static.is_inter:
        assert static.mv == (0, 0)


def test_primary_ref_cdf_chaining(gop_run):
    """P frames chain their CDF init from slot 0 (primary_ref_frame)."""
    from svt_av1_tpu.utils.bitio import BitReader
    _, pkts = gop_run
    for p in pkts[1:]:
        for t, payload in obu.parse_obus(p.data):
            if t == obu.OBU_FRAME:
                sp = obu.SequenceParams(width=128, height=96)
                fp = obu.read_frame_header(BitReader(payload), sp)
                assert fp.primary_ref_frame == 0


def test_decoded_quality(gop_run):
    frames, pkts = gop_run
    dec = Decoder()
    for (y, _, _), p in zip(frames, pkts):
        rec = dec.decode_temporal_unit(p.data)[0]
        mse = np.mean((rec["y"][:96, :128].astype(np.float64)
                       - y.astype(np.float64)) ** 2)
        psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
        assert psnr > 28, f"frame {p.pts}: {psnr:.2f} dB"


def test_gop_with_dlf_and_cdef():
    """Full in-loop filter chain (DLF -> CDEF) on an IPPP GOP: the
    filtered recon feeds the DPB and decode stays bit-exact."""
    frames = _moving_scene(3)
    cfg = EncoderConfig(source_width=128, source_height=96, qp=45,
                        intra_period_length=-1, enable_dlf_flag=True,
                        cdef_level=1)
    enc = Encoder(cfg)
    dec = Decoder()
    pkts = []
    for i, (y, u, v) in enumerate(frames):
        enc.send_picture(y, u, v, eos=(i == 2))
        p = enc.get_packet()
        if p is not None:
            pkts.append(p)
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    assert len(pkts) == 3
    for i, p in enumerate(pkts):
        rec = dec.decode_temporal_unit(p.data)[0]
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)
