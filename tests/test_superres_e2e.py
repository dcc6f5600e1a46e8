"""Super-resolution in-loop: half-width coding + normative upscale
(after CDEF, before LR), decode equality, bitrate saving."""
import numpy as np

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec.decoder import Decoder


def _smooth(h=96, w=160, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(110 + 70 * np.sin(xx / 15.0) + 40 * np.cos(yy / 11.0)
                + rng.normal(0, 3, (h, w)), 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    return y, u, v


def _run(superres, lr=0):
    y, u, v = _smooth()
    cfg = EncoderConfig(source_width=160, source_height=96, qp=40,
                        superres_mode=superres, enable_dlf_flag=True,
                        cdef_level=1, enable_restoration_filtering=lr)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    return (y, u, v), enc.get_packet()


def test_superres_decode_matches():
    _, pkt = _run(1)
    rec = Decoder().decode_temporal_unit(pkt.data)[0]
    assert rec["y"].shape == (96, 160)  # upscaled output
    for p in ("y", "u", "v"):
        assert np.array_equal(rec[p], pkt.recon[p]), p


def test_superres_with_restoration():
    """LR operates on the upscaled frame (spec order: CDEF -> upscale ->
    LR) with upscaled deblock boundary rows."""
    _, pkt = _run(1, lr=1)
    rec = Decoder().decode_temporal_unit(pkt.data)[0]
    for p in ("y", "u", "v"):
        assert np.array_equal(rec[p], pkt.recon[p]), p


def test_superres_saves_bits():
    (y, _, _), p_off = _run(0)
    _, p_on = _run(1)
    assert len(p_on.data) < len(p_off.data)

    def psnr(p):
        mse = np.mean((p.recon["y"].astype(np.float64) - y) ** 2)
        return 10 * np.log10(255 ** 2 / mse)

    assert psnr(p_on) > psnr(p_off) - 1.5  # smooth content: tiny loss


def test_superres_header_roundtrip():
    from svt_av1_tpu.codec import obu
    from svt_av1_tpu.utils.bitio import BitReader
    _, pkt = _run(1)
    for t, payload in obu.parse_obus(pkt.data):
        if t == obu.OBU_SEQUENCE_HEADER:
            sp = obu.read_sequence_header(payload)
            assert sp.enable_superres
        elif t == obu.OBU_FRAME:
            fp = obu.read_frame_header(BitReader(payload), sp)
            assert fp.superres_denom == 16
            assert fp.coded_width(sp.width) == sp.width // 2
