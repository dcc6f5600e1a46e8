"""Per-SB adaptive quantization (variance boost + delta_q syntax)."""
import numpy as np

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec.decoder import Decoder


def _half_smooth(h=128, w=128, seed=6):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (60 + xx * 0.6 + yy * 0.3).astype(np.int32)
    y[:, 64:] = rng.integers(0, 256, (h, 64))
    y = np.clip(y, 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    return y, u, v


def _run(aq, qp=50):
    y, u, v = _half_smooth()
    cfg = EncoderConfig(source_width=128, source_height=128, qp=qp,
                        enable_adaptive_quantization=aq, enc_mode=10)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    return (y, u, v), enc.get_packet()


def test_aq_decode_matches():
    _, pkt = _run(1)
    rec = Decoder().decode_temporal_unit(pkt.data)[0]
    for p in ("y", "u", "v"):
        assert np.array_equal(rec[p], pkt.recon[p]), p
    qs = {d.qindex for d in rec["decisions"].values()}
    assert len(qs) > 1, "variance boost should pick multiple qindexes"


def test_aq_improves_smooth_regions():
    (y, _, _), p_off = _run(0)
    _, p_on = _run(1)

    def smooth_psnr(p):
        mse = np.mean((p.recon["y"][:, :64].astype(np.float64)
                       - y[:, :64]) ** 2)
        return 10 * np.log10(255 ** 2 / max(mse, 1e-9))

    assert smooth_psnr(p_on) > smooth_psnr(p_off) + 1.0


def test_delta_q_header_roundtrip():
    from svt_av1_tpu.codec import obu
    from svt_av1_tpu.utils.bitio import BitReader
    _, pkt = _run(1)
    for t, payload in obu.parse_obus(pkt.data):
        if t == obu.OBU_SEQUENCE_HEADER:
            sp = obu.read_sequence_header(payload)
        elif t == obu.OBU_FRAME:
            fp = obu.read_frame_header(BitReader(payload), sp)
            assert fp.delta_q_present and fp.delta_q_res == 2
