"""10-bit end-to-end intra roundtrip."""
import numpy as np

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec.decoder import Decoder


def test_10bit_roundtrip():
    w, h = 64, 64
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(400 + 240 * np.sin(xx / 17.0) + 200 * np.cos(yy / 23.0)
                + rng.integers(-16, 17, (h, w)), 0, 1023).astype(np.uint16)
    u = np.clip(512 + 160 * np.sin(xx[::2, ::2] / 31.0), 0,
                1023).astype(np.uint16)
    v = np.clip(512 + 160 * np.cos(yy[::2, ::2] / 29.0), 0,
                1023).astype(np.uint16)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=35,
                        encoder_bit_depth=10)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    pkt = enc.get_packet()
    dec = Decoder()
    rec = dec.decode_temporal_unit(pkt.data)[0]
    assert rec["y"].dtype == np.uint16
    assert np.array_equal(rec["y"], pkt.recon["y"])
    assert np.array_equal(rec["u"], pkt.recon["u"])
    assert np.array_equal(rec["v"], pkt.recon["v"])
    mse = np.mean((rec["y"].astype(np.float64) - y) ** 2)
    psnr = 10 * np.log10(1023.0 ** 2 / mse)
    assert psnr > 34.0, psnr
