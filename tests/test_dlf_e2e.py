"""E2E with deblocking enabled: stream round-trips and recon matches."""
import numpy as np

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec.decoder import Decoder

from test_e2e_intra import psnr, synth_frame


def test_intra_with_dlf():
    w, h = 64, 64
    y, u, v = synth_frame(w, h, seed=3)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=45,
                        enable_dlf_flag=True)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    pkt = enc.get_packet()
    dec = Decoder()
    rec = dec.decode_temporal_unit(pkt.data)[0]
    assert np.array_equal(rec["y"], pkt.recon["y"])
    assert np.array_equal(rec["u"], pkt.recon["u"])
    assert np.array_equal(rec["v"], pkt.recon["v"])
    assert psnr(rec["y"], y) > 24.0
