"""2-pass VBR: first-pass stats -> second-pass allocation near target."""
import sys

import numpy as np

sys.path.insert(0, "tests")


def test_two_pass_vbr_hits_budget():
    from test_e2e_inter import _moving_scene
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder

    frames = _moving_scene(6)
    target = 200_000

    def encode(cfg):
        enc = Encoder(cfg)
        pk = []
        for i, (y, u, v) in enumerate(frames):
            # TF lookahead (enable_tf default) adds latency: collect
            # packets as ready and drain the tail at EOS
            enc.send_picture(y, u, v, eos=(i == len(frames) - 1))
            p = enc.get_packet()
            if p is not None:
                pk.append(p)
        while True:
            p = enc.get_packet()
            if p is None:
                break
            pk.append(p)
        return enc, pk

    cfg1 = EncoderConfig(source_width=128, source_height=96, qp=45,
                         intra_period_length=-1, pass_=1, enc_mode=10)
    enc1, _ = encode(cfg1)
    stats = enc1.get_stats()
    cfg2 = EncoderConfig(source_width=128, source_height=96, qp=45,
                         intra_period_length=-1, pass_=2,
                         rate_control_mode=1, target_bit_rate=target,
                         rc_stats_buffer=stats, enc_mode=10)
    _, pk2 = encode(cfg2)
    bits2 = sum(len(p.data) for p in pk2) * 8
    budget = target / 30 * len(frames)
    assert 0.6 < bits2 / budget < 1.5, (bits2, budget)
    dec = Decoder()
    for p in pk2:
        rec = dec.decode_temporal_unit(p.data)[0]
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (p.pts, pl)


def test_stats_roundtrip():
    from svt_av1_tpu.pipeline import rate_control as rc
    entries = [(1200.0, 140, 1.0), (300.0, 140, 0.0), (280.0, 140, 0.0)]
    buf = rc.pack_first_pass_stats(entries)
    out = rc.unpack_first_pass_stats(buf)
    assert np.allclose(out, np.array(entries))
    plan = rc.plan_second_pass(out, 100_000, 30.0)
    assert plan.shape == (3,)
    assert ((plan >= 4) & (plan <= 255)).all()
    # a higher bitrate target must lower (or hold) every frame's q
    rich = rc.plan_second_pass(out, 400_000, 30.0)
    assert (rich <= plan).all()
