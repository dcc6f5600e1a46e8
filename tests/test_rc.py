"""Rate control: CBR converges near the target bitrate (all-intra)."""
import numpy as np

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder

from test_e2e_intra import synth_frame


def test_cbr_tracks_target():
    w, h = 64, 64
    fps = 30.0
    target = 400_000  # bits/s
    cfg = EncoderConfig(source_width=w, source_height=h, qp=20,
                        rate_control_mode=2, target_bit_rate=target,
                        frame_rate_numerator=30)
    enc = Encoder(cfg)
    sizes = []
    for i in range(24):
        y, u, v = synth_frame(w, h, seed=i % 3)
        enc.send_picture(y, u, v)
        sizes.append(len(enc.get_packet().data) * 8)
    # late-window average should be within 40% of target bits/frame
    tgt = target / fps
    avg = np.mean(sizes[12:])
    assert 0.6 * tgt < avg < 1.4 * tgt, (avg, tgt, sizes)


def test_recode_loop_on_overshoot():
    """A frame that blows past the CBR per-frame budget re-encodes at a
    higher qindex (rc_process.c:2708 recode_loop_test analog)."""
    import numpy as np
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (96, 128)).astype(np.uint8)  # incompressible
    u = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    v = rng.integers(0, 256, (48, 64)).astype(np.uint8)

    def run(tbr):
        cfg = EncoderConfig(source_width=128, source_height=96, qp=30,
                            rate_control_mode=2, target_bit_rate=tbr,
                            intra_period_length=8)
        enc = Encoder(cfg)
        enc.send_picture(y, u, v, eos=True)
        return enc.get_packet()

    # tiny budget forces the recode; generous budget does not
    small = run(20_000)
    big = run(5_000_000)
    assert len(small.data) < len(big.data)
