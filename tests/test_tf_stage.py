"""MCTF pipeline stage: denoising gain + lookahead E2E integrity."""
import numpy as np

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec.decoder import Decoder
from svt_av1_tpu.pipeline import tf_stage


def _noisy_static(n, h=96, w=128, sigma=6, seed=5):
    rng = np.random.default_rng(seed)
    base = np.kron(rng.integers(40, 200, (h // 8, w // 8)),
                   np.ones((8, 8))).astype(np.int32)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    frames = [(np.clip(base + rng.normal(0, sigma, (h, w)), 0,
                       255).astype(np.uint8), u, v) for _ in range(n)]
    return base, frames


def test_mctf_denoises():
    base, fs = _noisy_static(3)
    fy, _, _ = tf_stage.mctf_filter_frame(fs[0], fs[1:])
    mse0 = np.mean((fs[0][0].astype(np.float64) - base) ** 2)
    mse1 = np.mean((fy.astype(np.float64) - base) ** 2)
    assert mse1 < mse0 * 0.6, (mse0, mse1)


def test_mctf_gop_e2e():
    """TF lookahead delays packets but preserves count, order, and
    decode equality; key-frame quality vs clean content improves."""
    base, frames = _noisy_static(5)

    def run(tf):
        cfg = EncoderConfig(source_width=128, source_height=96, qp=40,
                            intra_period_length=-1, enable_tf=tf)
        enc = Encoder(cfg)
        dec = Decoder()
        pk = []
        for i, (y, u, v) in enumerate(frames):
            enc.send_picture(y, u, v, eos=(i == 4))
            while True:
                p = enc.get_packet()
                if p is None:
                    break
                pk.append(p)
                rec = dec.decode_temporal_unit(p.data)[0]
                for pl in ("y", "u", "v"):
                    assert np.array_equal(rec[pl], p.recon[pl]), (p.pts, pl)
        assert [p.pts for p in pk] == list(range(5))
        mse = np.mean((pk[0].recon["y"].astype(np.float64) - base) ** 2)
        return 10 * np.log10(255 ** 2 / mse)

    p_off = run(0)
    p_on = run(1)
    assert p_on > p_off + 1.0, (p_off, p_on)


def test_mctf_filters_chroma():
    import numpy as np
    from svt_av1_tpu.pipeline.tf_stage import mctf_filter_frame
    rng = np.random.default_rng(0)
    h, w = 64, 96
    clean_u = np.full((h // 2, w // 2), 120.0)
    frames = []
    for t in range(3):
        xx = np.arange(w)[None, :]
        y = np.clip(110 + 50 * np.sin(xx / 13.0)
                    + rng.normal(0, 8, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(clean_u + rng.normal(0, 8, (h // 2, w // 2)), 0,
                    255).astype(np.uint8)
        v = np.clip(clean_u + rng.normal(0, 8, (h // 2, w // 2)), 0,
                    255).astype(np.uint8)
        frames.append((y, u, v))
    _, fu, _ = mctf_filter_frame(frames[1], [frames[0], frames[2]])
    assert not np.array_equal(fu, frames[1][1]), "chroma must filter"
    assert (np.std(fu.astype(float) - clean_u)
            < np.std(frames[1][1].astype(float) - clean_u))


def test_mctf_altref_minigop_saves_bits():
    """MCTF on the mini-GoP base frame (the reference's alt-ref TF,
    pd_process.c:3345-3385): on noisy static content the filtered base
    predicts the pyramid better, so the GOP spends fewer bits; the
    stream must still decode cleanly."""
    import numpy as np
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder
    rng = np.random.default_rng(11)
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w]
    still = np.clip(110 + 60 * np.sin(xx / 9.0) * np.cos(yy / 11.0),
                    0, 255)
    frames = []
    # noise must survive quantization at the test qp or both encodes
    # collapse to all-skip GOPs and TF cannot show a difference (the
    # round-3 compound tools absorb +-9 noise at qp 35)
    for t in range(9):
        y = np.clip(still + rng.integers(-16, 17, (h, w)), 0,
                    255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        frames.append((y, u.copy(), u.copy()))

    def run(tf):
        cfg = EncoderConfig(source_width=w, source_height=h, qp=28,
                            intra_period_length=31,
                            hierarchical_levels=2, enc_mode=6,
                            enable_tf=tf)
        enc = Encoder(cfg)
        for i, (y, u, v) in enumerate(frames):
            enc.send_picture(y, u, v, eos=(i == len(frames) - 1))
        bits = 0
        pkts = []
        while True:
            p = enc.get_packet()
            if p is None:
                break
            bits += len(p.data) * 8
            pkts.append(p)
        dec = Decoder()
        n = 0
        for p in pkts:
            n += len(dec.decode_temporal_unit(p.data))
        assert n == len(frames)
        return bits

    b_off = run(0)
    b_on = run(1)
    assert b_on < b_off, (b_on, b_off)
