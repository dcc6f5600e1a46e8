"""Translation global motion: estimation from the HME field, frame-header
param coding, GLOBALMV signaling with the gm vector, bit-exact decode."""
import numpy as np

from svt_av1_tpu.codec import obu
from svt_av1_tpu.pipeline.inter_encoder import estimate_global_translation
from svt_av1_tpu.utils.bitio import BitReader, BitWriter


def test_gm_subexp_roundtrip():
    for v in (-256, -100, -2, 0, 1, 7, 255, 256):
        w = BitWriter()
        obu._wb_write_signed_subexpfin(w, (1 << 8) + 1, 3, 0, v)
        w.byte_align()
        r = BitReader(w.data())
        assert obu._wb_read_signed_subexpfin(r, (1 << 8) + 1, 3, 0) == v


def test_gm_estimation():
    mv_y = np.full((8, 8), 3.0)
    mv_x = np.full((8, 8), -5.0)
    mv_y[0, 0] = 20  # outlier
    assert estimate_global_translation(mv_y, mv_x) == (24, -40)
    # static scene -> identity
    assert estimate_global_translation(np.zeros((8, 8)),
                                       np.zeros((8, 8))) is None
    # no consensus -> identity
    rng = np.random.default_rng(0)
    assert estimate_global_translation(
        rng.integers(-20, 20, (8, 8)).astype(float),
        rng.integers(-20, 20, (8, 8)).astype(float)) is None


def test_gm_e2e_panning():
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder
    rng = np.random.default_rng(9)
    base = rng.integers(0, 255, (64, 128)).astype(np.uint8)
    frames = []
    for t in range(4):
        y = np.roll(base, -4 * t, axis=1)   # 4 px/frame pan
        u = np.full((32, 64), 110, np.uint8)
        v = np.full((32, 64), 120, np.uint8)
        frames.append((y, u, v))
    cfg = EncoderConfig(source_width=128, source_height=64, qp=30,
                        intra_period_length=30)
    enc = Encoder(cfg)
    for i, (y, u, v) in enumerate(frames):
        enc.send_picture(y, u, v, eos=(i == 3))
    pkts = []
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    # inter frame headers carry a TRANSLATION gm for LAST
    from svt_av1_tpu.utils.bitio import BitReader
    seen_gm = False
    for p in pkts[1:]:
        for t, payload in obu.parse_obus(p.data):
            if t == obu.OBU_FRAME:
                fp = obu.read_frame_header(BitReader(payload), enc.sp)
                if fp.gm_trans[0] is not None:
                    seen_gm = True
                    # content shifts left 4px/frame -> mv col ~ +32/8px
                    assert abs(fp.gm_trans[0][1] - 32) <= 8
    assert seen_gm
    dec = Decoder()
    for i, p in enumerate(pkts):
        out = dec.decode_temporal_unit(p.data)[0]
        for pl in ("y", "u", "v"):
            assert np.array_equal(out[pl], p.recon[pl]), (i, pl)
