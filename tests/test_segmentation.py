"""Segmentation (SEG_LVL_ALT_Q): header round-trip, neg_interleave
inverse property, and segment-AQ encode/decode equality
(segmentation.c / spec 5.9.14, 5.11.14)."""
import numpy as np

from svt_av1_tpu.codec import segmentation as seg_mod


def test_neg_interleave_inverse():
    for mx in range(1, 9):
        for ref in range(mx):
            for x in range(mx):
                d = seg_mod.neg_interleave(x, ref, mx)
                assert 0 <= d < mx, (x, ref, mx, d)
                assert seg_mod.neg_deinterleave(d, ref, mx) == x, \
                    (x, ref, mx, d)


def test_params_header_roundtrip():
    from svt_av1_tpu.utils.bitio import BitWriter, BitReader
    seg = seg_mod.alt_q_params([-12, -4, 0, 4, 12])
    w = BitWriter()
    seg_mod.write_params(w, seg)
    w.f(1, 1)  # sentinel
    w.trailing_bits()
    r = BitReader(w.data())
    got = seg_mod.read_params(r)
    assert got is not None and got.enabled
    assert got.feature_enabled == seg.feature_enabled
    assert got.feature_data == seg.feature_data
    assert r.f(1) == 1


def test_segment_aq_roundtrip():
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder
    rng = np.random.default_rng(6)
    h, w = 128, 192
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(100 + 60 * np.sin(xx / 31.0) + 30 * np.cos(yy / 23.0),
                0, 255).astype(np.uint8)
    y[:64, :64] = rng.integers(0, 256, (64, 64))
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 135, np.uint8)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        enc_mode=8, enable_adaptive_quantization=2)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    pkt = enc.get_packet()
    out = Decoder().decode_temporal_unit(pkt.data)[0]
    for p in ("y", "u", "v"):
        assert np.array_equal(out[p], pkt.recon[p]), p
    qs = {d.qindex for d in out["decisions"].values()}
    assert len(qs) > 1, "segment AQ should produce multiple qindexes"
