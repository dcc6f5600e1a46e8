"""API/config tests (analog of reference SvtAv1EncApiTest /
SvtAv1EncParamsTest): validation, parse_parameter, header API."""
import numpy as np
import pytest

from svt_av1_tpu.api.config import ConfigError, EncoderConfig, parse_parameter
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec import obu


def test_validation_rejects_bad_params():
    for kwargs in [dict(source_width=0, source_height=64),
                   dict(source_width=64, source_height=0),
                   dict(source_width=63, source_height=64),
                   dict(source_width=64, source_height=64, qp=99),
                   dict(source_width=64, source_height=64, enc_mode=99),
                   dict(source_width=64, source_height=64,
                        encoder_bit_depth=12),
                   dict(source_width=64, source_height=64,
                        rate_control_mode=7)]:
        with pytest.raises(ConfigError):
            EncoderConfig(**kwargs).validate()


def test_parse_parameter_names():
    cfg = EncoderConfig(source_width=64, source_height=64)
    parse_parameter(cfg, "preset", "8")
    parse_parameter(cfg, "crf", "30")
    parse_parameter(cfg, "rc", "2")
    parse_parameter(cfg, "tbr", "500000")
    parse_parameter(cfg, "enable-dlf", "1")
    assert cfg.enc_mode == 8 and cfg.qp == 30
    assert cfg.rate_control_mode == 2 and cfg.target_bit_rate == 500000
    assert cfg.enable_dlf_flag is True
    with pytest.raises(ConfigError):
        parse_parameter(cfg, "no-such-option", "1")
    with pytest.raises(ConfigError):
        parse_parameter(cfg, "crf", "notanumber")


def test_stream_header_standalone():
    cfg = EncoderConfig(source_width=64, source_height=64)
    hdr = Encoder(cfg).stream_header()
    obus = obu.parse_obus(hdr)
    assert obus[0][0] == obu.OBU_SEQUENCE_HEADER
    sp = obu.read_sequence_header(obus[0][1])
    assert sp.width == 64 and sp.height == 64


def test_level_selection():
    assert obu.choose_level(352, 288) == 0      # 2.0
    assert obu.choose_level(1920, 1080) == 8    # 4.0
    assert obu.choose_level(3840, 2160) == 12   # 5.0


def test_scene_cut_inserts_key_frame():
    """Picture-decision analog: a histogram scene change forces a key
    frame inside an inter GOP, and the stream still decodes exactly."""
    import numpy as np
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder
    rng = np.random.default_rng(0)
    h, w = 96, 128
    s1 = np.clip(80 + rng.normal(0, 5, (h, w)), 0, 255).astype(np.uint8)
    s2 = np.clip(190 + rng.normal(0, 5, (h, w)), 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 120, np.uint8)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=45,
                        intra_period_length=-1, enc_mode=10)
    enc = Encoder(cfg)
    dec = Decoder()
    pkts = []
    for i, y in enumerate([s1, s1, s1, s2, s2]):
        # TF lookahead (enable_tf default) adds latency: packets may
        # lag sends, so collect as they become ready + drain at EOS
        enc.send_picture(y, u, v, eos=(i == 4))
        p = enc.get_packet()
        if p is not None:
            pkts.append(p)
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    types = []
    for i, p in enumerate(pkts):
        types.append(p.frame_type)
        rec = dec.decode_temporal_unit(p.data)[0]
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)
    assert types == [0, 1, 1, 0, 1]


def test_avif_still_picture_mode():
    """AVIF mode: reduced_still_picture_header sequence + single key
    frame; a second send_picture is rejected (enc_handle.c:5367)."""
    import numpy as np
    import pytest
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (64, 80)).astype(np.uint8)
    u = rng.integers(0, 256, (32, 40)).astype(np.uint8)
    v = rng.integers(0, 256, (32, 40)).astype(np.uint8)
    cfg = EncoderConfig(source_width=80, source_height=64, qp=40,
                        avif=True)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    pkt = enc.get_packet()
    dec = Decoder()
    rec = dec.decode_temporal_unit(pkt.data)[0]
    assert dec.sp.still_picture and dec.sp.reduced_still_picture_header
    for p in ("y", "u", "v"):
        assert np.array_equal(rec[p], pkt.recon[p]), p
    with pytest.raises(ValueError):
        enc.send_picture(y, u, v)


def test_hdr_metadata_obus():
    """CLL + MDCV metadata OBUs ride the first TU and parse back."""
    import numpy as np
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec import obu
    from svt_av1_tpu.codec.decoder import Decoder
    y = np.full((64, 64), 128, np.uint8)
    u = np.full((32, 32), 100, np.uint8)
    v = np.full((32, 32), 150, np.uint8)
    cfg = EncoderConfig(
        source_width=64, source_height=64, qp=40,
        content_light="1000,400",
        mastering_display="G(0.2649,0.6900)B(0.1500,0.0600)"
                          "R(0.6800,0.3200)WP(0.3127,0.3290)"
                          "L(1000.0,0.0001)")
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    pkt = enc.get_packet()
    dec = Decoder()
    dec.decode_temporal_unit(pkt.data)
    cll = dec.metadata[obu.METADATA_TYPE_HDR_CLL]
    assert cll == dict(max_cll=1000, max_fall=400)
    mdcv = dec.metadata[obu.METADATA_TYPE_HDR_MDCV]
    assert abs(mdcv["white_point"][0] - 0.3127) < 1e-4
    assert abs(mdcv["max_luma"] - 1000.0) < 0.01


def test_get_stream_info():
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    import numpy as np
    cfg = EncoderConfig(source_width=64, source_height=64, qp=40,
                        pass_=1)
    enc = Encoder(cfg)
    y = np.full((64, 64), 128, np.uint8)
    u = np.full((32, 32), 100, np.uint8)
    v = np.full((32, 32), 150, np.uint8)
    enc.send_picture(y, u, v, eos=True)
    enc.get_packet()
    assert enc.get_stream_info(0) == enc.get_stats()
    import pytest
    with pytest.raises(ValueError):
        enc.get_stream_info(3)


def test_send_picture_validates_plane_geometry():
    """Wrong-size or wrong-dtype input raises a clear error instead of
    a cryptic device shape failure (the reference contains it by
    zero-filling, enc_handle.c:5434-5446; we surface it)."""
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    import numpy as np
    import pytest
    cfg = EncoderConfig(source_width=64, source_height=64, qp=40)
    enc = Encoder(cfg)
    y = np.full((64, 64), 128, np.uint8)
    u = np.full((32, 32), 100, np.uint8)
    v = np.full((32, 32), 150, np.uint8)
    with pytest.raises(ValueError, match="geometry"):
        enc.send_picture(y[:48], u, v)
    with pytest.raises(ValueError, match="geometry"):
        enc.send_picture(y, u[:, :16], v)
    with pytest.raises(ValueError, match="dtype"):
        enc.send_picture(y.astype(np.uint16), u, v)
    enc.send_picture(y, u, v, eos=True)   # correct input still works
    assert enc.get_packet() is not None
