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
