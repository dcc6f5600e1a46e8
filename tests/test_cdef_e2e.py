"""In-loop CDEF: signaling round-trip, encoder/decoder recon equality,
and quality gain on ringing-prone content."""
import numpy as np
import pytest

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec.decoder import Decoder


def _edges(h=96, w=128, seed=4):
    """Hard diagonal edges at low bitrate -> ringing CDEF can clean."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.where((xx + yy) % 48 < 24, 60, 200).astype(np.uint8)
    y = np.clip(y.astype(np.int32) + rng.integers(-6, 7, (h, w)),
                0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    return y, u, v


def _run(cdef_level, qp=50):
    y, u, v = _edges()
    cfg = EncoderConfig(source_width=128, source_height=96, qp=qp,
                        cdef_level=cdef_level)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    pkt = enc.get_packet()
    return (y, u, v), pkt


def test_cdef_decode_matches_recon():
    _, pkt = _run(cdef_level=1)
    dec = Decoder()
    rec = dec.decode_temporal_unit(pkt.data)[0]
    for p in ("y", "u", "v"):
        assert np.array_equal(rec[p], pkt.recon[p]), p


def test_cdef_improves_quality():
    (y, _, _), pkt_off = _run(cdef_level=0)
    _, pkt_on = _run(cdef_level=1)

    def psnr(p):
        mse = np.mean((p.recon["y"].astype(np.float64) - y) ** 2)
        return 10 * np.log10(255 ** 2 / mse)

    assert psnr(pkt_on) >= psnr(pkt_off) - 1e-9, \
        (psnr(pkt_on), psnr(pkt_off))


def test_cdef_gop_decode():
    """CDEF'd frames feed the DPB: P frames predict from filtered refs."""
    rng = np.random.default_rng(9)
    cfg = EncoderConfig(source_width=64, source_height=64, qp=45,
                        cdef_level=1, intra_period_length=-1)
    enc = Encoder(cfg)
    dec = Decoder()
    base = rng.integers(0, 256, (64, 80)).astype(np.uint8)
    pkts = []
    for i in range(3):
        y = base[:, 2 * i:2 * i + 64].copy()
        u = np.full((32, 32), 100, np.uint8)
        v = np.full((32, 32), 120, np.uint8)
        # TF lookahead (enable_tf default) adds latency: collect
        # packets as they become ready, drain after EOS
        enc.send_picture(y, u, v, eos=(i == 2))
        p = enc.get_packet()
        if p is not None:
            pkts.append(p)
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    assert len(pkts) == 3
    for i, pkt in enumerate(pkts):
        rec = dec.decode_temporal_unit(pkt.data)[0]
        for p in ("y", "u", "v"):
            assert np.array_equal(rec[p], pkt.recon[p]), (i, p)


def test_cdef_header_roundtrip():
    from svt_av1_tpu.codec import obu
    from svt_av1_tpu.utils.bitio import BitReader
    _, pkt = _run(cdef_level=1)
    for t, payload in obu.parse_obus(pkt.data):
        if t == obu.OBU_SEQUENCE_HEADER:
            sp = obu.read_sequence_header(payload)
            assert sp.enable_cdef
        elif t == obu.OBU_FRAME:
            fp = obu.read_frame_header(BitReader(payload), sp)
            assert 3 <= fp.cdef_damping <= 6
            assert all(0 <= s <= 15 for s in fp.cdef_strengths)
