"""AV1 skip_mode: frame-level derivation, tile syntax round-trip, and
the e2e GOP win.

Behavioral reference: svt_av1_setup_skip_mode_allowed
(Source/Lib/Codec/pd_process.c:99-172), encode_skip_mode_av1
(entropy_coding.c:1183-1192), spec 5.9.22 / 5.11.11.
"""
import numpy as np
import pytest

from svt_av1_tpu.codec import obu


def test_skip_mode_refs_bidir():
    # cur hint 2, refs: LAST=0 (fwd), ALTREF=4 (bwd) -> (LAST, ALTREF)
    hints = (0, 0, 0, 0, 0, 0, 4)
    assert obu.skip_mode_refs(2, hints, 7) == (1, 7)


def test_skip_mode_refs_nearest_wins():
    # two distinct fwd and two distinct bwd: nearest each side;
    # LAST2=1 is the nearest fwd, BWDREF=3 the nearest bwd
    hints = (0, 1, 0, 0, 3, 6, 6)
    assert obu.skip_mode_refs(2, hints, 7) == (2, 5)


def test_skip_mode_refs_fwd_only():
    # no backward refs: needs two DISTINCT forward hints
    assert obu.skip_mode_refs(4, (3, 3, 3, 3, 3, 3, 3), 7) is None
    assert obu.skip_mode_refs(4, (3, 1, 3, 3, 3, 3, 3), 7) == (1, 2)


def test_skip_mode_refs_intra_like():
    # all refs at the current hint: nothing forward or backward
    assert obu.skip_mode_refs(5, (5,) * 7, 7) is None


def test_skip_mode_refs_wraparound():
    # order hints wrap at 2^bits; relative distance is signed
    hints = (126, 126, 126, 126, 3, 3, 3)
    assert obu.skip_mode_refs(1, hints, 7) == (1, 5)


def test_frame_header_roundtrip_order_hints():
    from svt_av1_tpu.utils.bitio import BitReader, BitWriter
    sp = obu.SequenceParams(width=64, height=64, enable_order_hint=True)
    fp = obu.FrameParams(frame_type=obu.INTER_FRAME, show_frame=True,
                         base_q_idx=100)
    fp.order_hint = 9
    fp.refresh_frame_flags = 0x02
    fp.ref_frame_idx = (0, 0, 0, 0, 0, 0, 1)
    fp.ref_hints = (8, 8, 8, 8, 8, 8, 12)
    fp.reference_select = True
    fp.skip_mode_present = True
    fp.primary_ref_frame = 0
    w = BitWriter()
    obu.write_frame_header_bits(w, sp, fp)
    w.trailing_bits()
    slot_hints = [8, 12, 0, 0, 0, 0, 0, 0]
    fp2 = obu.read_frame_header(BitReader(w.data()), sp,
                                ref_hints_by_slot=slot_hints)
    assert fp2.order_hint == 9
    assert fp2.skip_mode_present
    assert fp2.ref_hints == (8, 8, 8, 8, 8, 8, 12)
    assert obu.skip_mode_refs(fp2.order_hint, fp2.ref_hints,
                              sp.order_hint_bits) == (1, 7)


def _noise_clip(n, w, h, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    still = np.clip(110 + 50 * np.sin(xx / 29.0) * np.cos(yy / 31.0),
                    0, 255)
    out = []
    for _ in range(n):
        y = np.clip(still + rng.integers(-5, 6, (h, w)), 0,
                    255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 125, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        out.append((y, u, v))
    return out


def test_skip_mode_e2e_gop():
    """Noisy-static GOP: skip_mode blocks must appear, the stream must
    round-trip bit-exact, and bits must beat the skip_mode-less
    stream."""
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder

    W, H, N = 128, 128, 8
    frames = _noise_clip(N, W, H)

    def encode(disable_sm):
        cfg = EncoderConfig(source_width=W, source_height=H, qp=50,
                            enc_mode=6, intra_period_length=N - 1,
                            hierarchical_levels=2)
        enc = Encoder(cfg)
        if disable_sm:
            enc.sp.enable_order_hint = False
        for i, (y, u, v) in enumerate(frames):
            enc.send_picture(y, u, v, eos=(i == N - 1))
        pkts = []
        while True:
            p = enc.get_packet()
            if p is None:
                break
            pkts.append(p)
        return pkts

    pkts = encode(False)
    dec = Decoder()
    n_sm = 0
    bits = 0
    mism = 0
    for p in pkts:
        bits += len(p.data) * 8
        for rec in dec.decode_temporal_unit(p.data):
            ds = rec.get("decisions")
            if ds:
                n_sm += sum(int(d.skip_mode) for d in ds.values())
            if p.recon is not None and p.displayed:
                mism = max(mism, int(np.abs(
                    rec["y"].astype(np.int32)
                    - p.recon["y"].astype(np.int32)).max()))
    assert mism == 0, "skip_mode stream must decode bit-exact"
    assert n_sm > 10, f"expected skip_mode wins, got {n_sm}"

    bits_off = sum(len(p.data) * 8 for p in encode(True))
    assert bits < bits_off, (bits, bits_off)
