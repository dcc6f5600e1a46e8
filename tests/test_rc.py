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


def test_qindex_from_qstep_ratio():
    from svt_av1_tpu.pipeline.rate_control import qindex_from_qstep_ratio
    from svt_av1_tpu.ops.quant import dc_q
    cq = 140
    assert qindex_from_qstep_ratio(cq, 1.0) == cq
    qlo = qindex_from_qstep_ratio(cq, 0.5)
    assert qlo < cq
    # the returned step sits at (or just past) the target
    assert dc_q(qlo) <= dc_q(cq) * 0.5 or qlo == 0
    assert qindex_from_qstep_ratio(cq, 2.0) > cq


def test_crf_qindex_calc_shape():
    """Reference semantics (rc_process.c:781): keys/bases scale with
    sqrt(r0); leaves code at cq; non-base layers land between."""
    from svt_av1_tpu.pipeline.rate_control import crf_qindex_calc
    cq = 160
    qk, arf = crf_qindex_calc(cq, 0.2, 0, 3, True)
    assert 1 <= qk < cq
    qb, arf_b = crf_qindex_calc(cq, 0.2, 0, 3, False)
    assert 1 <= qb < cq
    # heavier referencing (smaller r0) -> lower q
    qb2, _ = crf_qindex_calc(cq, 0.05, 0, 3, False)
    assert qb2 <= qb
    # non-base interpolates toward cq, one notch per layer
    q1, _ = crf_qindex_calc(cq, 0.2, 1, 3, False, arf_q=arf_b,
                            ref_layer=0)
    q2, _ = crf_qindex_calc(cq, 0.2, 2, 3, False, arf_q=arf_b,
                            ref_layer=1)
    assert arf_b <= q1 <= q2 <= cq
    # leaves code at active_worst
    ql, _ = crf_qindex_calc(cq, 0.2, 3, 3, False, arf_q=arf_b,
                            is_leaf=True)
    assert ql == cq


def test_bits_per_mb_inversion():
    """find_qindex_by_rate inverts the monotone R(q) model
    (rc_process.c:602-676)."""
    from svt_av1_tpu.pipeline.rate_control import (bits_per_mb,
                                                   find_qindex_by_rate)
    r100 = bits_per_mb(False, 100)
    r200 = bits_per_mb(False, 200)
    assert r200 < r100            # higher q -> fewer bits
    q = find_qindex_by_rate(r100, False)
    assert abs(q - 100) <= 1
    # desired rate below the curve's min -> worst q
    assert find_qindex_by_rate(1e-9, False) == 255


def test_compute_qindex_by_rate_ratio():
    from svt_av1_tpu.pipeline.rate_control import (
        bits_per_mb, compute_qindex_by_rate_ratio)
    base = 120
    # 2x the rate -> lower qindex; projected rate ~= 2x
    q = compute_qindex_by_rate_ratio(base, 2.0, False)
    assert q < base
    assert bits_per_mb(False, q) >= 1.9 * bits_per_mb(False, base)


def test_capped_crf_bounds_rate():
    """Capped CRF (max_bit_rate, reference capped-CRF role): the cap's
    virtual buffer raises qindex until the average rate obeys the cap,
    while plain CRF at the same qp spends freely."""
    import numpy as np

    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder

    rng = np.random.default_rng(3)
    frames = []
    for t in range(12):
        y = rng.integers(0, 255, (64, 64)).astype(np.uint8)  # incompressible
        u = np.full((32, 32), 120, np.uint8)
        frames.append((y, u, u.copy()))

    def total_bits(mbr):
        cfg = EncoderConfig(source_width=64, source_height=64, qp=20,
                            enc_mode=12, intra_period_length=-1,
                            max_bit_rate=mbr)
        enc = Encoder(cfg)
        bits = 0
        for i, (y, u, v) in enumerate(frames):
            enc.send_picture(y, u, v, eos=(i == len(frames) - 1))
            p = enc.get_packet()
            if p is not None:
                bits += len(p.data) * 8
        while True:
            p = enc.get_packet()
            if p is None:
                break
            bits += len(p.data) * 8
        return bits

    free = total_bits(0)
    capped = total_bits(60000)   # 60 kbit/s at 30 fps = 2000 bits/frame
    assert capped < 0.7 * free, (free, capped)
