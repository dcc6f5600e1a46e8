"""One-pass CBR/VBR rate control (rc_onepass.py).

Behavioral reference: rc_process.c av1_rc_regulate_q (:1931), buffer
model (:2328), rate-correction feedback (:2259-2326).  The done
criterion from the round-2 review: CBR holds the target bitrate on a
long clip in the hierarchical-GOP mode.
"""
import numpy as np
import pytest

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.pipeline.rc_onepass import OnePassRC


def _rc(target=300_000, fps=30.0, cbr=True, w=64, h=64):
    cfg = EncoderConfig(source_width=w, source_height=h,
                        rate_control_mode=2 if cbr else 1,
                        target_bit_rate=target)
    return OnePassRC.create(cfg, fps, w, h)


def test_regulate_q_monotone_in_target():
    rc = _rc()
    rc.rcf = [0.05, 0.05, 0.05]   # mid-range correction factor
    qs = [rc.regulate_q(t, False, 1, rc.best_q, rc.worst_q)
          for t in (4_000.0, 16_000.0, 64_000.0, 256_000.0)]
    assert qs == sorted(qs, reverse=True), qs
    assert qs[0] > qs[-1]


def test_postencode_rcf_feedback():
    """Overshoot vs the model's projection raises the correction factor
    (projected size grows), undershoot lowers it
    (rc_process.c:2259-2326)."""
    from svt_av1_tpu.pipeline.rate_control import bits_per_mb
    rc = _rc()
    q = rc.pick_q(False, 1)
    rcf0 = rc.rcf[0]
    projected = bits_per_mb(False, q, rcf0, rc.bd, rc.cbr) * rc.mbs
    rc.postencode(q, projected * 3.0, False, 1)
    assert rc.rcf[0] > rcf0
    rc2 = _rc()
    q = rc2.pick_q(False, 1)
    rcf0 = rc2.rcf[0]
    projected = bits_per_mb(False, q, rcf0, rc2.bd, rc2.cbr) * rc2.mbs
    rc2.postencode(q, projected / 3.0, False, 1)
    assert rc2.rcf[0] < rcf0


def test_buffer_model_drains_and_fills():
    rc = _rc()
    lvl0 = rc.buffer_level
    rc.postencode(100, rc.avg_frame_bandwidth * 4, False, 0)
    assert rc.buffer_level < lvl0          # overshoot drains
    lvl1 = rc.buffer_level
    rc.postencode(200, rc.avg_frame_bandwidth / 4, False, 0)
    assert rc.buffer_level > lvl1          # undershoot refills
    for _ in range(100):
        rc.postencode(200, 0.0, False, 0)
    assert rc.buffer_level <= rc.maximum_buffer_size


def _moving_clip(n, w=64, h=64, seed=3, amp=24):
    """Moving sinusoid + temporal noise.  amp=24 keeps real residual
    entropy at mid q so a CBR/VBR target is actually reachable (at low
    amplitude every inter frame collapses to all-skip and no q can
    spend the budget)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        y = (110 + 60 * np.sin((xx + 0.8 * t) / 9.0)
             + 45 * np.cos((yy + 0.3 * t) / 12.0)
             + rng.integers(-amp, amp + 1, (h, w)))
        u = np.clip(120 + 30 * np.sin(xx[::2, ::2] / 14.0 + 0.05 * t),
                    0, 255).astype(np.uint8)
        v = np.full((h // 2, w // 2), 128, np.uint8)
        out.append((np.clip(y, 0, 255).astype(np.uint8), u, v))
    return out


def _encode_collect(cfg, frames):
    enc = Encoder(cfg)
    pkts = []
    for i, (y, u, v) in enumerate(frames):
        enc.send_picture(y, u, v, eos=(i == len(frames) - 1))
        p = enc.get_packet()
        if p is not None:
            pkts.append(p)
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    return pkts


@pytest.mark.parametrize("mode", [2, 1])
def test_onepass_gop_holds_target(mode):
    """CBR (and reactive VBR) over a hierarchical GOP holds the target
    bitrate on a 120-frame clip (the reference's one-pass regulate_q +
    buffer-model contract).  VBR is judged over the whole clip; CBR —
    which like the reference ramps q down from worst_quality over the
    first ~2s — is judged at its sustained (second-half) rate, with a
    loose whole-clip sanity bound."""
    w = h = 64
    fps = 30.0
    target = 120_000
    n = 120
    frames = _moving_clip(n, w, h)
    # enc_mode 10: the RC contract is what's tested — a slimmer MD
    # decouples the rate assertion from quality-preset tool churn
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        rate_control_mode=mode, target_bit_rate=target,
                        intra_period_length=31, hierarchical_levels=2,
                        enc_mode=10, enable_tf=0,
                        frame_rate_numerator=30)
    pkts = _encode_collect(cfg, frames)
    shown = sum(1 for p in pkts if getattr(p, "displayed", True))
    assert shown >= n - 1
    total = sum(len(p.data) * 8 for p in pkts)
    measured = total * fps / n
    tail = sum(len(p.data) * 8 for p in pkts[len(pkts) // 2:])
    sustained = 2 * tail * fps / n
    if mode == 1:
        assert 0.90 * target < measured < 1.10 * target, (measured, target)
    else:
        assert 0.85 * target < sustained < 1.15 * target, (sustained,
                                                           target)
        assert measured > 0.45 * target, (measured, target)
