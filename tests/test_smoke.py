"""Smoke tier (<5 min): the checks that must pass before ANY snapshot.

Covers the two driver captures (multichip dryrun arity/compile, bench
entry construction) plus one tiny encode->decode round trip per frame
type.  Run via ``./run_tests.sh --smoke``.
"""
import numpy as np
import pytest


def test_dryrun_multichip_small():
    """The driver's dryrun on a 2-device mesh: catches p1/p2 output
    arity drift between the single-chip and sharded paths (the round-3
    regression class)."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(2)


def test_entry_compiles():
    import jax

    import __graft_entry__
    fn, args = __graft_entry__.entry()
    jax.jit(fn).lower(*args)  # compile-check only


def _tiny_frames(n, h=64, w=64):
    rng = np.random.default_rng(0)
    base = rng.integers(30, 220, (h, w + 2 * n)).astype(np.uint8)
    out = []
    for t in range(n):
        y = base[:, t * 2:t * 2 + w].copy()
        u = np.full((h // 2, w // 2), 100 + t, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        out.append((y, u, v))
    return out


def test_tiny_gop_roundtrip():
    """Key + hierarchical inter frames through the full API, decoded
    bit-exactly — the fast-GOP path end to end."""
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder

    frames = _tiny_frames(4)
    cfg = EncoderConfig(source_width=64, source_height=64, qp=40,
                        enc_mode=8, intra_period_length=15,
                        hierarchical_levels=2, enable_tf=0)
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
    disp = [p for p in pkts if p.displayed]
    assert len(disp) == 4
    dec = Decoder()
    decoded = []
    for p in pkts:
        decoded.extend(dec.decode_temporal_unit(p.data))
    assert len(decoded) == 4
    for i, (p, rec) in enumerate(zip(disp, decoded)):
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)


def test_bench_configs_construct():
    """bench.py's encoder configs stay constructible (a bench that
    crashes at config time is a silent driver timeout)."""
    import bench
    bench._gop_cfg()
    frames = bench.synth_frames(2)
    assert frames[0][0].shape == (bench.H, bench.W)
