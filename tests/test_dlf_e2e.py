"""E2E with deblocking enabled: stream round-trips and recon matches."""
import numpy as np

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec.decoder import Decoder

from test_e2e_intra import psnr, synth_frame


def test_intra_with_dlf():
    w, h = 64, 64
    y, u, v = synth_frame(w, h, seed=3)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=45,
                        enable_dlf_flag=True)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    pkt = enc.get_packet()
    dec = Decoder()
    rec = dec.decode_temporal_unit(pkt.data)[0]
    assert np.array_equal(rec["y"], pkt.recon["y"])
    assert np.array_equal(rec["u"], pkt.recon["u"])
    assert np.array_equal(rec["v"], pkt.recon["v"])
    assert psnr(rec["y"], y) > 24.0


def test_dlf_level_search_roundtrip():
    """enc_mode<=8 searches per-plane levels (dlf_process.c:106-131
    analog); levels land in the header and round-trip bit-exactly."""
    w, h = 128, 96
    y, u, v = synth_frame(w, h, seed=11)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=45,
                        enc_mode=5, enable_dlf_flag=True)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    pkt = enc.get_packet()
    rec = Decoder().decode_temporal_unit(pkt.data)[0]
    for p in ("y", "u", "v"):
        assert np.array_equal(rec[p], pkt.recon[p]), p


def test_dlf_search_not_worse_than_heuristic():
    """Searched levels reach at most the heuristic level's SSE on the
    same recon (search includes the heuristic's neighborhood)."""
    import types
    from svt_av1_tpu.pipeline import dlf_stage
    from svt_av1_tpu.ops import dlf as dlf_ops

    w, h = 128, 96
    y, u, v = synth_frame(w, h, seed=12)
    rng = np.random.default_rng(3)
    rec = dict(
        y=np.clip(y.astype(np.int32) + rng.integers(-9, 10, y.shape),
                  0, 255).astype(np.uint8),
        u=u.copy(), v=v.copy())
    src_d = dict(y=y, u=u, v=v)
    fp = types.SimpleNamespace(base_q_idx=200, sharpness=0,
                               filter_level=(0, 0),
                               filter_level_uv=(0, 0))
    out = dlf_stage.search_and_apply(src_d, rec, fp, bd=8)
    sse_search = float(((out["y"].astype(np.int64) - y) ** 2).sum())

    d = dlf_stage.default_filter_level(200)
    f = np.asarray(dlf_ops.loop_filter_plane_uniform(
        rec["y"].astype(np.int32), 16, d, 0, 14, 8)).astype(np.uint8)
    sse_heur = float(((f.astype(np.int64) - y) ** 2).sum())
    assert sse_search <= sse_heur
