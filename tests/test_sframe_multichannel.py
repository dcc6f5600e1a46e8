"""S_FRAME switch frames, multi-channel CLI, and on-the-fly
reconfiguration (Switch-Frame appendix / app_main.c channels /
resource_coordination update_rate_info roles)."""
import numpy as np

from svt_av1_tpu.api.config import EncoderConfig
from svt_av1_tpu.api.encoder import Encoder
from svt_av1_tpu.codec import obu
from svt_av1_tpu.codec.decoder import Decoder


def _frames(n, h=64, w=96):
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for t in range(n):
        y = np.clip(120 + 50 * np.sin(xx / 11.0 + t * 0.3)
                    + 30 * np.cos(yy / 9.0), 0, 255).astype(np.uint8)
        out.append(y)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 130, np.uint8)
    return out, u, v


def test_sframe_roundtrip(monkeypatch):
    types = []
    orig = obu.read_frame_header

    def spy(r, sp, **kw):
        fp = orig(r, sp, **kw)
        types.append(fp.frame_type)
        return fp

    monkeypatch.setattr(obu, "read_frame_header", spy)
    ys, u, v = _frames(5)
    cfg = EncoderConfig(source_width=96, source_height=64, qp=40,
                        enc_mode=10, intra_period_length=16,
                        sframe_dist=2)
    enc = Encoder(cfg)
    for y in ys:
        enc.send_picture(y, u, v)
    enc.send_eos()
    dec = Decoder()
    while True:
        p = enc.get_packet()
        if p is None:
            break
        out = dec.decode_temporal_unit(p.data)[0]
        for pl in ("y", "u", "v"):
            assert np.array_equal(out[pl], p.recon[pl]), (p.pts, pl)
    assert obu.S_FRAME in types, types
    # S frames refresh every DPB slot
    assert all(s is not None for s in dec.slots)


def test_reconfigure_rate_and_qp():
    ys, u, v = _frames(3)
    cfg = EncoderConfig(source_width=96, source_height=64, qp=30,
                        rate_control_mode=2, target_bit_rate=500_000,
                        intra_period_length=16)
    enc = Encoder(cfg)
    enc.send_picture(ys[0], u, v)
    old_target = enc._rc.target_bits_per_frame
    enc.reconfigure(target_bit_rate=100_000)
    assert enc._rc.target_bits_per_frame < old_target
    enc.reconfigure(qp=50)
    assert enc.cfg.qp == 50
    enc.send_picture(ys[1], u, v, eos=True)
    dec = Decoder()
    while True:
        p = enc.get_packet()
        if p is None:
            break
        out = dec.decode_temporal_unit(p.data)[0]
        assert np.array_equal(out["y"], p.recon["y"])


def test_multichannel_cli(tmp_path):
    from svt_av1_tpu.app import cli
    ys, u, v = _frames(3)
    for name in ("a", "b"):
        path = tmp_path / f"{name}.y4m"
        with open(path, "wb") as f:
            f.write(b"YUV4MPEG2 W96 H64 F30:1 Ip A1:1 C420\n")
            for y in ys:
                f.write(b"FRAME\n" + y.tobytes() + u.tobytes()
                        + v.tobytes())
    rc = cli.main(["-i", str(tmp_path / "a.y4m"),
                   "-i", str(tmp_path / "b.y4m"),
                   "-b", str(tmp_path / "a.ivf"),
                   "-b", str(tmp_path / "b.ivf"),
                   "--crf", "40", "--progress", "0"])
    assert rc == 0
    from svt_av1_tpu.utils.ivf import read_ivf
    for name in ("a", "b"):
        hdr, frames = read_ivf(str(tmp_path / f"{name}.ivf"))
        assert len(frames) == 3
