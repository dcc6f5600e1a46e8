"""Loop restoration: subexp primitives, LR syntax round-trip, and
in-loop E2E (encode -> decode recon equality, quality non-decrease)."""
import numpy as np
import pytest

from svt_av1_tpu.codec import lr as lr_mod
from svt_av1_tpu.codec import subexp
from svt_av1_tpu.codec.entropy import RangeDecoder, RangeEncoder


def test_subexp_roundtrip():
    rng = np.random.default_rng(0)
    cases = []
    enc = RangeEncoder()
    for _ in range(300):
        n = int(rng.integers(2, 200))
        k = int(rng.integers(1, 5))
        ref = int(rng.integers(0, n))
        v = int(rng.integers(0, n))
        subexp.write_refsubexpfin(enc, n, k, ref, v)
        cases.append((n, k, ref, v))
    dec = RangeDecoder(enc.done())
    for (n, k, ref, v) in cases:
        assert subexp.read_refsubexpfin(dec, n, k, ref) == v, (n, k, ref, v)


def test_lr_sb_syntax_roundtrip():
    from svt_av1_tpu.codec.cdf import FrameCDFs
    rng = np.random.default_rng(3)
    W, H = 192, 128
    info = lr_mod.make_lr_info(W, H)
    for plane in range(3):
        pi = info[plane]
        for ur in range(pi.rows):
            for uc in range(pi.cols):
                t = int(rng.integers(0, 3))
                u = lr_mod.RestUnitInfo(rtype=t)
                if t == lr_mod.RESTORE_WIENER:
                    t0 = 0 if plane else int(rng.integers(-5, 11))
                    u.wiener = lr_mod.WienerInfo(
                        (t0, int(rng.integers(-23, 9)),
                         int(rng.integers(-17, 47))),
                        (t0, int(rng.integers(-23, 9)),
                         int(rng.integers(-17, 47))))
                elif t == lr_mod.RESTORE_SGRPROJ:
                    ep = int(rng.integers(0, 16))
                    r0, r1 = lr_mod._sgr_r(ep)
                    xqd0 = 0 if r0 == 0 else int(rng.integers(-96, 32))
                    if r1 == 0:
                        xqd1 = int(np.clip(128 - xqd0, -32, 95))
                    else:
                        xqd1 = int(rng.integers(-32, 96))
                    u.sgrproj = lr_mod.SgrprojInfo(ep, (xqd0, xqd1))
                pi.units[ur][uc] = u
    cdfs_e = FrameCDFs(80)
    cdfs_d = FrameCDFs(80)
    enc = RangeEncoder()
    ref_e = lr_mod._RefState()
    mi_rows, mi_cols = H // 4, W // 4
    for sb_r in range(0, mi_rows, 16):
        for sb_c in range(0, mi_cols, 16):
            lr_mod.write_lr_for_sb(enc, cdfs_e, info, ref_e, sb_r, sb_c,
                                   mi_rows, mi_cols, True)
    dec = RangeDecoder(enc.done())
    out = lr_mod.make_lr_info(W, H)
    ref_d = lr_mod._RefState()
    for sb_r in range(0, mi_rows, 16):
        for sb_c in range(0, mi_cols, 16):
            lr_mod.read_lr_for_sb(dec, cdfs_d, out, ref_d, sb_r, sb_c,
                                  mi_rows, mi_cols, True)
    for plane in range(3):
        for ur in range(info[plane].rows):
            for uc in range(info[plane].cols):
                a = info[plane].units[ur][uc]
                b = out[plane].units[ur][uc]
                assert a.rtype == b.rtype, (plane, ur, uc)
                if a.rtype == lr_mod.RESTORE_WIENER:
                    assert a.wiener == b.wiener, (plane, ur, uc)
                elif a.rtype == lr_mod.RESTORE_SGRPROJ:
                    assert a.sgrproj == b.sgrproj, (plane, ur, uc)


@pytest.fixture(scope="module")
def lr_run():
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    rng = np.random.default_rng(7)
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    y = (120 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.int32)
    y = np.clip(y + rng.integers(-8, 9, (h, w)), 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 108, np.uint8)
    v = np.full((h // 2, w // 2), 135, np.uint8)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=52,
                        enable_restoration_filtering=1, enable_dlf_flag=True)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    return (y, u, v), enc.get_packet()


def test_lr_decode_matches_recon(lr_run):
    from svt_av1_tpu.codec.decoder import Decoder
    _, pkt = lr_run
    rec = Decoder().decode_temporal_unit(pkt.data)[0]
    for p in ("y", "u", "v"):
        assert np.array_equal(rec[p], pkt.recon[p]), p


def test_lr_improves_or_preserves_quality(lr_run):
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    (y, u, v), pkt_on = lr_run
    cfg = EncoderConfig(source_width=128, source_height=96, qp=52,
                        enable_dlf_flag=True)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    pkt_off = enc.get_packet()

    def mse(p):
        return np.mean((p.recon["y"].astype(np.float64) - y) ** 2)

    assert mse(pkt_on) <= mse(pkt_off) + 1e-9
