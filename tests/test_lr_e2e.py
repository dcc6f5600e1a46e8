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


def test_wiener_solver_deblurs():
    """The separable Wiener solve must beat RESTORE_NONE on blurred
    content (it should approximately invert a [1,2,1]/4 blur)."""
    from svt_av1_tpu.pipeline import lr_stage
    rng = np.random.default_rng(0)
    h, w = 128, 128
    yy, xx = np.mgrid[0:h, 0:w]
    src = np.clip(120 + 80 * np.sin(xx / 5.0) + 40 * np.cos(yy / 3.0)
                  + rng.normal(0, 2, (h, w)), 0, 255).astype(np.int32)
    f = np.array([1., 2., 1.]) / 4
    d = src.astype(np.float64)
    d = np.apply_along_axis(
        lambda r: np.convolve(np.pad(r, 1, mode="edge"), f, "valid"), 1, d)
    d = np.apply_along_axis(
        lambda c: np.convolve(np.pad(c, 1, mode="edge"), f, "valid"), 0, d)
    dgd = np.clip(np.round(d), 0, 255).astype(np.int32)
    wf = lr_stage._solve_wiener(dgd, src, 0, 0, h, w, chroma=False)
    assert wf is not None
    wi = lr_mod.WienerInfo(wf[0], wf[1])
    u = lr_mod.RestUnitInfo(rtype=lr_mod.RESTORE_WIENER, wiener=wi)
    g8 = dgd.astype(np.uint8)
    bounds = lr_stage.save_boundaries(
        {"y": g8, "u": g8[:64, :64], "v": g8[:64, :64]})
    out = dgd.copy()
    lr_stage._filter_unit(dgd, bounds["y"], u, 0, 0, h, 0, w, out, 8)
    sse0 = float(((dgd - src) ** 2).sum())
    sse1 = float(((out - src) ** 2).sum())
    assert sse1 < sse0 * 0.85, (sse0, sse1)
