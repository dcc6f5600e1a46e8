"""Mask-aware deblocking: edge-length derivation, equivalence with the
uniform driver on a pure 16x16 grid, and the varpart+DLF+CDEF
composition round-trip (the quality-preset tool stack running
together, VERDICT r2 item 3)."""
import numpy as np
import pytest

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.ops import dlf


def test_edge_flens_uniform16():
    """All-16x16 non-skip grid: every 4th mi column filters at 14 (luma)
    / 6 (chroma, 8px tx), others 0."""
    n = 8
    tx = np.full((n, n), 4, np.int32)
    b = np.full((n, n), 4, np.int32)
    sk = np.zeros((n, n), bool)
    fl = np.asarray(dlf.edge_flens(tx, b, sk, True))
    assert fl[:, 0].max() == 0
    assert (fl[:, 4] == 14).all()
    assert (fl[:, 1:4] == 0).all()
    ctx = np.full((n, n), 2, np.int32)
    flc = np.asarray(dlf.edge_flens(ctx, b, sk, False))
    assert (flc[:, 2] == 6).all()
    assert (flc[:, 1] == 0).all()


def test_edge_flens_skip_rule():
    """Both-skip inter pairs filter only on prediction-block edges."""
    n = 8
    tx = np.full((n, n), 4, np.int32)
    b = np.full((n, n), 8, np.int32)    # 32x32 blocks of 16 tx units
    sk = np.ones((n, n), bool)          # all skip inter
    fl = np.asarray(dlf.edge_flens(tx, b, sk, True))
    # tx edge at col 4 is interior to the block -> suppressed
    # (skip inter => tx extent should equal block extent per
    # get_transform_size, but the rule must hold regardless)
    assert (fl[:, 4] == 0).all()
    # block edge still filters
    assert (fl[:, 0] == 0).all()        # frame edge
    fl2 = np.asarray(dlf.edge_flens(np.full((n, n), 8, np.int32),
                                    b, sk, True))
    assert (fl2[:, 0] == 0).all()


def test_masked_matches_uniform_on_16grid():
    """On the uniform 16x16 grid the masked driver must be bit-exact
    with loop_filter_plane_uniform (same spec path)."""
    rng = np.random.default_rng(7)
    h = w = 64
    plane = rng.integers(0, 255, (h, w)).astype(np.int32)
    lvl = 20
    ref = np.asarray(dlf.loop_filter_plane_uniform(plane, 16, lvl, 0,
                                                   14))
    n = h // 4
    tx = np.full((n, n), 4, np.int32)
    b = np.full((n, n), 4, np.int32)
    sk = np.zeros((n, n), bool)
    flv = dlf.edge_flens(tx, b, sk, True)
    flh = np.asarray(dlf.edge_flens(tx.T, b.T, sk.T, True)).T
    out = np.asarray(dlf.loop_filter_plane_masked(plane, flv, flh, lvl,
                                                  0, True))
    assert np.array_equal(ref, out)
    # chroma config (8px grid, flen 6)
    planec = rng.integers(0, 255, (32, 32)).astype(np.int32)
    refc = np.asarray(dlf.loop_filter_plane_uniform(planec, 8, 24, 0,
                                                    6))
    nc = 8
    txc = np.full((nc, nc), 2, np.int32)
    bc = np.full((nc, nc), 2, np.int32)
    skc = np.zeros((nc, nc), bool)
    flvc = dlf.edge_flens(txc, bc, skc, False)
    flhc = np.asarray(dlf.edge_flens(txc.T, bc.T, skc.T, False)).T
    outc = np.asarray(dlf.loop_filter_plane_masked(planec, flvc, flhc,
                                                   24, 0, False))
    assert np.array_equal(refc, outc)


def test_masked_mixed_sizes_differs_from_uniform():
    """A 32x32 tx next to 16s: its interior 16-edges must NOT filter."""
    from svt_av1_tpu.pipeline import dlf_stage
    from svt_av1_tpu.codec.syntax import BlockDecision

    h = w = 64
    decisions = {}
    # one 32x32 leaf at (0,0); rest 16x16
    decisions[(0, 0)] = BlockDecision(
        r4=0, c4=0, bsize=cc.BLOCK_32X32, y_mode=cc.DC_PRED,
        uv_mode=cc.DC_PRED, tx_type=cc.DCT_DCT,
        qcoeff_y=np.ones((32, 32), np.int32),
        qcoeff_u=np.ones((16, 16), np.int32),
        qcoeff_v=np.ones((16, 16), np.int32))
    for r4 in range(0, 16, 4):
        for c4 in range(0, 16, 4):
            if r4 < 8 and c4 < 8:
                continue
            decisions[(r4, c4)] = BlockDecision(
                r4=r4, c4=c4, bsize=cc.BLOCK_16X16, y_mode=cc.DC_PRED,
                uv_mode=cc.DC_PRED, tx_type=cc.DCT_DCT,
                qcoeff_y=np.ones((16, 16), np.int32),
                qcoeff_u=np.ones((8, 8), np.int32),
                qcoeff_v=np.ones((8, 8), np.int32))
    maps = dlf_stage.maps_from_decisions(decisions, h // 4, w // 4)
    flens = dlf_stage.flens_from_maps(maps)
    # interior vertical edge of the 32 block (col mi 4, rows mi 0..7): off
    assert (flens["y_v"][:8, 4] == 0).all()
    # the 32/16 boundary at mi col 8 filters with flen 14
    assert (flens["y_v"][:8, 8] == 14).all()
    # outside the 32 block, col 4 keeps filtering
    assert (flens["y_v"][8:, 4] == 14).all()


def test_varpart_dlf_cdef_roundtrip():
    """Quality preset (varpart) with DLF + CDEF enabled together:
    encoder recon must equal decoder output bit-exactly."""
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder

    rng = np.random.default_rng(11)
    h = w = 64
    # smooth content so varpart actually merges into 32s
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(120 + 40 * np.sin(xx / 23.0) + 30 * np.cos(yy / 19.0)
                + rng.integers(-2, 3, (h, w)), 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 136, np.uint8)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=45,
                        enc_mode=4, enable_dlf_flag=True, cdef_level=1,
                        enable_adaptive_quantization=0)
    enc = Encoder(cfg)
    assert enc._feat.varpart
    enc.send_picture(y, u, v, eos=True)
    pkt = enc.get_packet()
    dec = Decoder()
    recs = dec.decode_temporal_unit(pkt.data)
    assert len(recs) == 1
    for pl in ("y", "u", "v"):
        assert np.array_equal(recs[0][pl], pkt.recon[pl]), pl
