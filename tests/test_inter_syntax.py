"""Inter-frame tile syntax round-trip: is_inter / ref / mode / drl / MV /
residual coding symmetry between TileEncoder and TileDecoder."""
import numpy as np

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.codec import mv_pred
from svt_av1_tpu.codec.syntax import BlockDecision, TileDecoder, TileEncoder


def _mk_block(r4, c4, rng, is_inter, mv=(0, 0), dense=True):
    qy = np.zeros((16, 16), np.int32)
    qu = np.zeros((8, 8), np.int32)
    qv = np.zeros((8, 8), np.int32)
    if dense:
        qy[:4, :4] = rng.integers(-8, 9, (4, 4))
        qu[:2, :2] = rng.integers(-4, 5, (2, 2))
        qv[:2, :2] = rng.integers(-4, 5, (2, 2))
    return BlockDecision(
        r4=r4, c4=c4, bsize=cc.BLOCK_16X16,
        y_mode=int(rng.integers(0, 2)), uv_mode=0, tx_type=cc.DCT_DCT,
        qcoeff_y=qy, qcoeff_u=qu, qcoeff_v=qv,
        is_inter=is_inter, mv=tuple(mv), ref=mv_pred.LAST_FRAME)


def test_inter_tile_roundtrip():
    rng = np.random.default_rng(11)
    W = H = 96  # 6x6 leaf blocks
    blocks = {}
    n4 = W // 4
    for r4 in range(0, n4, 4):
        for c4 in range(0, n4, 4):
            i = (r4 // 4) * 6 + c4 // 4
            if i % 3 == 0:
                b = _mk_block(r4, c4, rng, False)          # intra
            elif i % 3 == 1:
                b = _mk_block(r4, c4, rng, True, (0, 0))   # zero mv
            else:
                mv = (int(rng.integers(-32, 33)) * 2,
                      int(rng.integers(-32, 33)) * 2)
                b = _mk_block(r4, c4, rng, True, mv,
                              dense=(i % 2 == 0))
            blocks[(r4, c4)] = b
    enc = TileEncoder(W, H, 80, frame_is_intra=False)
    data = enc.encode(blocks, leaf_size=16)
    dec = TileDecoder(W, H, 80, frame_is_intra=False)
    out = dec.decode(data)
    assert set(out.keys()) == set(blocks.keys())
    for k, b in blocks.items():
        o = out[k]
        assert o.is_inter == b.is_inter, k
        if b.is_inter:
            assert o.mv == b.mv, (k, o.mv, b.mv)
            assert o.ref == b.ref
        else:
            assert o.y_mode == b.y_mode
        assert np.array_equal(o.qcoeff_y, b.qcoeff_y), k
        assert np.array_equal(o.qcoeff_u, b.qcoeff_u)
        assert np.array_equal(o.qcoeff_v, b.qcoeff_v)
    # CDF state identical after symmetric adaptation
    assert np.array_equal(enc.cdfs.newmv, dec.cdfs.newmv)
    assert np.array_equal(enc.cdfs.intra_inter, dec.cdfs.intra_inter)
    assert np.array_equal(enc.nmv.joints, dec.nmv.joints)


def test_inter_tile_all_skip_zero_mv():
    """A pure 'steady scene' frame: every block inter, zero MV, skip."""
    rng = np.random.default_rng(2)
    W = H = 64
    blocks = {}
    for r4 in range(0, 16, 4):
        for c4 in range(0, 16, 4):
            blocks[(r4, c4)] = _mk_block(r4, c4, rng, True, (0, 0),
                                         dense=False)
    enc = TileEncoder(W, H, 60, frame_is_intra=False)
    data = enc.encode(blocks, leaf_size=16)
    assert len(data) < 40, f"skip frame should be tiny, got {len(data)}B"
    dec = TileDecoder(W, H, 60, frame_is_intra=False)
    out = dec.decode(data)
    for k in blocks:
        assert out[k].is_inter and out[k].mv == (0, 0) and out[k].skip


def test_inter_tile_newmv_chain():
    """MV prediction chains: each block offsets from its neighbor."""
    rng = np.random.default_rng(5)
    W = H = 64
    blocks = {}
    mv = (0, 0)
    for r4 in range(0, 16, 4):
        for c4 in range(0, 16, 4):
            mv = (mv[0] + 4, mv[1] - 2)
            blocks[(r4, c4)] = _mk_block(r4, c4, rng, True, mv)
    enc = TileEncoder(W, H, 80, frame_is_intra=False)
    data = enc.encode(blocks, leaf_size=16)
    out = TileDecoder(W, H, 80, frame_is_intra=False).decode(data)
    for k, b in blocks.items():
        assert out[k].mv == b.mv, (k, out[k].mv, b.mv)
