"""Whole-tile C encoder: byte-identical to the Python TileEncoder walk,
with identical final CDF state (needed for primary-ref chaining)."""
import numpy as np
import pytest

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.codec import fast_ec
from svt_av1_tpu.codec.syntax import BlockDecision, TileDecoder, TileEncoder


def _blocks(W, H, seed):
    rng = np.random.default_rng(seed)
    gh, gw = H // 16, W // 16
    blocks = {}
    for by in range(gh):
        for bx in range(gw):
            qy = np.zeros((16, 16), np.int32)
            qu = np.zeros((8, 8), np.int32)
            qv = np.zeros((8, 8), np.int32)
            kind = (by * gw + bx) % 4
            if kind == 1:
                qy[:6, :6] = rng.integers(-40, 41, (6, 6))
            elif kind == 2:
                qy[0, 0] = int(rng.integers(-200, 201))  # golomb range
                qu[:3, :3] = rng.integers(-5, 6, (3, 3))
            elif kind == 3:
                qv[:2, :2] = rng.integers(-5, 6, (2, 2))
            blocks[(by * 4, bx * 4)] = BlockDecision(
                r4=by * 4, c4=bx * 4, bsize=cc.BLOCK_16X16,
                y_mode=int(rng.integers(0, 13)),
                uv_mode=int(rng.integers(0, 4)), tx_type=cc.DCT_DCT,
                qcoeff_y=qy, qcoeff_u=qu, qcoeff_v=qv)
    return blocks


@pytest.mark.skipif(not fast_ec.available(), reason="no C compiler")
@pytest.mark.parametrize("W,H,q", [(64, 64, 80), (128, 96, 40),
                                   (176, 144, 200), (352, 288, 120)])
def test_tile_byte_identity(W, H, q):
    blocks = _blocks(W, H, seed=W + H + q)
    t_fast = TileEncoder(W, H, q)
    b_fast = t_fast.encode(blocks)
    t_ref = TileEncoder(W, H, q)
    b_ref = t_ref.encode(blocks, use_native=False)
    assert b_fast == b_ref
    for name in ("partition", "kf_y_mode", "angle_delta", "skip",
                 "uv_mode", "intra_ext_tx", "txb_skip", "dc_sign",
                 "coeff_base", "coeff_base_eob", "coeff_br"):
        assert np.array_equal(getattr(t_fast.cdfs, name),
                              getattr(t_ref.cdfs, name)), name
    # and the stream actually decodes
    out = TileDecoder(W, H, q).decode(b_fast)
    for k, d in blocks.items():
        assert np.array_equal(out[k].qcoeff_y, d.qcoeff_y), k
        assert out[k].y_mode == d.y_mode
