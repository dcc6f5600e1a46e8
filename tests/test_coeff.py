"""Coefficient coder round-trip: encode_txb -> decode_txb over random
levels, adaptive CDFs, all coded tx sizes and classes."""
import numpy as np
import pytest

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.codec import tables as tb
from svt_av1_tpu.codec import coeff
from svt_av1_tpu.codec.cdf import FrameCDFs
from svt_av1_tpu.codec.entropy import RangeDecoder, RangeEncoder


@pytest.mark.parametrize("tx_size", [cc.TX_4X4, cc.TX_8X8, cc.TX_16X16,
                                     cc.TX_32X32, cc.TX_64X64, cc.TX_4X8,
                                     cc.TX_16X8, cc.TX_8X32, cc.TX_16X64])
@pytest.mark.parametrize("tx_type", [cc.DCT_DCT, cc.ADST_ADST, cc.IDTX,
                                     cc.V_DCT, cc.H_DCT])
def test_txb_roundtrip(tx_size, tx_type):
    # skip illegal combos (ADST > 16pt)
    w, h = int(cc.tx_size_wide[tx_size]), int(cc.tx_size_high[tx_size])
    vt, ht = cc.tx_type_1d[tx_type]
    for kind, n in ((vt, h), (ht, w)):
        if kind in (cc.TX1D_ADST, cc.TX1D_FLIPADST) and n > 16:
            pytest.skip("illegal ADST dim")
    rng = np.random.default_rng(tx_size * 16 + tx_type)
    _, kw, kh = tb.txb_dims(tx_size)[0], *tb.txb_dims(tx_size)[1:]
    blocks = []
    for trial in range(8):
        q = np.zeros((kh, kw), dtype=np.int32)
        # sparse low-freq-heavy levels incl. large (golomb) values
        n_nz = int(rng.integers(0, kh * kw // 2 + 2))
        rows = rng.integers(0, kh, n_nz)
        cols = rng.integers(0, kw, n_nz)
        vals = rng.integers(-300, 300, n_nz)
        q[rows, cols] = vals
        blocks.append(q)
    blocks.append(np.zeros((kh, kw), dtype=np.int32))  # all-zero block

    enc = RangeEncoder()
    cdfs_e = FrameCDFs(base_qindex=100)
    culs = []
    for q in blocks:
        culs.append(coeff.encode_txb(
            enc, cdfs_e, q, tx_size, tx_type, plane_type=0,
            txb_skip_ctx=0, dc_sign_ctx=0, update=True))
    data = enc.done()

    dec = RangeDecoder(data)
    cdfs_d = FrameCDFs(base_qindex=100)
    for q, cul in zip(blocks, culs):
        got, eob, cul_d = coeff.decode_txb(
            dec, cdfs_d, tx_size, plane_type=0, txb_skip_ctx=0,
            dc_sign_ctx=0, read_tx_type=lambda: tx_type, update=True)
        assert np.array_equal(got, q)
        assert cul_d == cul
