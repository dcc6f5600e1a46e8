"""Native EC backend must be byte-identical to the Python reference."""
import numpy as np
import pytest

from svt_av1_tpu.codec import coeff, fast_ec
from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.codec.cdf import FrameCDFs
from svt_av1_tpu.codec.entropy import RangeEncoder, update_cdf

from test_entropy import make_stream

pytestmark = pytest.mark.skipif(not fast_ec.available(),
                                reason="no C compiler / native build failed")


@pytest.mark.parametrize("seed", [0, 3])
def test_symbols_bitexact(seed):
    events = make_stream(seed, n=1500)
    py = RangeEncoder()
    nat = fast_ec.HybridEncoder()
    for kind, a, b in events:
        if kind == "sym":
            py.encode_symbol(a, b)
            nat.encode_symbol(a, b)
        elif kind == "bool":
            py.encode_bool(a, b)
            nat.encode_bool(a, b)
        else:
            py.encode_literal(a, b)
            nat.encode_literal(a, b)
    assert py.done() == nat.done()


def test_symbol_update_matches_python():
    rng = np.random.default_rng(7)
    cdf_py = np.array([20000, 12000, 3000, 0, 0], dtype=np.uint16)
    cdf_nat = cdf_py.copy()
    py = RangeEncoder()
    nat = fast_ec.HybridEncoder()
    for _ in range(500):
        s = int(rng.integers(0, 4))
        py.encode_symbol(s, cdf_py, 4)
        update_cdf(cdf_py, s, 4)
        nat.encode_symbol_update(s, cdf_nat, 4)
    assert np.array_equal(cdf_py, cdf_nat)
    assert py.done() == nat.done()


@pytest.mark.parametrize("tx_size,tx_type", [
    (cc.TX_4X4, cc.DCT_DCT), (cc.TX_16X16, cc.DCT_DCT),
    (cc.TX_16X16, cc.ADST_ADST), (cc.TX_8X8, cc.V_DCT),
    (cc.TX_32X32, cc.IDTX), (cc.TX_8X16, cc.H_ADST),
    (cc.TX_64X64, cc.DCT_DCT)])
def test_txb_bitexact(tx_size, tx_type):
    from svt_av1_tpu.codec import tables as tb
    rng = np.random.default_rng(tx_size)
    _, kw, kh = tb.txb_dims(tx_size)
    blocks = []
    for _ in range(6):
        q = np.zeros((kh, kw), dtype=np.int32)
        n = int(rng.integers(1, kh * kw // 2 + 2))
        q[rng.integers(0, kh, n), rng.integers(0, kw, n)] = \
            rng.integers(-400, 400, n)
        blocks.append(q)
    blocks.append(np.zeros((kh, kw), np.int32))

    py = RangeEncoder()
    cdfs_py = FrameCDFs(100)
    nat = fast_ec.HybridEncoder()
    cdfs_nat = FrameCDFs(100)
    for q in blocks:
        c1 = coeff.encode_txb(py, cdfs_py, q, tx_size, tx_type, 0, 2, 1,
                              update=True)
        c2 = coeff.encode_txb(nat, cdfs_nat, q, tx_size, tx_type, 0, 2, 1,
                              update=True)
        assert c1 == c2
    assert py.done() == nat.done()
    # adapted CDFs must match too
    assert np.array_equal(cdfs_py.coeff_base, cdfs_nat.coeff_base)
    assert np.array_equal(cdfs_py.coeff_br, cdfs_nat.coeff_br)
    assert np.array_equal(cdfs_py.eob_extra, cdfs_nat.eob_extra)
