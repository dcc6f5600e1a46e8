"""Committed golden-vector tests: normative kernels vs reference outputs
captured by tools/gen_golden.py.  These run WITHOUT the oracle build —
the independent conformance anchor when the reference isn't present.
The covered functions are spec-fixed; outputs must match bit-exactly.
"""
import os

import numpy as np
import pytest

import golden_defs as gd

from svt_av1_tpu.codec import constants as cc
from svt_av1_tpu.ops import intra as intra_ops
from svt_av1_tpu.ops import transforms as tf

_have = os.path.isdir(gd.GOLDEN_DIR)
pytestmark = pytest.mark.skipif(not _have, reason="tests/golden missing")


@pytest.fixture(scope="module")
def inv_vectors():
    return dict(np.load(os.path.join(gd.GOLDEN_DIR, "inv_txfm.npz")))


@pytest.fixture(scope="module")
def intra_vectors():
    return dict(np.load(os.path.join(gd.GOLDEN_DIR, "intra.npz")))


def test_inv_txfm_vs_golden(inv_vectors):
    n = 0
    for tx_size, tx_type, bd in gd.inv_txfm_cases():
        coeffs, pred = gd.inv_txfm_input(tx_size, tx_type, bd)
        ref = inv_vectors[f"s{tx_size}_t{tx_type}_b{bd}"].astype(np.int32)
        got = np.asarray(tf.inv_txfm2d_add(coeffs[None], pred[None],
                                           tx_type, tx_size, bd=bd))[0]
        assert np.array_equal(got, ref), (tx_size, tx_type, bd)
        n += 1
    assert n > 60


def test_intra_vs_golden(intra_vectors):
    for mode in sorted(gd.intra_ref_names()):
        for (w, h) in gd.INTRA_SIZES:
            above, left, corner = gd.intra_input(mode, w, h)
            ref = intra_vectors[f"m{mode}_{w}x{h}"].astype(np.int32)
            got = np.asarray(intra_ops.predict(
                mode, above[None].astype(np.int32),
                left[None].astype(np.int32),
                np.array([corner], np.int32), h, w))[0]
            assert np.array_equal(got, ref), (mode, w, h)


def test_range_coder_vs_golden():
    from svt_av1_tpu.codec import fast_ec
    from svt_av1_tpu.codec.entropy import RangeEncoder
    vec = dict(np.load(os.path.join(gd.GOLDEN_DIR, "range_coder.npz")))
    encoders = [lambda: RangeEncoder()]
    if fast_ec.available():
        encoders.append(lambda: fast_ec.HybridEncoder())
    for seed in range(4):
        ref = vec[f"seq{seed}"].tobytes()
        for mk in encoders:
            enc = mk()
            for op in gd.range_coder_ops(seed):
                if op[0] == "bool":
                    enc.encode_bool(op[1], op[2])
                else:
                    enc.encode_symbol(op[1], op[2], op[3])
            assert enc.done() == ref, (seed, mk)
