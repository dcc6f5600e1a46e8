"""Sharded multi-stream encode matches the single-device batch path."""
import jax
import numpy as np
import pytest

from svt_av1_tpu.parallel import multistream as ms
from svt_av1_tpu.pipeline import intra_encoder as ie

from test_e2e_intra import synth_frame


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_local():
    frames = [synth_frame(64, 64, seed=i) for i in range(8)]
    qindex = 140
    mesh = ms.make_mesh(8)
    sharded = ms.encode_intra_frames_sharded(frames, qindex, mesh)
    local = ie.encode_intra_frames(
        [(np.asarray(a), np.asarray(b), np.asarray(c))
         for a, b, c in frames], qindex)
    for (d1, r1), (d2, r2) in zip(sharded, local):
        assert np.array_equal(r1["y"], r2["y"])
        for k in d1:
            assert d1[k].y_mode == d2[k].y_mode
            assert np.array_equal(d1[k].qcoeff_y, d2[k].qcoeff_y)
