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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_gop_inter_matches_local():
    """The sharded inter step (vmap of the SAME p1/p2 bodies) must be
    bit-identical per stream to gop_fast.run_inter_frame."""
    from svt_av1_tpu.codec import mv_pred
    from svt_av1_tpu.pipeline import gop_fast as gf

    h = w = 64
    rng = np.random.default_rng(3)
    base = rng.integers(20, 235, (h, w + 64)).astype(np.uint8)
    mesh = ms.make_mesh(8)
    srcs, refsl, qs = [], [], []
    for s in range(8):
        ref_y = base[:, s * 2:s * 2 + w].copy()
        src_y = base[:, s * 2 + 1:s * 2 + 1 + w].copy()
        u = np.full((h // 2, w // 2), 100 + s, np.uint8)
        refsl.append({mv_pred.LAST_FRAME:
                      dict(y=ref_y, u=u.copy(), v=u.copy())})
        srcs.append(np.concatenate(
            [src_y, np.concatenate([u, u], axis=1)], axis=0))
        qs.append(100 + 10 * s)
    from svt_av1_tpu.pipeline import intra_encoder as ie2
    modes = ie2.MODES[:4]
    pends = ms.run_inter_frames_sharded(srcs, refsl, qs, mesh,
                                        modes=modes)
    for s in (0, 5):
        pend1 = gf.run_inter_frame(srcs[s], refsl[s], qs[s], h, w,
                                   modes)
        d_sh, rec_sh, hdr_sh = gf.collect_inter_frame(pends[s])
        d_lo, rec_lo, hdr_lo = gf.collect_inter_frame(pend1)
        for pl in ("y", "u", "v"):
            assert np.array_equal(np.asarray(rec_sh[pl]),
                                  np.asarray(rec_lo[pl])), (s, pl)
        assert d_sh.keys() == d_lo.keys()
        for k in d_sh:
            assert d_sh[k].is_inter == d_lo[k].is_inter
            assert d_sh[k].mv == d_lo[k].mv
            assert np.array_equal(d_sh[k].qcoeff_y, d_lo[k].qcoeff_y)
        assert hdr_sh["dlf_levels"] == hdr_lo["dlf_levels"]
