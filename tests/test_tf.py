"""Temporal filter sanity: denoises toward the clean signal."""
import numpy as np

from svt_av1_tpu.ops import tf as tfilt


def test_tf_denoises():
    rng = np.random.default_rng(0)
    clean = rng.integers(60, 200, (4, 32, 32)).astype(np.float64)
    center = np.clip(clean + rng.normal(0, 6, clean.shape), 0, 255)
    preds = np.stack([np.clip(clean + rng.normal(0, 6, clean.shape), 0, 255)
                      for _ in range(4)], axis=1)
    berr = np.full((4, 4, 4), 100.0, np.float32)
    mvs = np.zeros((4, 4, 4, 2), np.float32)
    out = np.asarray(tfilt.temporal_filter(
        center.astype(np.int32), preds.astype(np.int32), berr, mvs,
        decay_factor=150.0))
    err_in = np.abs(center - clean).mean()
    err_out = np.abs(out - clean).mean()
    assert err_out < err_in * 0.7, (err_in, err_out)


def test_tf_far_frames_downweighted():
    rng = np.random.default_rng(1)
    center = rng.integers(0, 256, (2, 32, 32)).astype(np.int32)
    # one prediction identical, one totally different
    good = center.copy()
    bad = 255 - center
    preds = np.stack([good, bad], axis=1)
    berr = np.stack([np.zeros((2, 4)), np.full((2, 4), 1e6)],
                    axis=1).astype(np.float32)
    mvs = np.zeros((2, 2, 4, 2), np.float32)
    w = np.asarray(tfilt.subblock_weights(
        center, preds, berr, mvs, 1.0, 16.0))
    assert (w[:, 0] > w[:, 1] * 5).all()
