"""Hierarchical ME finds planted global and local motion."""
import numpy as np

from svt_av1_tpu.pipeline.me import hierarchical_me


def test_hme_finds_global_shift():
    rng = np.random.default_rng(0)
    h, w = 128, 128
    big = rng.integers(0, 256, (h + 64, w + 64)).astype(np.uint8)
    # smooth it so matching is well-posed at coarse levels
    big = (big.astype(np.int32) + np.roll(big, 1, 0) + np.roll(big, 1, 1)
           + np.roll(big, (1, 1), (0, 1))) // 4
    dy, dx = 6, -9
    ref = big[32:32 + h, 32:32 + w].astype(np.uint8)
    src = big[32 + dy:32 + dy + h, 32 + dx:32 + dx + w].astype(np.uint8)
    mv_y, mv_x, ssd = hierarchical_me(src, ref)
    # src[p] == ref[p + mv] => mv == (dy, dx)
    interior = (slice(1, -1), slice(1, -1))
    assert np.median(mv_y[interior]) == dy
    assert np.median(mv_x[interior]) == dx
    assert (ssd[interior] == 0).mean() > 0.8


def test_hme_zero_motion():
    rng = np.random.default_rng(1)
    f = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    mv_y, mv_x, ssd = hierarchical_me(f, f)
    assert np.all(mv_y == 0) and np.all(mv_x == 0)
    assert np.all(ssd == 0)


def test_hme_long_range_pan():
    """1/8-res coarse level (pre-HME role) reaches motion far beyond
    the old +-(4*rad2+rad0) range."""
    import numpy as np
    from svt_av1_tpu.pipeline.me import hierarchical_me
    h, w = 192, 256
    yy, xx = np.mgrid[0:h, 0:w]
    ref = np.clip(120 + 60 * np.sin(xx / 23.0) + 50 * np.cos(yy / 19.0)
                  + 30 * np.sin((xx * yy) / 3000.0), 0,
                  255).astype(np.uint8)
    src = np.roll(np.roll(ref, 40, axis=0), 72, axis=1)
    my, mx, _ = hierarchical_me(src, ref)
    inner = (slice(4, None), slice(6, None))
    hits = ((my[inner] == -40) & (mx[inner] == -72)).mean()
    assert hits > 0.7, hits
