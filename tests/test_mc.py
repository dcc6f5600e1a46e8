"""Motion compensation: integer copies, subpel phases, edge replication."""
import numpy as np

from svt_av1_tpu.ops import mc


def _ref(h=64, w=64, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w)).astype(
        np.int32)


def test_integer_mv_is_copy():
    ref = _ref()
    for (dy, dx) in ((0, 0), (8, 0), (-16, 24), (40, -8)):
        got = mc.mc_block_np(ref, 24, 24, (dy, dx), 16)
        want = ref[24 + dy // 8:40 + dy // 8, 24 + dx // 8:40 + dx // 8]
        assert np.array_equal(got, want), (dy, dx)


def test_edge_replication_matches_coordinate_clamp():
    ref = _ref(32, 32)
    # MV far past the top-left corner: prediction = replicated edge
    got = mc.mc_block_np(ref, 0, 0, (-400, -400), 16)
    assert np.array_equal(got, np.full((16, 16), ref[0, 0]))


def test_subpel_differs_and_in_range():
    ref = _ref()
    full = mc.mc_block_np(ref, 16, 16, (0, 0), 16)
    half = mc.mc_block_np(ref, 16, 16, (4, 4), 16)  # 1/2-pel luma
    assert not np.array_equal(full, half)
    assert half.min() >= 0 and half.max() <= 255


def test_chroma_half_pel_phase():
    ref = _ref(32, 32)
    # odd full-pel luma MV -> half-pel chroma phase
    got = mc.mc_block_np(ref, 8, 8, (8, 8), 8, subsampling=1)
    assert got.shape == (8, 8)
    # even-pel luma MV -> integer chroma copy
    got2 = mc.mc_block_np(ref, 8, 8, (16, 16), 8, subsampling=1)
    assert np.array_equal(got2, ref[9:17, 9:17])


def test_clamp_mv_for_pad():
    mv = mc.clamp_mv_for_pad((-99999, 99999), 0, 0, 16, 64, 64)
    assert mv[0] % 2 == 0 and mv[1] % 2 == 0
    # window must stay inside the padded plane
    assert mv[0] // 8 >= -(mc.PAD - 4)
    assert 16 + mv[1] // 8 + 4 <= 64 + mc.PAD
