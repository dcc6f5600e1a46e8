"""Recursive filter-intra: kernel bit-exactness vs a scalar port of the
reference loop (filterintra_c.c svt_av1_filter_intra_predictor) and
encode/decode round-trip with the mode enabled (spec 5.11.31)."""
import numpy as np
import jax.numpy as jnp

from svt_av1_tpu.ops import intra


def _scalar_ref(above_m1, left, mode, bw, bh, bd=8):
    buf = np.zeros((bh + 1, bw + 1), np.int64)
    buf[0, :bw + 1] = above_m1
    for r in range(bh):
        buf[r + 1][0] = left[r]
    taps = intra.FILTER_INTRA_TAPS[mode]
    for r in range(1, bh + 1, 2):
        for c in range(1, bw + 1, 4):
            p = [buf[r - 1][c - 1], buf[r - 1][c], buf[r - 1][c + 1],
                 buf[r - 1][c + 2], buf[r - 1][c + 3], buf[r][c - 1],
                 buf[r + 1][c - 1]]
            for k in range(8):
                acc = sum(int(taps[k][j]) * int(p[j]) for j in range(7))
                v = (abs(acc) + 8) >> 4
                if acc < 0:
                    v = -v
                buf[r + (k >> 2)][c + (k & 3)] = min(max(v, 0),
                                                     (1 << bd) - 1)
    return buf[1:, 1:]


def test_filter_intra_pred_bitexact():
    rng = np.random.default_rng(0)
    for n in (4, 8, 16, 32):
        for mode in range(intra.FILTER_INTRA_MODES):
            above = rng.integers(0, 256, (2, n)).astype(np.int32)
            left = rng.integers(0, 256, (2, n)).astype(np.int32)
            corner = rng.integers(0, 256, (2,)).astype(np.int32)
            got = np.asarray(intra.filter_intra_pred(
                jnp.asarray(above), jnp.asarray(left),
                jnp.asarray(corner), mode, n, n))
            for bi in range(2):
                am1 = np.concatenate([[corner[bi]], above[bi]])
                want = _scalar_ref(am1, left[bi], mode, n, n)
                assert np.array_equal(got[bi], want), (n, mode)


def test_filter_intra_pred_multi_matches_single():
    rng = np.random.default_rng(1)
    n = 16
    above = jnp.asarray(rng.integers(0, 256, (3, n)).astype(np.int32))
    left = jnp.asarray(rng.integers(0, 256, (3, n)).astype(np.int32))
    corner = jnp.asarray(rng.integers(0, 256, (3,)).astype(np.int32))
    multi = np.asarray(intra.filter_intra_pred_multi(
        above, left, corner, (0, 1, 2, 3, 4), n, n))
    for m in range(5):
        single = np.asarray(intra.filter_intra_pred(
            above, left, corner, m, n, n))
        assert np.array_equal(multi[m], single), m


def test_filter_intra_encode_roundtrip():
    """Quality preset encodes with enable_filter_intra; stream decodes
    bit-exact and smooth-gradient content selects the mode."""
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder
    h, w = 64, 64
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(60 + 0.9 * xx + 0.6 * yy + 6 * np.sin(xx / 7.0),
                0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 135, np.uint8)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        enc_mode=2)
    enc = Encoder(cfg)
    enc.send_picture(y, u, v, eos=True)
    pkt = enc.get_packet()
    dec = Decoder()
    out = dec.decode_temporal_unit(pkt.data)[0]
    assert dec.sp.enable_filter_intra
    for p in ("y", "u", "v"):
        assert np.array_equal(out[p], pkt.recon[p]), p
