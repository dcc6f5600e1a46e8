"""Warped motion: kernel bit-exactness vs a scalar port of the
reference loop (warped_motion.c svt_av1_warp_affine_c) and ROTZOOM
global-motion encode/decode round-trip."""
import numpy as np

from svt_av1_tpu.ops import warp


def _scalar_warp(ref, mat, pw, ph, alpha, beta, gamma, delta, bd=8,
                 p_col=0, p_row=0):
    h, w = ref.shape
    WB, DIFF, FB = 16, 10, 7
    round0 = 3
    rbv = 2 * FB - round0
    obh = bd + FB - 1
    obv = bd + 2 * FB - round0
    tbl = warp.warped_filter()
    pred = np.zeros((ph, pw), np.int64)

    def rpot(v, n):
        return (v + (1 << (n - 1))) >> n

    for i in range(p_row, p_row + ph, 8):
        for j in range(p_col, p_col + pw, 8):
            dx = mat[2] * (j + 4) + mat[3] * (i + 4) + mat[0]
            dy = mat[4] * (j + 4) + mat[5] * (i + 4) + mat[1]
            ix4, sx4 = dx >> WB, dx & ((1 << WB) - 1)
            iy4, sy4 = dy >> WB, dy & ((1 << WB) - 1)
            sx4 += alpha * (-4) + beta * (-4)
            sy4 += gamma * (-4) + delta * (-4)
            sx4 &= ~63
            sy4 &= ~63
            tmp = np.zeros((15, 8), np.int64)
            for k in range(-7, 8):
                iy = min(max(iy4 + k, 0), h - 1)
                sx = sx4 + beta * (k + 4)
                for l in range(-4, 4):
                    ix = ix4 + l - 3
                    offs = rpot(sx, DIFF) + 64
                    s = 1 << obh
                    for m in range(8):
                        s += ref[iy, min(max(ix + m, 0), w - 1)] \
                            * tbl[offs][m]
                    tmp[k + 7, l + 4] = rpot(s, round0)
                    sx += alpha
            for k in range(-4, 4):
                sy = sy4 + delta * (k + 4)
                for l in range(-4, 4):
                    offs = rpot(sy, DIFF) + 64
                    s = 1 << obv
                    for m in range(8):
                        s += tmp[k + m + 4, l + 4] * tbl[offs][m]
                    s = rpot(s, rbv)
                    pred[i - p_row + k + 4, j - p_col + l + 4] = \
                        min(max(s - (1 << (bd - 1)) - (1 << bd), 0),
                            (1 << bd) - 1)
                    sy += gamma
    return pred


def test_warp_plane_bitexact():
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 256, (64, 96)).astype(np.int32)
    models = [
        [1200, -800, 65536 + 512, 300, -300, 65536 + 512],
        [-5000, 3000, 65536 - 1024, -700, 700, 65536 - 1024],
        [0, 0, 65536, 0, 0, 65536],
    ]
    for mat in models:
        sh = warp.shear_params(mat)
        assert sh is not None, mat
        got = warp.warp_plane(ref, mat, 32, 24, p_col=8, p_row=16)
        want = _scalar_warp(ref, mat, 32, 24, *sh, p_col=8, p_row=16)
        assert np.array_equal(got, want), mat


def test_shear_rejects_extreme_models():
    # huge zoom exceeds the normative shear limits
    assert warp.shear_params([0, 0, 65536 + 60000, 0, 0,
                              65536 + 60000]) is None
    assert warp.shear_params([0, 0, -5, 0, 0, 65536]) is None


def test_rotzoom_gm_roundtrip():
    """A zoom+rotate inter frame selects warped GLOBALMV blocks and
    round-trips bit-exactly."""
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.codec.decoder import Decoder
    h, w = 128, 192
    yy, xx = np.mgrid[0:h, 0:w]
    f0 = np.clip(110 + 70 * np.sin(xx / 13.0) + 50 * np.cos(yy / 17.0)
                 + 20 * np.sin((xx + yy) / 7.0), 0, 255)
    cy, cx = h / 2, w / 2
    s, th = 0.99, 0.004
    ys = cy + (yy - cy) * s * np.cos(th) - (xx - cx) * s * np.sin(th)
    xs = cx + (yy - cy) * s * np.sin(th) + (xx - cx) * s * np.cos(th)
    yc = np.clip(ys, 0, h - 1)
    xc = np.clip(xs, 0, w - 1)
    y0, x0 = np.floor(yc).astype(int), np.floor(xc).astype(int)
    fy, fx = yc - y0, xc - x0
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    f1 = (f0[y0, x0] * (1 - fy) * (1 - fx) + f0[y0, x1] * (1 - fy) * fx
          + f0[y1, x0] * fy * (1 - fx) + f0[y1, x1] * fy * fx)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 135, np.uint8)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        enc_mode=8, intra_period_length=8)
    enc = Encoder(cfg)
    enc.send_picture(f0.astype(np.uint8), u, v)
    enc.send_picture(np.clip(f1, 0, 255).astype(np.uint8), u, v,
                     eos=True)
    dec = Decoder()
    nwarp = 0
    while True:
        pkt = enc.get_packet()
        if pkt is None:
            break
        out = dec.decode_temporal_unit(pkt.data)[0]
        for p in ("y", "u", "v"):
            assert np.array_equal(out[p], pkt.recon[p]), (pkt.pts, p)
        nwarp += sum(1 for d in out["decisions"].values()
                     if getattr(d, "use_warp", False))
    assert nwarp > 0, "zoom content should pick warped GLOBALMV blocks"
