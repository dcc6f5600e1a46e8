"""Compound (two-reference) inter prediction: COMPOUND_AVERAGE kernel
sanity, compound MV-pair stack, and B-frame encode/decode round-trip
with comp_mode / ref-pair / NEW_NEWMV syntax."""
import numpy as np
import jax.numpy as jnp

from svt_av1_tpu.ops import mc


def test_compound_avg_of_constants():
    r0 = np.full((64, 64), 100, np.int32)
    r1 = np.full((64, 64), 60, np.int32)
    p0 = jnp.asarray(mc.pad_plane(r0, mc.PAD))
    p1 = jnp.asarray(mc.pad_plane(r1, mc.PAD))
    z = np.zeros((1, 2), np.int32)
    out = mc.mc_blocks_compound(p0, p1, np.zeros(1, np.int32),
                                np.zeros(1, np.int32), z, z, 16, mc.PAD)
    assert np.all(np.asarray(out) == 80)


def test_compound_zero_mv_exact_blend():
    rng = np.random.default_rng(0)
    f0 = rng.integers(0, 256, (64, 64)).astype(np.int32)
    f1 = rng.integers(0, 256, (64, 64)).astype(np.int32)
    p0 = jnp.asarray(mc.pad_plane(f0, mc.PAD))
    p1 = jnp.asarray(mc.pad_plane(f1, mc.PAD))
    nb = 16
    ys = (np.arange(nb) // 4 * 16).astype(np.int32)
    xs = (np.arange(nb) % 4 * 16).astype(np.int32)
    z = np.zeros((nb, 2), np.int32)
    out = np.asarray(mc.mc_blocks_compound(p0, p1, ys, xs, z, z, 16,
                                           mc.PAD))
    want = (f0 + f1 + 1) >> 1
    for i in range(nb):
        blk = want[ys[i]:ys[i] + 16, xs[i]:xs[i] + 16]
        assert np.abs(out[i] - blk).max() <= 1


def test_comp_stack_pair_match():
    from svt_av1_tpu.codec import mv_pred
    g = mv_pred.MiGrid(16, 16)
    g.set_block(0, 0, 4, 4, mv_pred.LAST_FRAME, mv_pred.NEWMV, 8, -8,
                ref2=mv_pred.ALTREF_FRAME, mv2=(-4, 4))
    st = mv_pred.find_mv_stack_comp(g, 4, 0, 4, 4,
                                    (mv_pred.LAST_FRAME,
                                     mv_pred.ALTREF_FRAME))
    assert st.pairs[0] == ((8, -8), (-4, 4))
    assert len(st.pairs) >= 2


def test_compound_bframe_roundtrip():
    """A blend B frame selects compound blocks; the stream round-trips
    bit-exactly through comp_mode/ref-pair/NEW_NEWMV syntax."""
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    import svt_av1_tpu.codec.decoder as D
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    base = 110 + 60 * np.sin(xx / 17.0) + 40 * np.cos(yy / 13.0)
    f0 = np.clip(base, 0, 255).astype(np.uint8)
    f2 = np.clip(base + 30 * np.sin((xx + yy) / 9.0), 0,
                 255).astype(np.uint8)
    f1 = ((f0.astype(np.int32) + f2.astype(np.int32) + 1)
          // 2).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 135, np.uint8)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        enc_mode=8, intra_period_length=16,
                        hierarchical_levels=1)
    enc = Encoder(cfg)
    for f in (f0, f1, f2):
        enc.send_picture(f, u, v)
    enc.send_eos()

    ncomp = []
    orig = D.Decoder._decode_frame

    def spy(self, payload):
        recon, shown = orig(self, payload)
        ds = recon.get("decisions", {})
        ncomp.append(sum(1 for d in ds.values()
                         if getattr(d, "ref2", 0)))
        return recon, shown

    D.Decoder._decode_frame = spy
    try:
        dec = D.Decoder()
        while True:
            p = enc.get_packet()
            if p is None:
                break
            outs = dec.decode_temporal_unit(p.data)
            if p.recon is not None and outs:
                for pl in ("y", "u", "v"):
                    assert np.array_equal(outs[0][pl], p.recon[pl]), \
                        (p.pts, pl)
    finally:
        D.Decoder._decode_frame = orig
    assert sum(ncomp) > 0, "blend B frame should pick compound blocks"
