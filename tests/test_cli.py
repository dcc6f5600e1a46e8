"""CLI app smoke test: y4m in -> IVF out -> verification decode."""
import os

import numpy as np

from svt_av1_tpu.app import cli
from svt_av1_tpu.codec.decoder import Decoder
from svt_av1_tpu.utils.ivf import read_ivf
from svt_av1_tpu.utils.y4m import Frame, write_y4m

from test_e2e_intra import synth_frame


def test_cli_roundtrip(tmp_path):
    w, h = 64, 48
    frames = []
    for i in range(2):
        y, u, v = synth_frame(w, h, seed=i)
        frames.append(Frame(y, u, v))
    src = str(tmp_path / "in.y4m")
    out = str(tmp_path / "out.ivf")
    write_y4m(src, frames)
    rc = cli.main(["-i", src, "-b", out, "--crf", "40", "--progress", "0"])
    assert rc == 0
    hdr, pkts = read_ivf(out)
    assert hdr["fourcc"] == b"AV01"
    assert hdr["width"] == w and hdr["height"] == h
    assert len(pkts) == 2
    dec = Decoder()
    rec = dec.decode_temporal_unit(pkts[0][1])[0]
    assert rec["y"].shape == (h, w)
