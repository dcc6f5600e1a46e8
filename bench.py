#!/usr/bin/env python
"""Benchmark: all-intra CIF encode throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: reference SVT-AV1 v3.0.2 (C-only build, single-core host of
this container) on the same synthetic 352x288 clip, all-intra
(--keyint 1, preset capped to 10 by the reference), CRF 35:
15.94 fps (measured 2026-08-16; see BASELINE.md).
"""
import json
import os
import sys
import time

import numpy as np

# persistent XLA compile cache (first bench run on a machine pays the
# compile; reruns start hot)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_FPS = 15.94
FRAMES = 64
W, H = 352, 288


def synth_frames(n):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for t in range(n):
        y = (96 + 60 * np.sin(xx / 17.0 + t * 0.1)
             + 50 * np.cos(yy / 23.0) + rng.integers(-5, 6, (H, W)))
        y = np.clip(y, 0, 255).astype(np.uint8)
        u = np.clip(128 + 40 * np.sin(xx[::2, ::2] / 31.0 + t * 0.05),
                    0, 255).astype(np.uint8)
        v = np.clip(128 + 40 * np.cos(yy[::2, ::2] / 29.0),
                    0, 255).astype(np.uint8)
        out.append((y, u, v))
    return out


def main():
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder

    frames = synth_frames(FRAMES)
    cfg = EncoderConfig(source_width=W, source_height=H, qp=35)
    enc = Encoder(cfg)
    # warmup (compile the batched frame program)
    enc.send_pictures(frames[:32])
    while enc.get_packet():
        pass
    # median of 3 passes (the remote-TPU tunnel adds latency jitter)
    runs = []
    for _ in range(3):
        t0 = time.time()
        done = 0
        # one submit: the encoder pipelines device chunks vs host EC
        enc.send_pictures(frames)
        while True:
            p = enc.get_packet()
            if p is None:
                break
            done += 1
        runs.append(done / (time.time() - t0))
    fps = sorted(runs)[1]
    print(json.dumps({
        "metric": "cif_intra_encode_fps",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }))


if __name__ == "__main__":
    sys.exit(main())
