#!/usr/bin/env python
"""Benchmark: hierarchical-GOP quality-pipeline throughput (primary)
plus all-intra throughput (secondary, in "extra").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Primary metric — the north-star path (BASELINE.md config 3 shape):
CIF 352x288, preset 6, keyint 16, 3-level hierarchical mini-GoPs, TPL,
DLF level search, CDEF, CRF 35.  Baseline: reference SVT-AV1 v3.0.2
(C-only single-core build of this container) on the same synthetic
clip and matched tools:
  --preset 6 --keyint 16 --crf 35 --hierarchical-levels 3 --lp 1
  --enable-restoration 0   (LR off on both sides)
  => 6.40 fps (best of 3, measured 2026-08-17 on this host,
  /tmp/svtapp build; 5.44 fps with LR on).
Secondary: all-intra CIF vs 15.94 fps reference (BENCH_r02 metric).

Budget-safe (the round-3 lesson): the script tracks an internal
deadline (SVT_TPU_BENCH_DEADLINE seconds, default 1200) and always
prints its JSON line with whatever completed — a cold (compile-
inclusive) number beats a timeout.  The XLA compile cache makes
reruns on the same host start hot.
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

# this JAX build ignores the env vars (config default stays None) and
# the TPU tunnel backend compiles in ~16 min cold, so force the config
# keys explicitly -- measured 6.4 s -> 0.86 s on a cache hit
from svt_av1_tpu.utils.cache import ensure_compile_cache  # noqa: E402
ensure_compile_cache()

BASELINE_GOP_FPS = 6.40    # reference preset 6 GOP (no LR), 1 core
BASELINE_INTRA_FPS = 15.94
FRAMES = 64
W, H = 352, 288

_T0 = time.time()
_DEADLINE = float(os.environ.get("SVT_TPU_BENCH_DEADLINE", "1200"))


def _left():
    return _DEADLINE - (time.time() - _T0)


def synth_frames(n, motion=True):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for t in range(n):
        dx = t * 0.13 if motion else t * 0.1
        y = (96 + 60 * np.sin(xx / 17.0 + dx)
             + 50 * np.cos(yy / 23.0 + (t * 0.02 if motion else 0))
             + rng.integers(-5, 6, (H, W)))
        y = np.clip(y, 0, 255).astype(np.uint8)
        u = np.clip(128 + 40 * np.sin(xx[::2, ::2] / 31.0 + t * 0.05),
                    0, 255).astype(np.uint8)
        v = np.clip(128 + 40 * np.cos(yy[::2, ::2] / 29.0),
                    0, 255).astype(np.uint8)
        out.append((y, u, v))
    return out


def run_encode(cfg, frames):
    from svt_av1_tpu.api.encoder import Encoder
    enc = Encoder(cfg)
    enc.recon_enabled = False
    t0 = time.time()
    done = 0
    for i, (y, u, v) in enumerate(frames):
        enc.send_picture(y, u, v, eos=(i == len(frames) - 1))
    while enc.get_packet() is not None:
        done += 1
    return done / (time.time() - t0)


def _gop_cfg():
    from svt_av1_tpu.api.config import EncoderConfig
    return EncoderConfig(
        source_width=W, source_height=H, qp=35, enc_mode=6,
        intra_period_length=15, hierarchical_levels=3,
        enable_tpl_la=1, enable_dlf_flag=1, cdef_level=1)


def bench_gop(frames):
    """Warm-up pass over a 17-frame prefix (key + one full keyint
    period + the next key: every program shape the 64-frame run needs,
    at 1/4 the frame count), then a HOT rerun of the same prefix (all
    programs compiled -> a true compile-free rate even when the full
    64-frame run does not fit the deadline), then the 64-frame hot run
    if the hot-estimated time fits.  The round-4 capture used the
    compile-polluted warm rate to estimate the hot run and skipped it
    with 2000s left -- never estimate from a run that compiled.
    Returns (hot_fps, warm_fps)."""
    t0 = time.time()
    warm = run_encode(_gop_cfg(), frames[:17])
    warm_dur = time.time() - t0
    print(f"# bench: GOP warmup (compiles) took {warm_dur:.0f}s",
          file=sys.stderr)
    if _left() < 20:
        return warm, warm
    hot17 = run_encode(_gop_cfg(), frames[:17])
    hot = hot17
    if _left() > 1.2 * (len(frames) / max(hot17, 1e-6)) + 20:
        hot = run_encode(_gop_cfg(), frames)
    else:
        print(f"# bench: 64f hot run skipped ({_left():.0f}s left); "
              f"reporting the 17-frame hot rerun ({hot17:.3f} fps)",
              file=sys.stderr)
    return hot, warm


def bench_intra(frames):
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    cfg = EncoderConfig(source_width=W, source_height=H, qp=35)
    enc = Encoder(cfg)
    enc.recon_enabled = False
    enc.send_pictures(frames[:32])           # warmup: EXACT timed shape
    while enc.get_packet():
        pass
    t0 = time.time()
    done = 0
    enc.send_pictures(frames[:32])
    while enc.get_packet() is not None:
        done += 1
    return done / (time.time() - t0)


def main():
    frames = synth_frames(FRAMES)
    gop_fps, gop_cold = bench_gop(frames)
    intra_fps = None
    if _left() > 120:
        intra_fps = bench_intra(frames)
    else:
        print(f"# bench: skipping intra ({_left():.0f}s left)",
              file=sys.stderr)
    extra = {
        "gop_warm_fps": round(gop_cold, 3),
        "gop_config": "preset6 keyint15 hier3 tpl dlf cdef crf35",
    }
    if intra_fps is not None:
        extra["cif_intra_encode_fps"] = round(intra_fps, 3)
        extra["intra_vs_baseline"] = round(
            intra_fps / BASELINE_INTRA_FPS, 4)
    print(json.dumps({
        "metric": "cif_gop_p6_encode_fps",
        "value": round(gop_fps, 3),
        "unit": "fps",
        "vs_baseline": round(gop_fps / BASELINE_GOP_FPS, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    sys.exit(main())
