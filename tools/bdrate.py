#!/usr/bin/env python
"""BD-rate harness vs the reference C encoder (SVT-AV1 v3.0.2).

Encodes the same clips with the reference SvtAv1EncApp (built by
tools/build_oracle.sh-style app build, /tmp/svtapp) and with this
encoder at matched settings over a CRF ladder, collects
(bits-per-frame, mean Y-PSNR) points, computes the Bjontegaard rate
delta (cubic log-rate fit), and writes BDRATE.md.

Clips are synthetic (no distributable test footage in this container);
each stresses a different tool family: translating texture (inter/ME),
sin-pattern motion (intra/tx), noisy static (skip/CDEF/TF).

Usage: python tools/bdrate.py [--preset 6] [--frames 48] [--out BDRATE.md]
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

REF_APP = "/tmp/svtapp/Bin/Release/SvtAv1EncApp"
W, H = 352, 288
CRFS = (27, 35, 43, 51)


def clip_pan(n, rng):
    base = rng.integers(0, 240, (H + 64, W + 64)).astype(np.uint8)
    # low-pass the texture so motion compensation has structure
    k = np.ones((5, 5)) / 25.0
    from numpy.lib.stride_tricks import sliding_window_view
    sm = sliding_window_view(base.astype(np.float32), (5, 5))
    base = sm.reshape(*sm.shape[:2], 25).dot(k.reshape(25)).astype(np.uint8)
    frames = []
    for t in range(n):
        dy, dx = (t * 2) % 48, (t * 3) % 48
        y = base[dy:dy + H, dx:dx + W].copy()
        u = np.full((H // 2, W // 2), 118, np.uint8)
        v = y[::2, ::2] // 4 + 96
        frames.append((y, u, v))
    return frames


def clip_sin(n, rng):
    yy, xx = np.mgrid[0:H, 0:W]
    frames = []
    for t in range(n):
        y = np.clip(96 + 60 * np.sin(xx / 17.0 + t * 0.13)
                    + 50 * np.cos(yy / 23.0 + t * 0.02)
                    + rng.integers(-4, 5, (H, W)), 0, 255).astype(np.uint8)
        u = np.clip(128 + 40 * np.sin(xx[::2, ::2] / 31.0 + t * 0.05),
                    0, 255).astype(np.uint8)
        v = np.clip(128 + 40 * np.cos(yy[::2, ::2] / 29.0),
                    0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def clip_noise(n, rng):
    yy, xx = np.mgrid[0:H, 0:W]
    still = np.clip(110 + 50 * np.sin(xx / 29.0) * np.cos(yy / 31.0),
                    0, 255)
    frames = []
    for t in range(n):
        y = np.clip(still + rng.integers(-6, 7, (H, W)), 0,
                    255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 125, np.uint8)
        v = np.full((H // 2, W // 2), 130, np.uint8)
        frames.append((y, u, v))
    return frames


def clip_obj(n, rng):
    """Moving textured objects over a static textured background:
    motion boundaries cross 16x16 blocks (the 8x8-partition /
    per-sub-MV content class the other clips lack)."""
    bg = np.kron(rng.integers(40, 210, (H // 4, W // 4))
                 .astype(np.uint8), np.ones((4, 4), np.uint8))
    spr = np.kron(rng.integers(20, 235, (20, 20)).astype(np.uint8),
                  np.ones((3, 3), np.uint8))          # 60x60 sprite
    frames = []
    for t in range(n):
        y = bg.copy()
        x0 = (23 + 5 * t) % (W - 60)
        y0 = (37 + 2 * t) % (H - 60)
        y[y0:y0 + 60, x0:x0 + 60] = spr
        x1 = (W - 90 - 3 * t) % (W - 60)
        y1 = (H - 100 - 4 * t) % (H - 60)
        y[y1:y1 + 60, x1:x1 + 60] = spr[::-1, ::-1]
        u = np.full((H // 2, W // 2), 115, np.uint8)
        v = np.full((H // 2, W // 2), 135, np.uint8)
        frames.append((y, u, v))
    return frames


CLIPS = {"pan": clip_pan, "sin": clip_sin, "noise": clip_noise,
         "obj": clip_obj}


def write_y4m(path, frames):
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{W} H{H} F30:1 Ip A1:1 C420\n".encode())
        for y, u, v in frames:
            f.write(b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes())


def run_reference(y4m, crf, preset, keyint, n):
    # reference points are deterministic per (clip, ladder) config:
    # cache them so feature A/B sweeps don't re-run the C encoder
    ck = f"{os.path.basename(y4m)}-{crf}-{preset}-{keyint}-{n}"
    cache = f"/tmp/bd_refcache_{ck}.json"
    if os.path.exists(cache):
        with open(cache) as f:
            d = json.load(f)
        return d["bpf"], d["psnr"]
    out = "/tmp/bd_ref.ivf"
    stat = "/tmp/bd_ref_stat.txt"
    cmd = [REF_APP, "-i", y4m, "-b", out, "--preset", str(preset),
           "--crf", str(crf), "--keyint", str(keyint), "--lp", "1",
           "-n", str(n), "--enable-stat-report", "1",
           "--stat-file", stat]
    subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    bits = os.path.getsize(out) * 8
    res = bits / n, _psnr_from_stat(stat)
    with open(cache, "w") as f:
        json.dump({"bpf": res[0], "psnr": res[1]}, f)
    return res


def _psnr_from_stat(path):
    """Mean per-picture PSNR-Y from the --stat-file report."""
    vals = []
    with open(path) as f:
        for line in f:
            m = re.search(r"PSNR-Y:\s*([0-9.]+)\s*dB", line)
            if m:
                vals.append(float(m.group(1)))
    if not vals:
        raise RuntimeError("cannot parse reference PSNR")
    return float(np.mean(vals))


def run_ours(frames, crf, preset, keyint):
    from svt_av1_tpu.api.config import EncoderConfig
    from svt_av1_tpu.api.encoder import Encoder
    from svt_av1_tpu.utils.metrics import psnr

    cfg = EncoderConfig(source_width=W, source_height=H, qp=crf,
                        enc_mode=preset,
                        intra_period_length=keyint - 1,
                        hierarchical_levels=3, enable_tpl_la=1,
                        enable_dlf_flag=1, cdef_level=1)
    enc = Encoder(cfg)
    bits = 0
    psnrs = []
    disp = []
    for i, (y, u, v) in enumerate(frames):
        enc.send_picture(y, u, v, eos=(i == len(frames) - 1))
    while True:
        p = enc.get_packet()
        if p is None:
            break
        bits += len(p.data) * 8
        if p.displayed and p.recon is not None:
            disp.append((p.pts, p.recon["y"]))
    disp.sort()
    for (pts, rec) in disp:
        psnrs.append(psnr(frames[pts][0], rec))
    return bits / len(frames), float(np.mean(psnrs))


def bd_rate(ref_pts, test_pts):
    """Bjontegaard rate delta (%) of test vs ref: negative = test needs
    fewer bits at equal quality.  Classic cubic fit in (psnr, log-rate)."""
    r1 = np.log10([p[0] for p in ref_pts])
    q1 = np.array([p[1] for p in ref_pts])
    r2 = np.log10([p[0] for p in test_pts])
    q2 = np.array([p[1] for p in test_pts])
    p1 = np.polyfit(q1, r1, 3)
    p2 = np.polyfit(q2, r2, 3)
    lo = max(q1.min(), q2.min())
    hi = min(q1.max(), q2.max())
    if hi <= lo:
        # no PSNR overlap: extrapolate the fits over the union range
        # (coarser, but a huge gap should still produce a number the
        # mean can carry instead of poisoning it with nan)
        lo = min(q1.min(), q2.min())
        hi = max(q1.max(), q2.max())
    if (hi - lo < 0.5 or q1.max() - q1.min() < 0.5
            or q2.max() - q2.min() < 0.5):
        # a near-flat quality curve (content PSNR-saturated, e.g. a
        # noise clip at its noise floor) makes the cubic fit and the
        # Bjontegaard integral degenerate — report the mean log-rate
        # gap (rate ratio at matched quality) instead
        return float((10 ** (r2.mean() - r1.mean()) - 1) * 100)
    xs = np.linspace(lo, hi, 100)
    trap = getattr(np, "trapezoid", None) or np.trapz
    int1 = trap(np.polyval(p1, xs), xs)
    int2 = trap(np.polyval(p2, xs), xs)
    return float((10 ** ((int2 - int1) / (hi - lo)) - 1) * 100)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", type=int, default=6)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--keyint", type=int, default=16)
    ap.add_argument("--clips", default="pan,sin,noise,obj")
    ap.add_argument("--out", default="BDRATE.md")
    ap.add_argument("--cpu", action="store_true",
                    help="pin JAX to the CPU backend (e.g. when the "
                         "TPU tunnel is unavailable); bits/PSNR are "
                         "backend-independent")
    ap.add_argument("--feat", default=None,
                    help="SVT_TPU_FEAT override for OUR side, e.g. "
                         "'exact_rates=1,rdoq=1' (A/B sweeps)")
    args = ap.parse_args()
    if args.feat is not None:
        os.environ["SVT_TPU_FEAT"] = args.feat
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    rows = []
    for name in args.clips.split(","):
        rng = np.random.default_rng(42)
        frames = CLIPS[name](args.frames, rng)
        y4m = f"/tmp/bd_{name}.y4m"
        write_y4m(y4m, frames)
        ref_pts, our_pts = [], []
        for crf in CRFS:
            rb, rp = run_reference(y4m, crf, args.preset, args.keyint,
                                   args.frames)
            ref_pts.append((rb, rp))
            print(f"[{name}] ref  crf={crf}: {rb:9.0f} b/f  "
                  f"{rp:6.2f} dB", flush=True)
        for crf in CRFS:
            t0 = time.time()
            ob, op = run_ours(frames, crf, args.preset, args.keyint)
            our_pts.append((ob, op))
            print(f"[{name}] ours crf={crf}: {ob:9.0f} b/f  "
                  f"{op:6.2f} dB  ({time.time()-t0:.0f}s)", flush=True)
        bd = bd_rate(ref_pts, our_pts)
        rows.append((name, ref_pts, our_pts, bd))
        print(f"[{name}] BD-rate vs reference: {bd:+.1f}%", flush=True)
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    with open(args.out, "w") as f:
        f.write("# BD-rate vs reference SVT-AV1 v3.0.2\n\n")
        f.write(f"Measured {stamp} — preset {args.preset}, keyint "
                f"{args.keyint}, {args.frames} frames, CIF synthetic "
                "clips (no distributable footage in this container), "
                "CRF ladder "
                f"{list(CRFS)}.  Y-PSNR; reference self-reported "
                "stats, ours from recon.  Positive = we need more "
                "bits at equal quality.\n\n")
        f.write("| clip | BD-rate | ref points (b/f, dB) | "
                "ours (b/f, dB) |\n|---|---|---|---|\n")
        for name, rp, op, bd in rows:
            rs = "; ".join(f"{b:.0f}/{p:.2f}" for b, p in rp)
            os_ = "; ".join(f"{b:.0f}/{p:.2f}" for b, p in op)
            f.write(f"| {name} | {bd:+.1f}% | {rs} | {os_} |\n")
        mean = float(np.nanmean([r[3] for r in rows]))
        f.write(f"\n**Mean BD-rate: {mean:+.1f}%** (north star: within "
                "+1% of the reference).\n")
    print(json.dumps({"bdrate_mean": round(mean, 2)}))


if __name__ == "__main__":
    sys.exit(main())
