#!/usr/bin/env python
"""Extract the *normative AV1 inverse-transform butterfly networks* into a
data representation ("stage programs") executed by our JAX interpreter
(svt_av1_tpu/ops/transforms.py).

The inverse transforms are normative: the AV1 spec (§7.13.2) prescribes the
exact integer butterfly sequence, identically implemented by every AV1
codec.  We store the networks as data (op tables), not code.  Source parsed
(read-only): /root/reference/Source/Lib/Codec/inv_transforms.c.

Each 1-D transform becomes a list of stages; each stage is a table over
output lanes i with columns:
  mode[i]  : 0 = copy (out = a_w * in[a]),
             1 = btf  (out = round_shift(cospi_sgn0*cospi[c0]*in[a]
                                        + cospi_sgn1*cospi[c1]*in[b], bit)),
             2 = add  (out = clamp(a_w*in[a] + b_w*in[b], range))
  a[i], b[i]           : source lane indices
  a_w[i], b_w[i]       : +-1 / 0 integer weights      (modes 0 and 2)
  c0[i], c1[i]         : cospi table indices          (mode 1)
  s0[i], s1[i]         : signs of the cospi weights   (mode 1)

Also extracts: cospi/sinpi coefficient tables, per-txsize inverse shift
pairs.  Self-checks every parsed program against the reference C function
via the ctypes oracle when available.

Output: svt_av1_tpu/codec/data/av1_inv_txfm_programs.npz
"""
from __future__ import annotations

import ast
import os
import re
import sys

import numpy as np

REF = "/root/reference/Source/Lib/Codec/inv_transforms.c"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "svt_av1_tpu", "codec", "data")

FUNCS = {
    "idct4": ("svt_av1_idct4_new", 4),
    "idct8": ("svt_av1_idct8_new", 8),
    "idct16": ("svt_av1_idct16_new", 16),
    "idct32": ("svt_av1_idct32_new", 32),
    "idct64": ("svt_av1_idct64_new", 64),
    "iadst8": ("svt_av1_iadst8_new", 8),
    "iadst16": ("svt_av1_iadst16_new", 16),
}

RE_COPY = re.compile(
    r"bf1\[(\d+)\]\s*=\s*(-?)(?:bf0|input)\[(\d+)\]\s*;")
RE_BTF = re.compile(
    r"bf1\[(\d+)\]\s*=\s*half_btf\(\s*(-?)cospi\[(\d+)\]\s*,\s*bf0\[(\d+)\]\s*,"
    r"\s*(-?)cospi\[(\d+)\]\s*,\s*bf0\[(\d+)\]\s*,\s*cos_bit\s*\)\s*;")
RE_ADD = re.compile(
    r"bf1\[(\d+)\]\s*=\s*clamp_value\(\s*(-?)bf0\[(\d+)\]\s*([+-])\s*"
    r"bf0\[(\d+)\]\s*,\s*stage_range\[stage\]\s*\)\s*;")


def get_function_body(text: str, name: str) -> str:
    m = re.search(rf"void {re.escape(name)}\(.*?\)\s*\{{", text, re.S)
    if not m:
        raise ValueError(f"function {name} not found")
    depth = 1
    i = m.end()
    while depth:
        c = text[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
        i += 1
    return text[m.end():i - 1]


def strip_comments(text: str, keep_stage_markers=True) -> str:
    # keep "// stage" markers (they delimit stages), drop other comments
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    out_lines = []
    for ln in text.splitlines():
        s = ln.strip()
        if s.startswith("//"):
            if keep_stage_markers and re.match(r"//\s*stage", s):
                out_lines.append(s)
            continue
        # strip trailing // comments
        ln = re.sub(r"//.*", "", ln)
        out_lines.append(ln)
    return "\n".join(out_lines)


def parse_function(text: str, name: str, n: int):
    body = strip_comments(get_function_body(text, name))
    chunks = re.split(r"//\s*stage\s*\d+\s*;?", body)
    stages = []
    for chunk in chunks[1:]:
        ops = {}
        for ln in chunk.splitlines():
            ln = ln.strip()
            if not ln or "=" not in ln:
                continue
            if re.match(r"(bf0|bf1|stage|int32_t|const|assert)\s*(=|\+\+)", ln):
                continue
            m = RE_COPY.match(ln)
            if m:
                d, sgn, s = int(m.group(1)), m.group(2), int(m.group(3))
                ops[d] = dict(mode=0, a=s, a_w=-1 if sgn == "-" else 1,
                              b=0, b_w=0, c0=0, c1=0, s0=0, s1=0)
                continue
            m = RE_BTF.match(ln)
            if m:
                d = int(m.group(1))
                sg0, c0, a = m.group(2), int(m.group(3)), int(m.group(4))
                sg1, c1, b = m.group(5), int(m.group(6)), int(m.group(7))
                ops[d] = dict(mode=1, a=a, b=b, a_w=0, b_w=0,
                              c0=c0, c1=c1,
                              s0=-1 if sg0 == "-" else 1,
                              s1=-1 if sg1 == "-" else 1)
                continue
            m = RE_ADD.match(ln)
            if m:
                d = int(m.group(1))
                sg0, a = m.group(2), int(m.group(3))
                op, b = m.group(4), int(m.group(5))
                ops[d] = dict(mode=2, a=a, b=b,
                              a_w=-1 if sg0 == "-" else 1,
                              b_w=-1 if op == "-" else 1,
                              c0=0, c1=0, s0=0, s1=0)
                continue
            if ln.startswith(("bf0", "bf1", "stage", "int32_t", "const",
                              "assert", "(void)")):
                continue
            raise ValueError(f"{name}: unparsed line: {ln!r}")
        if not ops:
            continue
        if sorted(ops) != list(range(n)):
            raise ValueError(f"{name}: stage writes lanes {sorted(ops)},"
                             f" expected 0..{n-1}")
        stage = {k: np.array([ops[i][k] for i in range(n)], dtype=np.int32)
                 for k in ("mode", "a", "b", "a_w", "b_w", "c0", "c1",
                           "s0", "s1")}
        stages.append(stage)
    return stages


def extract_tables(text: str):
    def grab(name, shape, dtype):
        m = re.search(rf"{name}\s*(?:\[[^\]]*\])+\s*=\s*\{{", text)
        depth, i = 0, m.end() - 1
        start = i
        while True:
            if text[i] == "{":
                depth += 1
            elif text[i] == "}":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        init = text[start:i + 1].replace("{", "[").replace("}", "]")
        init = re.sub(r",\s*\]", "]", init)
        arr = np.array(ast.literal_eval(init), dtype=dtype).reshape(shape)
        return arr

    cospi = grab("svt_aom_eb_av1_cospi_arr_data", (7, 64), np.int32)
    sinpi = grab("svt_aom_eb_av1_sinpi_arr_data", (7, 5), np.int32)
    return cospi, sinpi


def extract_inv_shifts(text: str):
    shifts = {}
    for m in re.finditer(
            r"static const int8_t inv_shift_(\d+)x(\d+)\[2\]\s*=\s*"
            r"\{\s*(-?\d+)\s*,\s*(-?\d+)\s*\}", text):
        w, h = int(m.group(1)), int(m.group(2))
        shifts[f"inv_shift_{w}x{h}"] = np.array(
            [int(m.group(3)), int(m.group(4))], dtype=np.int32)
    return shifts


def interpret(stages, x, cospi, cos_bit, clamp_bit):
    """numpy reference interpreter (mirrors the JAX one) for self-check."""
    x = np.asarray(x, dtype=np.int64)
    lo, hi = -(1 << (clamp_bit - 1)), (1 << (clamp_bit - 1)) - 1
    for st in stages:
        av = x[st["a"]]
        bv = x[st["b"]]
        ca = st["s0"] * cospi[st["c0"]]
        cb = st["s1"] * cospi[st["c1"]]
        btf = (ca * av + cb * bv + (1 << (cos_bit - 1))) >> cos_bit
        add = st["a_w"] * av + st["b_w"] * bv
        out = np.where(st["mode"] == 1, btf,
                       np.where(st["mode"] == 2, np.clip(add, lo, hi), add))
        x = out
    return x


def self_check(programs, cospi_tab):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import oracle
    if not oracle.available():
        print("oracle unavailable; skipping self-check")
        return
    import ctypes
    lib = oracle.load()
    rng = np.random.default_rng(0)
    for name, (sym, n) in FUNCS.items():
        fn = getattr(lib, sym)
        stages = programs[name]
        for trial in range(50):
            x = rng.integers(-(1 << 15), 1 << 15, size=n).astype(np.int64)
            cos_bit = 12
            got = interpret(stages, x, cospi_tab[cos_bit - 10], cos_bit, 16)
            inp = (ctypes.c_int32 * n)(*[int(v) for v in x])
            outp = (ctypes.c_int32 * n)()
            sr = (ctypes.c_int8 * 12)(*([16] * 12))
            fn(inp, outp, ctypes.c_int8(cos_bit), sr)
            ref = np.array(outp[:n], dtype=np.int64)
            if not np.array_equal(got, ref):
                raise AssertionError(
                    f"{name} mismatch trial {trial}:\n got {got}\n ref {ref}")
        print(f"  {name}: OK ({len(stages)} stages, oracle-verified)")


def main():
    text = open(REF).read()
    cospi, sinpi = extract_tables(strip_comments(text, False))
    # sanity: cospi[bit][i] = round(cos(i*pi/128) * 2^bit)
    for b in range(10, 14):
        expect = np.round(np.cos(np.arange(64) * np.pi / 128) * (1 << b))
        assert np.array_equal(cospi[b - 10], expect.astype(np.int64)), b
    print("cospi/sinpi tables extracted (formula-verified)")

    programs = {}
    for name, (sym, n) in FUNCS.items():
        programs[name] = parse_function(text, sym, n)

    self_check(programs, cospi)

    out = {}
    for name, stages in programs.items():
        out[f"{name}__nstages"] = np.array(len(stages), dtype=np.int32)
        for i, st in enumerate(stages):
            for k, v in st.items():
                out[f"{name}__s{i}__{k}"] = v
    out["cospi"] = cospi
    out["sinpi"] = sinpi
    for k, v in extract_inv_shifts(text).items():
        out[k] = v
    os.makedirs(OUT, exist_ok=True)
    np.savez_compressed(os.path.join(OUT, "av1_inv_txfm_programs.npz"), **out)
    print(f"wrote {len(programs)} programs -> av1_inv_txfm_programs.npz")


if __name__ == "__main__":
    main()
