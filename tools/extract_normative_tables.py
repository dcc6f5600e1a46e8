#!/usr/bin/env python
"""Extract *normative AV1 spec constants* from the reference mirror into
binary .npz data files.

These tables (default CDF initializations, quantizer lookup tables, scan
orders) are defined by the AV1 specification itself and are byte-identical
in every conformant AV1 implementation (aom, dav1d, rav1e, SVT-AV1).  We
store them as data, not code; this script records their provenance.

Sources parsed (read-only):
  /root/reference/Source/Lib/Codec/cabac_context_model.c  (default CDFs)
  /root/reference/Source/Lib/Codec/inv_transforms.c       (dc/ac qlookup)
  /root/reference/Source/Lib/Codec/coefficients.h         (scan orders)

Output:
  svt_av1_tpu/codec/data/av1_default_cdfs.npz
  svt_av1_tpu/codec/data/av1_quant_tables.npz
  svt_av1_tpu/codec/data/av1_scan_tables.npz
"""
from __future__ import annotations

import ast
import os
import re
import sys

import numpy as np

REF = "/root/reference/Source/Lib/Codec"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "svt_av1_tpu", "codec", "data")

CDF_PROB_TOP = 32768


def strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    return text


def expand_cdf_macros(init: str) -> str:
    def repl(m):
        args = [a.strip() for a in m.group(2).split(",") if a.strip()]
        # args may be simple arithmetic expressions like "128 * 128"
        vals = [str(CDF_PROB_TOP - int(eval(a, {"__builtins__": {}})))
                for a in args]
        vals.append("0")  # AOM_ICDF(CDF_PROB_TOP)
        vals.append("0")  # adaptation counter slot
        return ", ".join(vals)

    return re.sub(r"AOM_CDF(\d+)\s*\(([^)]*)\)", repl, init)


def find_initializer(text: str, start: int):
    """From index of '{', return (initializer_string, end_index_after)."""
    depth = 0
    i = start
    while i < len(text):
        c = text[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return text[start:i + 1], i + 1
        i += 1
    raise ValueError("unbalanced braces")


def parse_nested(init: str):
    py = init.replace("{", "[").replace("}", "]")
    py = re.sub(r",\s*\]", "]", py)
    return ast.literal_eval(py)


def pad_ragged(nested):
    """Zero-pad ragged innermost rows to a rectangular array.

    Needed for e.g. uv_mode_cdf where CFL-disallowed contexts have 13
    symbols and CFL-allowed have 14; trailing zeros are harmless in the
    inverted-CDF convention (symbol count is recoverable from the first
    zero entry).
    """
    def depth_widths(x, d, widths):
        if isinstance(x, list):
            widths.setdefault(d, 0)
            widths[d] = max(widths[d], len(x))
            for e in x:
                depth_widths(e, d + 1, widths)

    widths: dict = {}
    depth_widths(nested, 0, widths)

    def pad(x, d):
        if not isinstance(x, list):
            return x
        items = [pad(e, d + 1) for e in x]
        if items and isinstance(items[0], list):
            # pad child lists to global width at their depth
            w = widths[d + 1]
            items = [e + [0] * (w - len(e)) for e in items]
        return items

    return pad(nested, 0)


def extract_cdfs():
    text = strip_comments(open(f"{REF}/cabac_context_model.c").read())
    out = {}
    # declarations: [static] const AomCdfProb <name>[dims...] = { ... };
    for m in re.finditer(
            r"AomCdfProb\s+(\w+)\s*((?:\[[^\]]*\])+)\s*=\s*\{", text):
        name = m.group(1)
        init, _ = find_initializer(text, m.end() - 1)
        init = expand_cdf_macros(init)
        try:
            nested = parse_nested(init)
        except (ValueError, SyntaxError) as e:
            print(f"  SKIP {name}: {e}")
            continue
        arr = np.array(pad_ragged(nested), dtype=np.uint16)
        key = name
        for pre in ("svt_aom_default_", "av1_default_", "default_"):
            if key.startswith(pre):
                key = key[len(pre):]
                break
        out[key] = arr
        print(f"  {key}: {arr.shape}")
    return out


def extract_qlookup():
    text = strip_comments(open(f"{REF}/inv_transforms.c").read())
    out = {}
    for m in re.finditer(
            r"int16_t\s+((?:dc|ac)_qlookup(?:_10|_12)?_QTX)\s*\[[^\]]*\]\s*=\s*\{",
            text):
        name = m.group(1)
        init, _ = find_initializer(text, m.end() - 1)
        arr = np.array(parse_nested(init), dtype=np.int16)
        out[name.replace("_QTX", "").lower()] = arr
        print(f"  {name}: {arr.shape}")
    return out


def extract_scans():
    text = strip_comments(open(f"{REF}/coefficients.h").read())
    out = {}
    for m in re.finditer(
            r"DECLARE_ALIGNED\(\s*16\s*,\s*static\s+const\s+int16_t\s*,\s*"
            r"(\w+)\[(\d+)\]\)\s*=\s*\{", text):
        name, size = m.group(1), int(m.group(2))
        if "neighbors" in name:
            continue
        init, _ = find_initializer(text, m.end() - 1)
        arr = np.array(parse_nested(init), dtype=np.int16)
        assert arr.size == size, name
        out[name] = arr
        print(f"  {name}: {arr.shape}")
    return out


def extract_intra_tables():
    """sm_weight_arrays + dr_intra_derivative from intra_prediction.c
    (normative spec tables: Smooth_Weights / Dr_Intra_Derivative)."""
    text = strip_comments(open(f"{REF}/intra_prediction.c").read())
    out = {}
    for name, pat, dt in [
            ("sm_weight_arrays",
             r"const uint8_t sm_weight_arrays\[[^\]]*\]\s*=\s*\{", np.uint8),
            ("dr_intra_derivative",
             r"static const uint16_t eb_dr_intra_derivative\[90\]\s*=\s*\{",
             np.uint16)]:
        m = re.search(pat, text)
        init, _ = find_initializer(text, m.end() - 1)
        arr = np.array(parse_nested(init), dtype=dt)
        out[name] = arr
        print(f"  {name}: {arr.shape}")
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    print("CDFs:")
    cdfs = extract_cdfs()
    np.savez_compressed(os.path.join(OUT, "av1_default_cdfs.npz"), **cdfs)
    print("Quant:")
    q = extract_qlookup()
    np.savez_compressed(os.path.join(OUT, "av1_quant_tables.npz"), **q)
    print("Scans:")
    s = extract_scans()
    np.savez_compressed(os.path.join(OUT, "av1_scan_tables.npz"), **s)
    print("Intra:")
    it = extract_intra_tables()
    np.savez_compressed(os.path.join(OUT, "av1_intra_tables.npz"), **it)
    print(f"wrote {len(cdfs)} cdfs, {len(q)} quant tables, {len(s)} scans -> {OUT}")


if __name__ == "__main__":
    sys.exit(main())
