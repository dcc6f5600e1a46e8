#!/usr/bin/env python
"""Generate tests/golden/*.npz from the reference oracle build.

Run on a machine with the compiled reference library (tests/oracle.py
paths).  The outputs are spec-fixed — they are committed and never need
regeneration unless new cases are added."""
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import golden_defs as gd  # noqa: E402
import oracle  # noqa: E402


def main():
    lib = oracle.load()
    assert lib is not None, "reference oracle library not found"
    os.makedirs(gd.GOLDEN_DIR, exist_ok=True)

    inv = {}
    for tx_size, tx_type, bd in gd.inv_txfm_cases():
        coeffs, pred = gd.inv_txfm_input(tx_size, tx_type, bd)
        out = gd.oracle_inv_txfm(lib, coeffs, pred, tx_size, tx_type, bd)
        inv[f"s{tx_size}_t{tx_type}_b{bd}"] = out.astype(np.uint16)
    np.savez_compressed(os.path.join(gd.GOLDEN_DIR, "inv_txfm.npz"), **inv)
    print(f"inv_txfm: {len(inv)} cases")

    intra = {}
    for mode in sorted(gd.intra_ref_names()):
        for (w, h) in gd.INTRA_SIZES:
            intra[f"m{mode}_{w}x{h}"] = gd.oracle_intra(lib, mode, w, h)
    np.savez_compressed(os.path.join(gd.GOLDEN_DIR, "intra.npz"), **intra)
    print(f"intra: {len(intra)} cases")

    rc = {}
    for seed in range(4):
        enc = oracle.OracleRangeEncoder()
        for op in gd.range_coder_ops(seed):
            if op[0] == "bool":
                enc.encode_bool(op[1], op[2])
            else:
                enc.encode_symbol(op[1], op[2])
        rc[f"seq{seed}"] = np.frombuffer(enc.done(), dtype=np.uint8)
    np.savez_compressed(os.path.join(gd.GOLDEN_DIR, "range_coder.npz"),
                        **rc)
    print(f"range_coder: {len(rc)} sequences")


if __name__ == "__main__":
    main()
