"""ctypes bridge to the reference SVT-AV1 scalar kernels, used as *test
oracles* only (bit-exactness ground truth).  No reference code is copied;
we call the compiled library built from /root/reference in /tmp —
build it with tools/build_oracle.sh (strips the hidden-visibility flag
so the internal kernels export).

Tests that use the oracle are skipped automatically when the library is
absent (e.g. on a fresh machine); golden vectors generated from the oracle
are committed under tests/golden/ so the core suite stays self-contained.
"""
from __future__ import annotations

import ctypes
import os
from functools import lru_cache

ORACLE_PATHS = [
    "/tmp/svtoracle/Bin/Release/libSvtAv1Enc.so",
    os.environ.get("SVT_ORACLE_LIB", ""),
]


@lru_cache(maxsize=1)
def load():
    for p in ORACLE_PATHS:
        if p and os.path.exists(p):
            lib = ctypes.CDLL(p)
            # bind the library's internal function-pointer tables
            # (svt_memcpy and the ~850 rtcd kernel pointers) — normally
            # done by svt_av1_enc_init; flags=0 selects the C kernels
            for setup in ("svt_aom_setup_common_rtcd_internal",
                          "svt_aom_setup_rtcd_internal"):
                try:
                    getattr(lib, setup)(ctypes.c_uint64(0))
                except AttributeError:
                    pass
            return lib
    return None


def available() -> bool:
    return load() is not None


class OdEcEnc(ctypes.Structure):
    # mirrors layout of OdEcEnc in bitstream_unit.h (buf, storage, offs,
    # precarry_buf, precarry_storage, low, rng, cnt, error [+ stats])
    _fields_ = [
        ("buf", ctypes.c_void_p),
        ("storage", ctypes.c_uint32),
        ("offs", ctypes.c_uint32),
        ("precarry_buf", ctypes.c_void_p),
        ("precarry_storage", ctypes.c_uint32),
        ("low", ctypes.c_uint32),
        ("rng", ctypes.c_int16),
        ("cnt", ctypes.c_int16),
        ("error", ctypes.c_int32),
        ("_pad", ctypes.c_uint8 * 64),  # slack for optional stats fields
    ]


class OracleRangeEncoder:
    """Reference range encoder via ctypes, mirror of our RangeEncoder API."""

    def __init__(self):
        self.lib = load()
        assert self.lib is not None
        self.enc = OdEcEnc()
        self.lib.svt_od_ec_enc_init(ctypes.byref(self.enc), 1 << 20)

    def encode_symbol(self, s: int, icdf) -> None:
        import numpy as np
        nsyms = len(icdf)
        while nsyms > 1 and icdf[nsyms - 1] == 0 and icdf[nsyms - 2] == 0:
            nsyms -= 1
        arr = (ctypes.c_uint16 * nsyms)(*[int(x) for x in icdf[:nsyms]])
        self.lib.svt_od_ec_encode_cdf_q15(ctypes.byref(self.enc), s, arr, nsyms)

    def encode_bool(self, val: int, f: int) -> None:
        self.lib.svt_od_ec_encode_bool_q15(ctypes.byref(self.enc), val, f)

    def done(self) -> bytes:
        nbytes = ctypes.c_uint32(0)
        fn = self.lib.svt_od_ec_enc_done
        fn.restype = ctypes.POINTER(ctypes.c_uint8)
        ptr = fn(ctypes.byref(self.enc), ctypes.byref(nbytes))
        return bytes(bytearray(ptr[i] for i in range(nbytes.value)))

    def __del__(self):
        # deliberately do NOT call svt_od_ec_enc_clear: freeing from a
        # teardown-ordered ctypes handle can corrupt the allocator at
        # interpreter exit; the small leak is test-only.
        pass
