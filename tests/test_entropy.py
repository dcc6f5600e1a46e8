"""Range coder tests: round-trip self-consistency and bit-exactness vs the
reference od_ec encoder (oracle)."""
import numpy as np
import pytest

from svt_av1_tpu.codec.entropy import (
    CDF_PROB_TOP, RangeDecoder, RangeEncoder, update_cdf)

import oracle


def random_icdf(rng, nsyms):
    """Random valid inverted CDF with nsyms symbols (+ counter slot)."""
    cuts = np.sort(rng.choice(np.arange(1, CDF_PROB_TOP), size=nsyms - 1,
                              replace=False))
    icdf = np.zeros(nsyms + 1, dtype=np.uint16)
    # CDF_PROB_TOP minus ascending cut points => strictly decreasing icdf
    icdf[: nsyms - 1] = (CDF_PROB_TOP - cuts).astype(np.uint16)
    icdf[nsyms - 1] = 0
    icdf[nsyms] = 0
    return icdf


def make_stream(seed, n=2000):
    rng = np.random.default_rng(seed)
    events = []
    for _ in range(n):
        kind = rng.integers(0, 3)
        if kind == 0:  # symbol
            nsyms = int(rng.integers(2, 17))
            icdf = random_icdf(rng, nsyms)
            s = int(rng.integers(0, nsyms))
            events.append(("sym", s, icdf))
        elif kind == 1:  # bool
            f = int(rng.integers(1, CDF_PROB_TOP - 1))
            b = int(rng.integers(0, 2))
            events.append(("bool", b, f))
        else:  # literal
            bits = int(rng.integers(1, 17))
            v = int(rng.integers(0, 1 << bits))
            events.append(("lit", v, bits))
    return events


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_roundtrip(seed):
    events = make_stream(seed)
    enc = RangeEncoder()
    for kind, a, b in events:
        if kind == "sym":
            enc.encode_symbol(a, b)
        elif kind == "bool":
            enc.encode_bool(a, b)
        else:
            enc.encode_literal(a, b)
    data = enc.done()
    assert len(data) > 0
    dec = RangeDecoder(data)
    for kind, a, b in events:
        if kind == "sym":
            assert dec.read_symbol(b) == a
        elif kind == "bool":
            assert dec.read_bool(b) == a
        else:
            assert dec.read_literal(b) == a


@pytest.mark.parametrize("seed", [10, 11])
def test_roundtrip_with_cdf_update(seed):
    """Adaptive CDFs: encoder and decoder must stay in lockstep."""
    rng = np.random.default_rng(seed)
    nsyms = 4
    base = random_icdf(rng, nsyms)
    syms = rng.integers(0, nsyms, size=3000)

    enc = RangeEncoder()
    cdf_e = base.copy()
    for s in syms:
        enc.encode_symbol(int(s), cdf_e)
        update_cdf(cdf_e, int(s), nsyms)
    data = enc.done()

    dec = RangeDecoder(data)
    cdf_d = base.copy()
    for s in syms:
        got = dec.read_symbol(cdf_d)
        assert got == int(s)
        update_cdf(cdf_d, got, nsyms)


@pytest.mark.skipif(not oracle.available(), reason="reference oracle not built")
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 7])
def test_bitexact_vs_reference(seed):
    """Our encoder must emit byte-identical output to the reference od_ec."""
    events = make_stream(seed)
    ours = RangeEncoder()
    ref = oracle.OracleRangeEncoder()
    for kind, a, b in events:
        if kind == "sym":
            ours.encode_symbol(a, b)
            ref.encode_symbol(a, b)
        elif kind == "bool":
            ours.encode_bool(a, b)
            ref.encode_bool(a, b)
        else:
            ours.encode_literal(a, b)
            for i in range(b - 1, -1, -1):
                ref.encode_bool((a >> i) & 1, 16384)
    ours_bytes = ours.done()
    ref_bytes = ref.done()
    assert ours_bytes == ref_bytes


def test_empty_stream():
    enc = RangeEncoder()
    data = enc.done()
    # A stream with no symbols still terminates decodably.
    dec = RangeDecoder(data)
    assert dec.read_literal(0) == 0
