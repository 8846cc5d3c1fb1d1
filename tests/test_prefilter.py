"""Literal-prefiltered regex sets: required_literal soundness + matcher
equivalence with the unfiltered ruleset path."""

import re as pyre

import numpy as np
import pytest

from regex_fpga_tpu.api import compile_regex_set, compile_regex_set_prefiltered
from regex_fpga_tpu.models.regex import parse_pattern, required_literal

PATTERNS = [
    rb"error[0-9]+",
    rb"GET /[a-z]+ HTTP",
    rb"(foo)+bar",
    rb"admin|root",          # no literal -> always-check
    rb"x*needle[abc]?",
    rb"(ab|cd)efgh",
    rb"se\+rial{2}",
]


def test_required_literal_examples():
    cases = {
        rb"error[0-9]+": b"error",
        rb"abc": b"abc",
        rb"a|b": None,
        rb"(?i)select": None,       # folded letters have 2-byte classes
        rb"(?i)a42b": b"42",
        rb"(foo){2}": b"foofoo",
        rb"x*needle[abc]?": b"needle",
        rb"a[xy]bcd": b"bcd",
        rb"(ab|cd)efgh": b"efgh",
        rb"a{0,3}": None,
        rb"(?:ab)cdef(?:g|h)": b"abcdef",
    }
    for pat, want in cases.items():
        assert required_literal(parse_pattern(pat).node) == want, pat


@pytest.mark.parametrize("pat", [p for p in PATTERNS] + [
    rb"\d+\.\d+", rb"[A-Z][a-z]+ [0-9]{4}", rb"a(bc|bd)e", rb"(?s)key=.value",
])
def test_required_literal_soundness_vs_python_re(pat, rng):
    """Every match Python re finds must CONTAIN the claimed literal."""
    lit = required_literal(parse_pattern(pat).node)
    if lit is None:
        return
    # random text salted with fragments likely to produce matches
    salt = b" error42 GET /abc HTTP foobar needleb cdefgh se+riall 3.14 " \
           b"Word 2024 abde key=xvalue "
    blob = bytes(rng.integers(32, 127, size=3000, dtype=np.int64)) + salt * 20
    py = pat.replace(rb"(?s)", b"(?s)")  # same syntax in python re
    for m in pyre.finditer(py, blob):
        assert lit in m.group(0), (pat, lit, m.group(0))


def test_prefiltered_counts_equal_unfiltered(rng):
    full = compile_regex_set(PATTERNS)
    pre = compile_regex_set_prefiltered(PATTERNS)
    assert pre.num_prefiltered == len(PATTERNS) - 1  # admin|root unfiltered
    streams = [
        b"error42 and foofoobar plus needlec",
        bytes(rng.integers(32, 127, size=5000, dtype=np.int64)),
        b"GET /index HTTP/1.0 admin cdefgh",
        b"nothing interesting here at all",
        b"se+riall se+rialll root",
    ]
    want = full.scan(streams).rule_counts
    got = pre.scan(streams).rule_counts
    np.testing.assert_array_equal(got, want)
    # pruning really happened: no sub-ruleset contains every rule
    assert all(len(k) < len(PATTERNS) for k in pre._subs)


def test_prefiltered_all_literals_absent():
    pre = compile_regex_set_prefiltered([rb"zebra[0-9]", rb"quagga!"])
    rep = pre.scan([b"plain text", b"more plain text"])
    assert rep.rule_counts.sum() == 0
    assert not pre._subs  # no sub-ruleset was ever compiled


def test_prefiltered_no_literal_patterns_only():
    pre = compile_regex_set_prefiltered([rb"a|b"])
    rep = pre.scan([b"xxx a yyy", b"zzz"])
    full = compile_regex_set([rb"a|b"]).scan([b"xxx a yyy", b"zzz"])
    np.testing.assert_array_equal(rep.rule_counts, full.rule_counts)


def test_prefiltered_subset_cache_cap_falls_back_to_full():
    """ADVICE r2: the subset cache is LRU-capped — past the cap, streams
    scan against the FULL ruleset (sound superset) with candidate columns
    sliced, and counts stay identical to the unfiltered matcher."""
    pats = [bytes(f"needle{i}x[0-9]", "ascii") for i in range(6)]
    pre = compile_regex_set_prefiltered(pats, min_literal=3)
    pre.max_cached_subsets = 2
    full = compile_regex_set(pats)
    streams = [
        b"needle0x5 only",
        b"needle1x7 only",
        b"needle2x9 and needle3x1",
        b"needle4x2 needle5x3 needle0x0",
        b"no needles at all......",
    ]
    got = pre.scan(streams).rule_counts
    want = full.scan(streams).rule_counts
    np.testing.assert_array_equal(got, want)
    assert len(pre._subs) <= 2          # cap respected
    assert pre._full is not None        # fallback actually exercised
