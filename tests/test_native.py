"""Native (C++) golden scanners vs Python oracles."""

import numpy as np
import pytest

from regex_fpga_tpu.models import dfa_scan_counts, nfa_scan
from regex_fpga_tpu.ops import build_dfa_tables, build_nfa_tables
from regex_fpga_tpu.utils import load_ruleset, load_trace_pair
from regex_fpga_tpu.utils.native import (
    dfa_scan_native,
    native_available,
    nfa_scan_native,
)

from conftest import random_dfa_table, random_nfa

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def test_nfa_native_random(rng):
    aut = random_nfa(rng, n_states=50, n_edges=400, n_accept=5)
    t = build_nfa_tables(aut)
    stream = rng.integers(0, 256, size=5000).astype(np.uint8)
    counts, _ = nfa_scan_native(
        np.asarray(t.delta), np.asarray(t.class_of), np.asarray(t.accept), stream
    )
    np.testing.assert_array_equal(counts[: aut.num_states], nfa_scan(aut, stream))


def test_nfa_native_resume(rng):
    aut = random_nfa(rng, n_states=30, n_edges=250, n_accept=3)
    t = build_nfa_tables(aut)
    d, c, a = np.asarray(t.delta), np.asarray(t.class_of), np.asarray(t.accept)
    stream = rng.integers(0, 256, size=4000).astype(np.uint8)
    whole, _ = nfa_scan_native(d, c, a, stream)
    c1, act = nfa_scan_native(d, c, a, stream[:1500])
    c2, _ = nfa_scan_native(d, c, a, stream[1500:], active=act, counts=c1)
    np.testing.assert_array_equal(c2, whole)


@pytest.mark.slow
def test_nfa_native_full_conformance(reference_available):
    aut = load_ruleset("snort_16")
    t = build_nfa_tables(aut)
    d, c, a = np.asarray(t.delta), np.asarray(t.class_of), np.asarray(t.accept)
    lo, hi = load_trace_pair("snort_16")
    counts, _ = nfa_scan_native(d, c, a, lo)
    np.testing.assert_array_equal(counts[: aut.num_states], nfa_scan(aut, lo))
    counts, _ = nfa_scan_native(d, c, a, hi)
    np.testing.assert_array_equal(counts[: aut.num_states], nfa_scan(aut, hi))


def test_dfa_native_random(rng):
    table, accept = random_dfa_table(rng, 64, 5)
    dt = build_dfa_tables(table, accept)
    stream = rng.integers(0, 256, size=30_000).astype(np.uint8)
    counts, mask, final = dfa_scan_native(
        np.asarray(dt.table), np.asarray(dt.class_of), np.asarray(dt.accept), stream
    )
    np.testing.assert_array_equal(counts, dfa_scan_counts(table, accept, stream))
    assert mask.sum() == counts.sum()


def test_nfa_native_overflow():
    from regex_fpga_tpu.models import CsrAutomaton

    rng = np.random.default_rng(0)
    n, per_state = 40, 6
    aut = CsrAutomaton(
        offsets=np.arange(n + 1, dtype=np.int64) * per_state,
        trans_char=rng.integers(0, 2, size=n * per_state).astype(np.uint8),
        trans_target=rng.integers(0, n, size=n * per_state).astype(np.int32),
    )
    t = build_nfa_tables(aut)
    stream = rng.integers(0, 2, size=50).astype(np.uint8)
    with pytest.raises(RuntimeError, match="capacity"):
        nfa_scan_native(
            np.asarray(t.delta), np.asarray(t.class_of), np.asarray(t.accept),
            stream, active_cap=4,
        )


def test_anchored_spans_native_vs_python(rng):
    """Native finditer forward stage == the Python reference loop."""
    from regex_fpga_tpu.api import compile_regex
    from regex_fpga_tpu.utils.native import anchored_spans_native

    for pattern in (r"ab+c", r"[0-9]+(\.[0-9]+)?", r"(foo|foobar)", r"x*",
                    r"a[bc]*d$"):
        m = compile_regex(pattern)
        m._ensure_anchored()
        table, accept, dead, accept_eof = m._anchored_np
        corpus = bytes(rng.integers(0, 256, size=4000, dtype=np.int64) % 256)
        corpus += b" abc abbbc 12.5 7 foobar foo xxxx abcd ad a"
        stream = np.frombuffer(corpus, dtype=np.uint8)
        starts = np.arange(len(stream), dtype=np.int64)  # every offset
        got = anchored_spans_native(
            table, accept, accept_eof, m._anchored_start, dead, stream, starts
        )
        # Python reference: the suppression loop with _anchored_longest_end
        spans, p = [], 0
        for s0 in starts:
            if s0 < p:
                continue
            e = m._anchored_longest_end(stream, int(s0))
            if e >= 0:
                spans.append((int(s0), e))
                p = max(e, int(s0) + 1)
        assert [(int(a), int(b)) for a, b in got] == spans, pattern


def test_nfa_match_positions_native_vs_oracle(rng):
    from regex_fpga_tpu.models.oracle import nfa_scan_trace
    from regex_fpga_tpu.utils.native import nfa_match_positions_native

    aut = random_nfa(rng, n_states=40, n_edges=300, n_accept=6)
    t = build_nfa_tables(aut)
    stream = rng.integers(0, 256, size=4000).astype(np.uint8)
    got = nfa_match_positions_native(
        np.asarray(t.delta), np.asarray(t.class_of), np.asarray(t.accept), stream
    )
    hist = nfa_scan_trace(aut, stream)
    acc = aut.accept_mask
    want = [i for i, states in enumerate(hist[:-1])
            if any(acc[s] for s in states)]
    assert got.tolist() == want


def test_finditer_match_dense_native_speed():
    """Match-dense corpus: the native forward stage keeps finditer at
    native-walk speed (the old per-byte Python loop ran ~1 MB/s)."""
    import time

    from regex_fpga_tpu.api import compile_regex

    m = compile_regex(r"[a-z]+")
    corpus = (b"lorem ipsum dolor sit amet 42 " * 140000)[: 4 << 20]  # 4 MiB
    t0 = time.perf_counter()
    spans = m.finditer(corpus)
    dt = time.perf_counter() - t0
    assert len(spans) == sum(1 for _ in __import__("re").finditer(rb"[a-z]+", corpus))
    # ~0.6 MB of matches/span work; native walk does this in well under 2 s
    assert dt < 10.0, f"finditer took {dt:.1f}s on 4 MiB match-dense corpus"


def test_native_walkers_reject_out_of_domain_table():
    """r4 review finding 4: the host-routed scan path must keep the §5.2
    domain guard — a corrupt table raises instead of walking off the
    arrays in C."""
    import numpy as np
    import pytest

    from regex_fpga_tpu.utils.native import (
        dfa_scan_multi_native, dfa_scan_native, native_available,
    )

    if not native_available():
        pytest.skip("native lib required")
    s = 8
    table = np.zeros((4, s), dtype=np.int32)
    table[2, 3] = s + 5  # out of domain
    cls = np.zeros(256, dtype=np.int32)
    acc = np.zeros(s, dtype=np.uint8)
    data = np.zeros(16, dtype=np.uint8)
    with pytest.raises(RuntimeError, match="out-of-domain"):
        dfa_scan_native(table, cls, acc, data)
    with pytest.raises(RuntimeError, match="out-of-domain"):
        dfa_scan_multi_native(table, cls, acc, [data])


def test_speculative_single_stream_scan_exact():
    """Host speculative segmented scan (device seam trick mirrored):
    exact vs the serial walk on random automata, odd sizes, and the
    non-synchronizing parity automaton (serial fallback)."""
    import numpy as np
    import pytest

    from regex_fpga_tpu.utils.native import (
        dfa_scan_native, dfa_scan_speculative_native, native_available,
    )

    if not native_available():
        pytest.skip("native lib required")
    rng = np.random.default_rng(9)
    s = 97
    table = rng.integers(0, s, size=(12, s)).astype(np.int32)
    cls = rng.integers(0, 12, size=256).astype(np.int32)
    acc = (rng.random(s) < 0.2).astype(np.uint8)
    for ln in (0, 1, 63, 4096, 99_991):
        x = rng.integers(0, 256, ln, dtype=np.int64).astype(np.uint8)
        c1, _, f1 = dfa_scan_native(table, cls, acc, x, want_mask=False)
        c2, f2 = dfa_scan_speculative_native(table, cls, acc, x,
                                             segments=8, overlap=16)
        np.testing.assert_array_equal(c1, c2)
        assert f1 == f2, ln
    # parity automaton never synchronizes: the fixpoint cannot close and
    # the serial fallback must produce identical results
    pt = np.array([[1, 0]], np.int32)
    pc = np.zeros(256, np.int32)
    pa = np.array([0, 1], np.uint8)
    x = np.zeros(50_001, np.uint8)
    c1, _, f1 = dfa_scan_native(pt, pc, pa, x, want_mask=False)
    c2, f2 = dfa_scan_speculative_native(pt, pc, pa, x, segments=8,
                                         overlap=16)
    np.testing.assert_array_equal(c1, c2)
    assert f1 == f2
