"""Regression tests for code-review findings (round 1 review)."""

import numpy as np
import jax.numpy as jnp
import pytest

from regex_fpga_tpu import api
from regex_fpga_tpu.models import load_coe, nfa_scan
from regex_fpga_tpu.models.regex import RegexError, compile_pattern
from regex_fpga_tpu.ops import build_dfa_tables, dfa_scan_serial
from regex_fpga_tpu.ops.dfa_fast import dfa_scan_fast
from regex_fpga_tpu.utils.config import EngineConfig

from conftest import random_dfa_table


def test_fast_engine_exact_above_256_states(rng):
    """bf16 has a 7-bit mantissa: ids > 256 must ride in f32, not silently
    round (confirmed corruption pre-fix)."""
    s = 600
    table, accept = random_dfa_table(rng, s, 20)
    dt = build_dfa_tables(table, accept)
    stream = rng.integers(0, 256, size=4096).astype(np.uint8)
    classes = np.asarray(dt.class_of)[stream]
    res = dfa_scan_fast(dt, jnp.asarray(classes), num_blocks=16)
    ser = dfa_scan_serial(dt, jnp.asarray(stream))
    assert bool(res.converged)
    assert int(res.final_state) == int(ser.final_state)
    np.testing.assert_array_equal(np.asarray(res.match_mask), np.asarray(ser.match_mask))


def test_large_alternation_regex_exact():
    """An 80-word alternation compiles to >256 DFA states; counts must match
    a serial host walk exactly."""
    words = [f"w{i:03d}x".encode() for i in range(80)]
    pat = b"|".join(words)
    m = api.compile_regex(pat, config=EngineConfig(num_blocks=16))
    data = b" ".join(words[:20]) * 3 + b" w007x w019x"
    rep = m.scan(data)
    import re

    expect = len(re.findall(b"(?=(?:" + pat + b"))", data))
    assert rep.total == expect


def test_counts_mode_matches_full_mode(rng):
    table, accept = random_dfa_table(rng, 48, 6)
    dt = build_dfa_tables(table, accept)
    stream = rng.integers(0, 256, size=4096).astype(np.uint8)
    classes = jnp.asarray(np.asarray(dt.class_of)[stream])
    full = dfa_scan_fast(dt, classes, num_blocks=16)
    cnts = dfa_scan_fast(dt, classes, num_blocks=16, emit="counts")
    full_counts = np.bincount(
        np.asarray(full.states)[np.asarray(full.match_mask)],
        minlength=dt.num_states,
    )
    np.testing.assert_array_equal(np.asarray(cnts.counts), full_counts)
    assert int(cnts.final_state) == int(full.final_state)


def test_take_counts_final_byte_frontier_escape():
    """A chunk whose LAST transition lands on the unknown sentinel must be
    flagged (the sentinel must never leak into the carry)."""
    from regex_fpga_tpu.ops.dfa_take import dfa_scan_take_counts

    m1 = 4  # states 0..2 real, 3 = unknown
    table = np.zeros((1, m1), dtype=np.int32)
    table[0] = [1, 2, 3, 3]  # 0->1->2->unknown; unknown absorbing
    classes = jnp.zeros(3, jnp.int32)
    acc = jnp.zeros(m1, jnp.int32)
    r = dfa_scan_take_counts(jnp.asarray(table), classes, acc, num_blocks=1,
                             start=0, sync_overlap=0)
    assert bool(r.unknown_hit)


def test_lazy_checkpoint_portable_across_processes(reference_available):
    """Resume in a FRESH matcher (new interning order) must be exact."""
    import os

    from regex_fpga_tpu.utils import load_trace_pair, reference_root

    coe = os.path.join(reference_root(), "Block_Mem/CSR_BlockMem.coe")
    lo, _ = load_trace_pair("l-7_filter", limit=10_000)

    m1 = api.compile_ruleset(coe)
    sc = m1.stream_scanner()
    sc.feed(lo[:4_000])
    ckpt = sc.checkpoint()

    m2 = api.compile_ruleset(coe)  # fresh process simulation: new LazyDfa
    sc2 = m2.stream_scanner(resume=ckpt)
    sc2.feed(lo[4_000:])
    aut = load_coe(coe)
    np.testing.assert_array_equal(sc2.state_counts, nfa_scan(aut, lo))


def test_repeat_lower_bound_guard():
    with pytest.raises(RegexError, match="repeat bound"):
        compile_pattern(r"a{1000000,}")


def test_nfa_stream_scanner_empty_checkpoint_resume(reference_available):
    import os

    from regex_fpga_tpu.utils import load_trace_pair, reference_root

    coe = os.path.join(reference_root(), "Block_Mem/CSR_BlockMem.coe")
    m = api.compile_ruleset(coe, strategy="active-set")
    sc = m.stream_scanner()
    ckpt = sc.checkpoint()  # before any feed
    sc2 = m.stream_scanner(resume={k: v for k, v in ckpt.items() if v is not None})
    lo, _ = load_trace_pair("l-7_filter", limit=3_000)
    sc2.feed(lo)
    aut = load_coe(coe)
    np.testing.assert_array_equal(sc2.state_counts, nfa_scan(aut, lo))


def test_counts_mode_exact_beyond_f32_limit():
    """Per-state visit counts must stay exact past 2^24 visits of one state
    (f32 integer limit) — regression for the f32 accumulator."""
    import jax.numpy as jnp
    from regex_fpga_tpu.ops import build_dfa_tables
    from regex_fpga_tpu.ops.dfa_fast import chain_pass_counts

    # 2-state DFA: state 0 self-loops on class 0; state 0 accepting
    table = np.zeros((256, 2), dtype=np.int32)
    dt = build_dfa_tables(table, np.array([True, False]))
    nb, b = 4096, 8192  # 32Mi visits of state 0 > 2^24
    cls_seq = jnp.zeros((b, nb), jnp.int32)
    entries = jnp.zeros((nb,), jnp.int32)
    _, counts = chain_pass_counts(dt, cls_seq, entries)
    assert int(counts[0]) == nb * b, int(counts[0])


def test_escaped_high_byte_literal():
    """Escaped non-ASCII bytes are literals; only ASCII letter escapes are
    rejected as unsupported assertions."""
    from regex_fpga_tpu import api

    m = api.compile_regex(b"\\\xe9+")
    assert m.findall(b"abc\xe9\xe9def\xe9") == [b"\xe9\xe9", b"\xe9"]


def test_backtracker_make_match_under_empty_ban_keeps_groups():
    """Advisor r5 finding 3: a finditer span produced under the 3.7+
    empty-match ban must still carry capture groups — _make_match
    re-runs with ban_empty when the unbanned engine prefers the empty
    match."""
    import re as _re

    import regex_fpga_tpu.re_compat as rc

    pat = rb"(a)?(?(1)|(b)??)"
    ours = [(m.span(), m.groups(), m.lastindex)
            for m in rc.compile(pat).finditer(b"b")]
    ref = [(m.span(), m.groups(), m.lastindex)
           for m in _re.finditer(pat, b"b")]
    assert ours == ref  # incl. ((0,1), (None, b'b'), 2)
