"""Golden-oracle tests: conformance ground truth + invariants (SURVEY.md SS4.2)."""

import numpy as np
import pytest

from regex_fpga_tpu.models import dfa_scan_counts, dfa_step_table, nfa_scan, nfa_scan_trace
from regex_fpga_tpu.utils import load_ruleset, load_trace_pair

from conftest import random_dfa_table

# (ruleset, stream) -> {state: count}; SURVEY.md SS4.2 / BASELINE.md
GOLDEN = {
    ("l-7_filter", "lo"): {443: 1, 840: 1, 1109: 1, 1386: 1, 1444: 1, 1670: 1, 2201: 1},
    ("l-7_filter", "hi"): {443: 3, 1386: 1, 2575: 1},
}
GOLDEN_TOTALS = {
    ("l-7_filter", "lo"): 7,
    ("l-7_filter", "hi"): 5,
    ("snort_16", "lo"): 13,
    ("snort_16", "hi"): 678,
}
GOLDEN_DISTINCT = {
    ("l-7_filter", "lo"): 7,
    ("l-7_filter", "hi"): 3,
    ("snort_16", "lo"): 12,
    ("snort_16", "hi"): 535,
}
# spot counts for snort_16/hi (BASELINE.md)
SNORT_HI_SPOT = {3941: 55, 8964: 52, 200: 20, 2831: 7, 4835: 5, 4349: 4}


@pytest.mark.slow
@pytest.mark.parametrize("name", ["l-7_filter", "snort_16"])
def test_oracle_conformance(reference_available, name):
    aut = load_ruleset(name)
    lo, hi = load_trace_pair(name)
    for sname, stream in [("lo", lo), ("hi", hi)]:
        counts = nfa_scan(aut, stream)
        key = (name, sname)
        assert int(counts.sum()) == GOLDEN_TOTALS[key]
        assert int((counts > 0).sum()) == GOLDEN_DISTINCT[key]
        if key in GOLDEN:
            assert {int(i): int(c) for i, c in enumerate(counts) if c} == GOLDEN[key]
        if key == ("snort_16", "hi"):
            for state, c in SNORT_HI_SPOT.items():
                assert int(counts[state]) == c


@pytest.mark.slow
def test_active_set_invariants(reference_available):
    # active set never empties and stays small (SURVEY.md SS4.2)
    aut = load_ruleset("l-7_filter")
    lo, _ = load_trace_pair("l-7_filter", limit=20_000)
    hist = nfa_scan_trace(aut, lo)
    sizes = [len(s) for s in hist]
    assert min(sizes) >= 1
    assert max(sizes) <= 9


def test_dfa_oracle_matches_nfa_oracle_on_dfa(rng):
    """A deterministic CsrAutomaton gives identical counts via both oracles."""
    from regex_fpga_tpu.models import CsrAutomaton

    # build a small random DFA in CSR form: 8 states, state 7 accepting
    n = 8
    chars, targets, offsets = [], [], [0]
    for s in range(n):
        if s == 7:
            offsets.append(offsets[-1])
            continue
        labels = rng.choice(256, size=5, replace=False)
        for c in sorted(labels.tolist()):
            chars.append(c)
            targets.append(int(rng.integers(0, n)))
        offsets.append(len(chars))
    aut = CsrAutomaton(
        offsets=np.array(offsets, dtype=np.int64),
        trans_char=np.array(chars, dtype=np.uint8),
        trans_target=np.array(targets, dtype=np.int32),
    )
    assert aut.is_dfa()
    stream = rng.integers(0, 256, size=3000, dtype=np.int64).astype(np.uint8)
    nfa_counts = nfa_scan(aut, stream)

    table = dfa_step_table(aut)  # adds dead state N
    accept = np.concatenate([aut.accept_mask, [False]])
    dfa_counts = dfa_scan_counts(table, accept, stream)
    np.testing.assert_array_equal(dfa_counts[: aut.num_states], nfa_counts)


def test_dfa_scan_counts_final_char_not_counted(rng):
    table, accept = random_dfa_table(rng, 16, 3)
    stream = rng.integers(0, 256, size=100, dtype=np.int64).astype(np.uint8)
    counts_full = dfa_scan_counts(table, accept, stream)
    # appending one char can only add the accept entered by the last char
    counts_plus = dfa_scan_counts(table, accept, np.concatenate([stream, stream[:1]]))
    assert counts_plus.sum() - counts_full.sum() in (0, 1)
