"""Ruleset-parallel (expert-parallel analogue) scanning."""

import numpy as np
import jax.numpy as jnp
import pytest

from regex_fpga_tpu.models import nfa_scan
from regex_fpga_tpu.ops import build_nfa_tables
from regex_fpga_tpu.parallel import make_mesh
from regex_fpga_tpu.parallel.multi_ruleset import multi_ruleset_scan, stack_nfa_tables

from conftest import random_nfa


def test_multi_ruleset_exact(rng):
    auts = [random_nfa(rng, 20 + 7 * i, 150 + 20 * i, 3) for i in range(8)]
    stacked = stack_nfa_tables([build_nfa_tables(a) for a in auts])
    mesh = make_mesh(4, 2)
    stream = rng.integers(0, 256, size=1500).astype(np.uint8)
    counts = multi_ruleset_scan(mesh, stacked, jnp.asarray(stream))
    for i, aut in enumerate(auts):
        np.testing.assert_array_equal(
            np.asarray(counts[i])[: aut.num_states], nfa_scan(aut, stream)
        )


def test_stack_both_reference_rulesets(reference_available):
    from regex_fpga_tpu.utils import load_ruleset, load_trace_pair

    l7 = load_ruleset("l-7_filter")
    snort = load_ruleset("snort_16")
    # 8 rulesets (4 copies of each) over 8 devices
    stacked = stack_nfa_tables(
        [build_nfa_tables(l7), build_nfa_tables(snort)] * 4
    )
    assert stacked.num_states == 9514
    mesh = make_mesh(8, 1)
    lo, _ = load_trace_pair("l-7_filter", limit=3000)
    counts = multi_ruleset_scan(mesh, stacked, jnp.asarray(lo))
    np.testing.assert_array_equal(
        np.asarray(counts[0])[:2794], nfa_scan(l7, lo)
    )
    np.testing.assert_array_equal(
        np.asarray(counts[1])[:9514], nfa_scan(snort, lo)
    )
