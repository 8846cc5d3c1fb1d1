"""DFA engines vs oracle: serial, blocked at all seam alignments, composition."""

import numpy as np
import jax.numpy as jnp
import pytest

from regex_fpga_tpu.models import dfa_scan_counts
from regex_fpga_tpu.ops import (
    block_entry_states,
    block_transition_functions,
    build_dfa_tables,
    compose,
    dfa_scan_blocked,
    dfa_scan_serial,
)

from conftest import random_dfa_table


def test_compose_associative(rng):
    s = 64
    f, g, h = (rng.integers(0, s, size=(3, s), dtype=np.int64).astype(np.int32))
    f, g, h = map(jnp.asarray, (f, g, h))
    lhs = compose(compose(f, g), h)
    rhs = compose(f, compose(g, h))
    np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_serial_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    table, accept = random_dfa_table(rng, 32, 4)
    dt = build_dfa_tables(table, accept)
    stream = rng.integers(0, 256, size=4096).astype(np.uint8)
    res = dfa_scan_serial(dt, jnp.asarray(stream))
    np.testing.assert_array_equal(np.asarray(res.counts), dfa_scan_counts(table, accept, stream))


@pytest.mark.parametrize("block_size", [1, 2, 64, 128, 1024, 4096])
def test_blocked_all_seams(rng, block_size):
    """Seams at every alignment (SURVEY.md SS7.4 item 1) — blocked == serial."""
    table, accept = random_dfa_table(rng, 48, 6)
    dt = build_dfa_tables(table, accept)
    stream = rng.integers(0, 256, size=4096).astype(np.uint8)
    serial = dfa_scan_serial(dt, jnp.asarray(stream))
    blocked = dfa_scan_blocked(dt, jnp.asarray(stream), block_size=block_size)
    np.testing.assert_array_equal(np.asarray(blocked.counts), np.asarray(serial.counts))
    assert int(blocked.final_state) == int(serial.final_state)
    np.testing.assert_array_equal(np.asarray(blocked.match_mask), np.asarray(serial.match_mask))


def test_block_functions_compose_to_full_function(rng):
    """Property: composed block functions == brute-force full-stream function."""
    table, accept = random_dfa_table(rng, 16, 0)
    dt = build_dfa_tables(table, accept)
    stream = rng.integers(0, 256, size=256).astype(np.uint8)
    classes = np.asarray(dt.class_of)[stream].reshape(4, 64)
    fns = block_transition_functions(dt, jnp.asarray(classes))
    full = jnp.arange(16, dtype=jnp.int32)
    for n in range(4):
        full = compose(full, fns[n])
    # brute force from every start state
    expect = np.arange(16)
    for ch in stream:
        expect = table[ch][expect]
    np.testing.assert_array_equal(np.asarray(full), expect)


def test_entry_states(rng):
    table, accept = random_dfa_table(rng, 16, 0)
    dt = build_dfa_tables(table, accept)
    stream = rng.integers(0, 256, size=512).astype(np.uint8)
    classes = np.asarray(dt.class_of)[stream].reshape(8, 64)
    fns = block_transition_functions(dt, jnp.asarray(classes))
    entry, final = block_entry_states(fns, start=3)
    # serial reference
    s = 3
    expect_entries = []
    for n in range(8):
        expect_entries.append(s)
        for ch in stream[n * 64 : (n + 1) * 64]:
            s = int(table[ch][s])
    np.testing.assert_array_equal(np.asarray(entry), expect_entries)
    assert int(final) == s


def test_byte_class_compression_roundtrip(rng):
    """class_of + compressed table reproduce the 256-wide table exactly."""
    table, accept = random_dfa_table(rng, 16, 2)
    dt = build_dfa_tables(table, accept)
    t = np.asarray(dt.table)
    cls = np.asarray(dt.class_of)
    np.testing.assert_array_equal(t[cls], table)
