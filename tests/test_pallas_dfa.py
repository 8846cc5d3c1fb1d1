"""Pallas chain-pass kernel vs the jnp reference implementation.

Off-TPU these run the Pallas interpreter (same kernel logic, exact shapes);
the compiled path is exercised on hardware by bench.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from regex_fpga_tpu.ops import build_dfa_tables, dfa_scan_serial
from regex_fpga_tpu.ops.dfa_fast import chain_pass_full, dfa_scan_fast
from regex_fpga_tpu.ops.pallas_dfa import (
    LANE_TILE,
    chain_pass_finals_pallas,
    chain_pass_full_pallas,
)

from conftest import random_dfa_table


@pytest.mark.parametrize("seed,s", [(0, 48), (1, 23), (2, 128)])
def test_chain_pass_pallas_vs_reference(seed, s):
    rng = np.random.default_rng(seed)
    table, accept = random_dfa_table(rng, s, max(2, s // 10))
    dt = build_dfa_tables(table, accept)
    b, nb = 128, 2 * LANE_TILE
    cls_seq = jnp.asarray(rng.integers(0, dt.num_classes, size=(b, nb), dtype=np.int32))
    entries = jnp.asarray(rng.integers(0, s, size=(nb,), dtype=np.int32))

    f_ref, st_ref, acc_ref = chain_pass_full(dt, cls_seq, entries)
    f_p, st_p, acc_p = chain_pass_full_pallas(dt, cls_seq, entries)
    np.testing.assert_array_equal(np.asarray(f_p), np.asarray(f_ref))
    np.testing.assert_array_equal(np.asarray(st_p), np.asarray(st_ref))
    np.testing.assert_array_equal(np.asarray(acc_p), np.asarray(acc_ref))

    f_only = chain_pass_finals_pallas(dt, cls_seq, entries)
    np.testing.assert_array_equal(np.asarray(f_only), np.asarray(f_ref))


def test_dfa_scan_fast_pallas_end_to_end(rng):
    table, accept = random_dfa_table(rng, 32, 4)
    dt = build_dfa_tables(table, accept)
    stream = rng.integers(0, 256, size=LANE_TILE * 128).astype(np.uint8)
    classes = np.asarray(dt.class_of)[stream]
    res = dfa_scan_fast(
        dt, jnp.asarray(classes), num_blocks=LANE_TILE, use_pallas=True
    )
    ser = dfa_scan_serial(dt, jnp.asarray(stream))
    assert bool(res.converged)
    assert int(res.final_state) == int(ser.final_state)
    np.testing.assert_array_equal(np.asarray(res.match_mask), np.asarray(ser.match_mask))


def test_chain_pass_counts_pallas_vs_reference(rng):
    from regex_fpga_tpu.ops.dfa_fast import chain_pass_counts
    from regex_fpga_tpu.ops.pallas_dfa import chain_pass_counts_pallas

    table, accept = random_dfa_table(rng, 48, 6)
    dt = build_dfa_tables(table, accept)
    b, nb = 128, 2 * LANE_TILE
    cls_seq = jnp.asarray(
        rng.integers(0, dt.num_classes, size=(b, nb), dtype=np.int32)
    )
    entries = jnp.asarray(rng.integers(0, 48, size=(nb,), dtype=np.int32))
    f_ref, c_ref = chain_pass_counts(dt, cls_seq, entries)
    f_p, c_p = chain_pass_counts_pallas(dt, cls_seq, entries)
    np.testing.assert_array_equal(np.asarray(f_p), np.asarray(f_ref))
    np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_ref))
