"""Tensor-parallel (state-sharded) NFA scan vs the unsharded engine/oracle."""

import numpy as np
import pytest

from conftest import random_nfa


def _oracle_counts(aut, stream):
    from regex_fpga_tpu.models import nfa_scan

    return nfa_scan(aut, stream)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2)])
def test_tp_matches_oracle_random(mesh_shape):
    import jax.numpy as jnp

    from regex_fpga_tpu.ops import build_nfa_tables
    from regex_fpga_tpu.parallel import make_tp_mesh, nfa_scan_tp

    rng = np.random.default_rng(7)
    aut = random_nfa(rng, n_states=61, n_edges=500, n_accept=6)
    tables = build_nfa_tables(aut)
    n_data, n_model = mesh_shape
    mesh = make_tp_mesh(n_model=n_model, n_data=n_data)

    batch = 2 * n_data
    streams = rng.integers(0, 256, size=(batch, 300)).astype(np.uint8)
    counts, finals = nfa_scan_tp(mesh, tables, jnp.asarray(streams))
    counts = np.asarray(counts)
    assert counts.shape == (batch, aut.num_states)
    for b in range(batch):
        expect = _oracle_counts(aut, streams[b])
        np.testing.assert_array_equal(counts[b], expect)


def test_tp_final_bitmap_matches_active_list():
    import jax.numpy as jnp

    from regex_fpga_tpu.ops import build_nfa_tables, nfa_scan_jax
    from regex_fpga_tpu.parallel import make_tp_mesh, nfa_scan_tp

    rng = np.random.default_rng(3)
    aut = random_nfa(rng, n_states=40, n_edges=300, n_accept=4)
    tables = build_nfa_tables(aut)
    mesh = make_tp_mesh(n_model=8)
    stream = rng.integers(0, 256, size=(1, 200)).astype(np.uint8)

    counts, finals = nfa_scan_tp(mesh, tables, jnp.asarray(stream))
    res = nfa_scan_jax(tables, jnp.asarray(stream[0]))
    active = np.asarray(res.final_active)
    active = set(active[active < aut.num_states].tolist())
    bitmap = np.asarray(finals[0])[: aut.num_states]
    assert set(np.nonzero(bitmap)[0].tolist()) == active
    np.testing.assert_array_equal(np.asarray(counts[0]), np.asarray(res.counts))


def test_tp_chunked_resume():
    import jax.numpy as jnp

    from regex_fpga_tpu.ops import build_nfa_tables
    from regex_fpga_tpu.parallel import make_tp_mesh, nfa_scan_tp

    rng = np.random.default_rng(11)
    aut = random_nfa(rng, n_states=30, n_edges=260, n_accept=3)
    tables = build_nfa_tables(aut)
    mesh = make_tp_mesh(n_model=4, n_data=2)
    streams = rng.integers(0, 256, size=(2, 400)).astype(np.uint8)

    whole, _ = nfa_scan_tp(mesh, tables, jnp.asarray(streams))
    c1, bm1 = nfa_scan_tp(mesh, tables, jnp.asarray(streams[:, :150]))
    c2, _ = nfa_scan_tp(
        mesh,
        tables,
        jnp.asarray(streams[:, 150:]),
        start_bitmap=bm1,
        counts_init=c1,
    )
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(whole))


def test_tp_ruleset_prefix_vs_oracle(reference_available):
    """Real l-7_filter ruleset, truncated stream, bit-exact vs the oracle."""
    import os

    import jax.numpy as jnp

    from regex_fpga_tpu.models import load_coe, nfa_scan
    from regex_fpga_tpu.ops import build_nfa_tables
    from regex_fpga_tpu.parallel import make_tp_mesh, nfa_scan_tp
    from regex_fpga_tpu.utils import load_trace_pair

    aut = load_coe(
        os.path.join(reference_available, "Block_Mem/CSR_BlockMem.coe")
    )
    tables = build_nfa_tables(aut)
    lo, hi = load_trace_pair("l-7_filter", limit=1200)
    mesh = make_tp_mesh(n_model=4, n_data=2)
    streams = np.stack([lo, hi])
    counts, _ = nfa_scan_tp(mesh, tables, jnp.asarray(streams))
    counts = np.asarray(counts)
    np.testing.assert_array_equal(counts[0], nfa_scan(aut, lo))
    np.testing.assert_array_equal(counts[1], nfa_scan(aut, hi))
