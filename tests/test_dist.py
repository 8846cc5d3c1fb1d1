"""Distributed scans on the 8-device virtual CPU mesh (SURVEY.md SS4.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from regex_fpga_tpu.models import nfa_scan
from regex_fpga_tpu.ops import build_dfa_tables, build_nfa_tables, dfa_scan_serial
from regex_fpga_tpu.ops.kgram import build_kgram, dfa_scan_kgram, map_kgram_classes
from regex_fpga_tpu.parallel import (
    dfa_scan_fast_dist,
    dfa_scan_kgram_dist,
    make_mesh,
    nfa_scan_dist,
)
from regex_fpga_tpu.utils import load_ruleset, load_trace_pair

from conftest import random_dfa_table, random_nfa


def test_eight_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_data,n_seq", [(8, 1), (4, 2), (2, 4)])
def test_nfa_dist_matches_oracle(rng, n_data, n_seq):
    mesh = make_mesh(n_data, n_seq)
    aut = random_nfa(rng, n_states=40, n_edges=300, n_accept=4)
    t = build_nfa_tables(aut)
    streams = rng.integers(0, 256, size=(8, 512)).astype(np.uint8)
    counts, totals = nfa_scan_dist(mesh, t, jnp.asarray(streams))
    expect = np.stack([nfa_scan(aut, s) for s in streams])
    np.testing.assert_array_equal(np.asarray(counts), expect)
    np.testing.assert_array_equal(np.asarray(totals), expect.sum(axis=0))


def test_nfa_dist_reference(reference_available):
    mesh = make_mesh(8, 1)
    aut = load_ruleset("l-7_filter")
    t = build_nfa_tables(aut)
    lo, hi = load_trace_pair("l-7_filter", limit=4_000)
    streams = np.stack([lo, hi] * 4)  # 8 streams over 8 devices
    counts, totals = nfa_scan_dist(mesh, t, jnp.asarray(streams))
    np.testing.assert_array_equal(np.asarray(counts[0]), nfa_scan(aut, lo))
    np.testing.assert_array_equal(np.asarray(counts[1]), nfa_scan(aut, hi))


@pytest.mark.parametrize("n_data,n_seq", [(2, 4), (1, 8), (4, 2)])
def test_dfa_dist_matches_serial(rng, n_data, n_seq):
    mesh = make_mesh(n_data, n_seq)
    table, accept = random_dfa_table(rng, 32, 4)
    dt = build_dfa_tables(table, accept)
    batch = 2 * n_data
    l = n_seq * 4 * 64  # 4 blocks/shard, 64-byte blocks
    streams = rng.integers(0, 256, size=(batch, l)).astype(np.uint8)
    classes = np.asarray(dt.class_of)[streams]
    finals, counts, converged = dfa_scan_fast_dist(
        mesh, dt, jnp.asarray(classes), blocks_per_shard=4
    )
    assert bool(converged)
    for i in range(batch):
        ser = dfa_scan_serial(dt, jnp.asarray(streams[i]))
        assert int(finals[i]) == int(ser.final_state), f"stream {i}"
        assert int(counts[i]) == int(np.asarray(ser.counts).sum()), f"stream {i}"


def test_multihost_single_process_topology():
    """init_distributed is a safe no-op single-process; global_mesh spans
    the full (virtual 8-device) topology and runs a distributed scan."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from regex_fpga_tpu.models import build_tokenizer_dfa
    from regex_fpga_tpu.ops import build_dfa_tables, dfa_scan_serial
    from regex_fpga_tpu.parallel import dfa_scan_fast_dist
    from regex_fpga_tpu.parallel.multihost import global_mesh, init_distributed

    topo = init_distributed()
    assert topo.host_count == 1 and topo.host_index == 0
    assert topo.global_devices == len(jax.devices())

    mesh = global_mesh(n_seq=4)
    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)
    rng = np.random.default_rng(3)
    streams = rng.integers(0, 256, size=(2, 4 * 8 * 128), dtype=np.int64).astype(np.uint8)
    classes = jnp.asarray(np.asarray(dt.class_of)[streams].astype(np.int32))
    finals, counts, conv = dfa_scan_fast_dist(
        mesh, dt, classes, blocks_per_shard=8, start=tok.start
    )
    assert bool(conv)
    for i in range(2):
        ser = dfa_scan_serial(dt, jnp.asarray(streams[i]), start=tok.start)
        assert int(finals[i]) == int(ser.final_state)
        assert int(counts[i]) == int(np.asarray(ser.counts).sum())


def _counter_dfa(s_states: int):
    """Adversarial NON-synchronizing automaton: state = (state + byte) mod S.

    Every entry-state guess stays wrong forever (the transition function is
    a permutation for every byte), so overlap speculation never helps and
    the Jacobi fixpoint degenerates to sequential seam propagation — the
    worst case for the block-parallel design (ops/dfa_fast.py header)."""
    table = (np.arange(256)[:, None] + np.arange(s_states)[None, :]) % s_states
    accept = np.zeros(s_states, dtype=bool)
    accept[0] = True
    return build_dfa_tables(table, accept)


@pytest.mark.parametrize("n_seq", [2, 4])
def test_dfa_dist_adversarial_seams_exact_when_converged(rng, n_seq):
    """Non-synchronizing automaton ACROSS CHIP SEAMS: with few enough total
    blocks the sequential Jacobi propagation still reaches the fixpoint and
    the result is bit-exact vs the serial scan."""
    n_data = 8 // n_seq
    mesh = make_mesh(n_data, n_seq)
    dt = _counter_dfa(17)
    bps = 2  # blocks per shard -> n_seq*2 total blocks, < max_iters
    l = n_seq * bps * 128
    streams = rng.integers(0, 256, size=(n_data, l)).astype(np.uint8)
    classes = np.asarray(dt.class_of)[streams]
    finals, counts, converged = dfa_scan_fast_dist(
        mesh, dt, jnp.asarray(classes), blocks_per_shard=bps,
        max_iters=4 * n_seq,
    )
    assert bool(converged)
    ser = dfa_scan_serial(dt, jnp.asarray(streams[0]))
    assert int(finals[0]) == int(ser.final_state)
    assert int(counts[0]) == int(np.asarray(ser.match_mask).sum())


@pytest.mark.parametrize("n_data,n_seq,levels", [(2, 4, 1), (1, 8, 2), (4, 2, 2)])
def test_kgram_dist_matches_serial(rng, n_data, n_seq, levels):
    """Distributed k-gram == serial scan (totals + final state), every mesh
    shape, levels 1 and 2."""
    mesh = make_mesh(n_data, n_seq)
    table, accept = random_dfa_table(rng, 24, 4)
    # collapse the byte axis to 5 equivalence classes so the composed-class
    # count stays bounded through levels=2 (random rows are all-distinct)
    table = table[np.arange(256) % 5]
    dt = build_dfa_tables(table, accept)
    kg = build_kgram(dt, levels=levels, max_classes=200_000)
    assert kg is not None
    batch = 2 * n_data
    bps = 4
    l = n_seq * bps * 64 * kg.k  # bytes; 64 k-gram steps per block
    streams = rng.integers(0, 256, size=(batch, l)).astype(np.uint8)
    ck = np.stack([map_kgram_classes(kg, s) for s in streams])
    finals, totals, converged = dfa_scan_kgram_dist(
        mesh, jnp.asarray(kg.table), jnp.asarray(kg.acc_table),
        jnp.asarray(ck), blocks_per_shard=bps, acc_bound=kg.k,
    )
    assert bool(converged)
    for i in range(batch):
        ser = dfa_scan_serial(dt, jnp.asarray(streams[i]))
        assert int(finals[i]) == int(ser.final_state), f"stream {i}"
        assert int(totals[i]) == int(np.asarray(ser.counts).sum()), f"stream {i}"


def test_kgram_dist_matches_single_device(rng):
    """Dist k-gram on the mesh == single-device dfa_scan_kgram on the same
    stream (same tables, same block count)."""
    from regex_fpga_tpu.models import build_tokenizer_dfa

    mesh = make_mesh(2, 4)
    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)
    kg = build_kgram(dt, levels=2)
    text = (b"The quick brown fox 123 jumps!  over  the lazy dog 45.6 " * 600)
    data = np.frombuffer(text, np.uint8)[: 4 * 8 * 32 * kg.k * 2]
    ck = map_kgram_classes(kg, data)
    single = dfa_scan_kgram(
        jnp.asarray(kg.table), jnp.asarray(kg.acc_table), jnp.asarray(ck),
        num_blocks=32, start=tok.start, acc_bound=kg.k,
    )
    finals, totals, converged = dfa_scan_kgram_dist(
        mesh, jnp.asarray(kg.table), jnp.asarray(kg.acc_table),
        jnp.asarray(np.stack([ck, ck])), blocks_per_shard=8,
        start=tok.start, acc_bound=kg.k,
    )
    assert bool(converged) and bool(single.converged)
    for i in range(2):
        assert int(finals[i]) == int(single.final_state)
        assert int(totals[i]) == int(single.total)


def test_kgram_dist_adversarial_seams_exact_when_converged(rng):
    """Mod-3 counter (never synchronizes; k=2 steps with block length odd in
    groups of 3): chip-seam Jacobi propagation still reaches the fixpoint
    with enough iterations and the totals are exact."""
    ptable = np.zeros((256, 3), dtype=np.int32)
    for s in range(3):
        ptable[:, s] = (s + 1) % 3
    pt = build_dfa_tables(ptable, np.array([False, True, False]))
    kg = build_kgram(pt, levels=1)
    mesh = make_mesh(2, 4)
    bps = 2
    steps = 4 * bps * 26          # 26 k-gram steps/block; 26*2 % 3 != 0
    streams = np.zeros((2, steps * kg.k), np.uint8)
    ck = np.stack([map_kgram_classes(kg, s) for s in streams])
    finals, totals, converged = dfa_scan_kgram_dist(
        mesh, jnp.asarray(kg.table), jnp.asarray(kg.acc_table),
        jnp.asarray(ck), blocks_per_shard=bps, max_iters=32,
        acc_bound=kg.k,
    )
    assert bool(converged)
    ser = dfa_scan_serial(pt, jnp.asarray(streams[0]))
    assert int(finals[0]) == int(ser.final_state)
    assert int(totals[0]) == int(np.asarray(ser.counts).sum())


def test_kgram_dist_reports_nonconvergence(rng):
    """More total blocks than max_iters on a non-synchronizing automaton:
    the engine must report converged=False, never silently wrong totals."""
    ptable = np.zeros((256, 5), dtype=np.int32)
    for s in range(5):
        ptable[:, s] = (s + 1) % 5
    pt = build_dfa_tables(ptable, np.array([False, True, False, False, False]))
    kg = build_kgram(pt, levels=1)
    mesh = make_mesh(2, 4)
    bps = 16  # 64 total blocks >> max_iters=8
    streams = np.zeros((2, 4 * bps * 13 * kg.k), np.uint8)
    ck = np.stack([map_kgram_classes(kg, s) for s in streams])
    _, _, converged = dfa_scan_kgram_dist(
        mesh, jnp.asarray(kg.table), jnp.asarray(kg.acc_table),
        jnp.asarray(ck), blocks_per_shard=bps, max_iters=8, acc_bound=kg.k,
    )
    assert not bool(converged)


def test_dfa_dist_adversarial_seams_reports_nonconvergence(rng):
    """With more total blocks than max_iters the engine must REPORT failure
    (converged=False), never return silently wrong counts."""
    mesh = make_mesh(2, 4)
    dt = _counter_dfa(17)
    bps = 16  # 64 total blocks >> max_iters=8
    l = 4 * bps * 64
    streams = rng.integers(0, 256, size=(2, l)).astype(np.uint8)
    classes = np.asarray(dt.class_of)[streams]
    _, _, converged = dfa_scan_fast_dist(
        mesh, dt, jnp.asarray(classes), blocks_per_shard=bps, max_iters=8,
    )
    assert not bool(converged)
