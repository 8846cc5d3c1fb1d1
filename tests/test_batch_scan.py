"""Multi-stream batch engine (ops.dfa_fast.dfa_scan_fast_multi + the
DfaMatcher batch path): N equal-length streams as extra chain lanes must
reproduce per-stream serial scans bit-exactly at every block/chunk
alignment — the reference's dual-stream independence contract
(SURVEY.md §3.3 item 5) generalized.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from regex_fpga_tpu import api
from regex_fpga_tpu.ops import build_dfa_tables
from regex_fpga_tpu.ops.dfa_engine import dfa_scan_serial
from regex_fpga_tpu.ops.dfa_fast import dfa_scan_fast_multi


def random_dfa(rng, s=13, c=7):
    table = rng.integers(0, s, size=(c, s), dtype=np.int32)
    accept = rng.random(s) < 0.2
    return build_dfa_tables_from_class_table(table, accept)


def build_dfa_tables_from_class_table(table, accept):
    # build_dfa_tables expects a (256, S) byte table; expand classes
    c, s = table.shape
    byte_table = table[np.arange(256) % c, :]
    return build_dfa_tables(byte_table, accept)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("n,l,nb", [(2, 64, 4), (3, 256, 8), (5, 128, 1)])
def test_multi_counts_vs_serial(seed, n, l, nb):
    rng = np.random.default_rng(seed)
    dt = random_dfa(rng)
    data = rng.integers(0, 256, size=(n, l), dtype=np.int32)
    classes = np.asarray(dt.class_of)[data]
    res = dfa_scan_fast_multi(
        dt, jnp.asarray(classes), num_blocks=nb, starts=0, emit="counts"
    )
    assert bool(res.converged)
    for i in range(n):
        ser = dfa_scan_serial(dt, jnp.asarray(data[i]), start=0)
        np.testing.assert_array_equal(
            np.asarray(res.counts[i]), np.asarray(ser.counts)
        )
        assert int(res.final_states[i]) == int(ser.final_state)


def test_multi_per_stream_starts():
    rng = np.random.default_rng(3)
    dt = random_dfa(rng)
    data = rng.integers(0, 256, size=(3, 96), dtype=np.int32)
    classes = np.asarray(dt.class_of)[data]
    starts = np.array([0, 5, 9], dtype=np.int32)
    res = dfa_scan_fast_multi(
        dt, jnp.asarray(classes), num_blocks=4, starts=jnp.asarray(starts),
        emit="counts",
    )
    assert bool(res.converged)
    for i in range(3):
        ser = dfa_scan_serial(dt, jnp.asarray(data[i]), start=int(starts[i]))
        np.testing.assert_array_equal(
            np.asarray(res.counts[i]), np.asarray(ser.counts)
        )


def test_multi_full_mode():
    rng = np.random.default_rng(4)
    dt = random_dfa(rng)
    classes = rng.integers(0, dt.table.shape[0], size=(2, 128), dtype=np.int32)
    res = dfa_scan_fast_multi(
        dt, jnp.asarray(classes), num_blocks=8, starts=0, emit="full"
    )
    from regex_fpga_tpu.ops.dfa_fast import dfa_scan_fast

    for i in range(2):
        one = dfa_scan_fast(dt, jnp.asarray(classes[i]), num_blocks=8, start=0)
        np.testing.assert_array_equal(
            np.asarray(res.states[i]), np.asarray(one.states)
        )
        np.testing.assert_array_equal(
            np.asarray(res.match_mask[i]), np.asarray(one.match_mask)
        )


def test_api_batch_path_matches_per_stream():
    m = api.compile_regex(rb"ab+|\d\d")
    rng = np.random.default_rng(5)
    streams = [bytes(rng.choice(list(b"ab12 x"), size=4096)) for _ in range(4)]
    batch = m.scan(streams)
    assert batch.metrics.engine == "dfa-fast-batch"
    for i, s_ in enumerate(streams):
        one = m.scan(s_)
        np.testing.assert_array_equal(batch.counts[i], one.counts[0])


def test_api_batch_chunked_resume():
    m = api.compile_regex(rb"xy+z")
    m.config = type(m.config)(**{**m.config.__dict__, "chunk_bytes": 1024})
    rng = np.random.default_rng(6)
    streams = [bytes(rng.choice(list(b"xyz "), size=5000)) for _ in range(3)]
    batch = m.scan(streams)
    for i, s_ in enumerate(streams):
        np.testing.assert_array_equal(batch.counts[i], m.scan(s_).counts[0])


def test_api_unequal_lengths_take_ragged_batch():
    # r5: unequal lengths no longer fall back to the serial loop — they
    # ride the stall-padded multi engine
    m = api.compile_regex(rb"a+")
    rep = m.scan([b"aaa", b"aaaa"])
    assert rep.metrics.engine == "dfa-fast-batch-ragged"
    np.testing.assert_array_equal(rep.counts[0], m.scan(b"aaa").counts[0])
    np.testing.assert_array_equal(rep.counts[1], m.scan(b"aaaa").counts[0])


# ------------------------- ragged batching (r4 verdict item 3)


def test_stall_extend_identity_column():
    from regex_fpga_tpu.ops.dfa_fast import table_domain_ok
    from regex_fpga_tpu.ops.tables import stall_extend

    rng = np.random.default_rng(7)
    dt = random_dfa(rng)
    st = stall_extend(dt)
    assert st.num_classes == dt.num_classes + 1
    np.testing.assert_array_equal(
        np.asarray(st.table[-1]), np.arange(dt.num_states)
    )
    np.testing.assert_array_equal(
        np.asarray(st.class_of), np.asarray(dt.class_of)
    )  # no byte maps to the stall class
    assert bool(table_domain_ok(st))


@pytest.mark.parametrize("lens", [
    (0, 1, 63, 64, 65, 977),       # all bucket alignments incl. empty
    (4096, 1, 4096),               # big/small mix
    (200, 200, 199),               # near-equal
])
def test_ragged_batch_bit_exact_vs_per_stream(lens):
    m = api.compile_regex(rb"ab+|\d\d")
    rng = np.random.default_rng(8)
    streams = [bytes(rng.choice(list(b"ab12 x"), size=l)) for l in lens]
    rep = m.scan(streams)
    assert rep.metrics.engine == "dfa-fast-batch-ragged"
    for i, s_ in enumerate(streams):
        one = m.scan(s_)
        np.testing.assert_array_equal(rep.counts[i], one.counts[0])
    assert rep.total == sum(int(m.scan(s_).total) for s_ in streams)


def test_ragged_final_byte_and_accepting_final_state():
    # final state accepting + heavy padding: the stall correction must
    # remove exactly the padded visits, and the eof accept still lands
    m = api.compile_regex(rb"ab")
    rep = m.scan([b"zzab", b"x" * 3000 + b"ab", b"ab" * 700])
    assert rep.metrics.engine == "dfa-fast-batch-ragged"
    for i, s_ in enumerate([b"zzab", b"x" * 3000 + b"ab", b"ab" * 700]):
        np.testing.assert_array_equal(rep.counts[i], m.scan(s_).counts[0])


def test_ragged_chunked_resume():
    m = api.compile_regex(rb"xy+z")
    m.config = type(m.config)(**{**m.config.__dict__, "chunk_bytes": 1024})
    rng = np.random.default_rng(9)
    lens = (5000, 1500, 2333, 700)
    streams = [bytes(rng.choice(list(b"xyz "), size=l)) for l in lens]
    rep = m.scan(streams)
    assert rep.metrics.engine == "dfa-fast-batch-ragged"
    for i, s_ in enumerate(streams):
        np.testing.assert_array_equal(rep.counts[i], m.scan(s_).counts[0])


def test_ragged_matches_literal_matcher_attribution():
    m = api.compile_literals([b"error", b"warn", b"ok"])
    streams = [b"x error y warn", b"ok", b"", b"errorerror" * 50]
    rep = m.scan_patterns(streams)
    for i, s_ in enumerate(streams):
        one = m.scan_patterns(s_)
        np.testing.assert_array_equal(
            rep.pattern_counts[i], one.pattern_counts[0]
        )


def test_final_byte_match_per_stream():
    m = api.compile_regex(rb"ab")
    rep = m.scan([b"zzab", b"abzz"])
    assert rep.metrics.engine == "dfa-fast-batch"
    np.testing.assert_array_equal(rep.counts[0], m.scan(b"zzab").counts[0])
    np.testing.assert_array_equal(rep.counts[1], m.scan(b"abzz").counts[0])
    assert rep.counts[0].sum() == 1  # the eof accept lands on stream 0 only
    assert rep.counts[1].sum() == 1
