"""Chunked ingest composed WITH the distributed scan (BASELINE config 5):
corpus >> device memory, sharded over the (data, seq) mesh, chunked along
the sequence, carry-across-chunks, checkpointed (SURVEY.md SS5.7, SS7.4
item 5)."""

import numpy as np
import jax.numpy as jnp
import pytest

from regex_fpga_tpu.models import build_tokenizer_dfa
from regex_fpga_tpu.ops import build_dfa_tables, dfa_scan_serial
from regex_fpga_tpu.ops.kgram import build_kgram
from regex_fpga_tpu.parallel import make_mesh
from regex_fpga_tpu.parallel.ingest import (
    CheckpointStore,
    dist_resilient_scan,
    iter_batch_chunks,
)

from conftest import random_dfa_table


def _corpus(rng, batch, l):
    text = b"GET /index.html HTTP/1.1 Host: example.com 2026 !! " * 64
    reps = np.frombuffer(text * (l // len(text) + 1), np.uint8)[:l]
    out = np.stack([np.roll(reps, 17 * i) for i in range(batch)])
    noise = rng.integers(0, 256, size=out.shape)
    mask = rng.random(out.shape) < 0.1
    return np.where(mask, noise, out).astype(np.uint8)


def _serial_expect(dt, streams, start=0):
    finals, counts = [], []
    for s in streams:
        ser = dfa_scan_serial(dt, jnp.asarray(s), start=start)
        finals.append(int(ser.final_state))
        counts.append(int(np.asarray(ser.counts).sum()))
    return finals, counts


@pytest.mark.parametrize("n_data,n_seq", [(2, 4), (4, 2)])
def test_dist_resilient_scan_fast_exact(rng, n_data, n_seq):
    """Multi-chunk dist scan (k=1 engine) == serial scan of the unchunked
    streams: the carry crosses chunk boundaries exactly (accept-before-byte
    timing means a chunk's final-state accept is counted by the NEXT chunk,
    and only the true stream end drops it)."""
    mesh = make_mesh(n_data, n_seq)
    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)
    batch = 2 * n_data
    chunk_len = n_seq * 4 * 64
    streams = _corpus(rng, batch, 3 * chunk_len)
    carry = dist_resilient_scan(
        mesh, dt, iter_batch_chunks(streams, chunk_len),
        blocks_per_shard=4, start=tok.start,
    )
    finals, counts = _serial_expect(dt, streams, start=tok.start)
    np.testing.assert_array_equal(carry["states"], finals)
    np.testing.assert_array_equal(carry["counts"], counts)
    assert int(carry["offset"]) == streams.shape[1]


def test_dist_resilient_scan_kgram_exact(rng):
    """Same composition through the k-gram counting engine."""
    mesh = make_mesh(2, 4)
    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)
    kg = build_kgram(dt, levels=2)
    batch = 4
    chunk_len = 4 * 4 * 16 * kg.k  # n_seq * bps * steps/block * k bytes
    streams = _corpus(rng, batch, 3 * chunk_len)
    carry = dist_resilient_scan(
        mesh, dt, iter_batch_chunks(streams, chunk_len),
        kgram=kg, blocks_per_shard=4, start=tok.start,
    )
    finals, counts = _serial_expect(dt, streams, start=tok.start)
    np.testing.assert_array_equal(carry["states"], finals)
    np.testing.assert_array_equal(carry["counts"], counts)


def test_dist_resilient_scan_resume_at_chunk_boundary(rng, tmp_path):
    """Fault injection: the run dies at a chunk boundary (ingest raises
    after two chunks); a fresh run with the same CheckpointStore resumes
    from the boundary and the combined result is exact."""
    mesh = make_mesh(2, 4)
    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)
    batch, chunk_len = 2, 4 * 4 * 64
    streams = _corpus(rng, batch, 4 * chunk_len)
    store = CheckpointStore(str(tmp_path / "carry.npz"))

    def dying_chunks():
        it = iter_batch_chunks(streams, chunk_len)
        for i, item in enumerate(it):
            if i == 2:
                raise OSError("simulated host death at chunk boundary")
            yield item

    with pytest.raises(OSError):
        dist_resilient_scan(
            mesh, dt, dying_chunks(), blocks_per_shard=4,
            start=tok.start, store=store, max_retries=0,
        )
    saved = store.load()
    assert int(saved["offset"]) == 2 * chunk_len  # two chunks committed

    carry = dist_resilient_scan(
        mesh, dt, iter_batch_chunks(streams, chunk_len),
        blocks_per_shard=4, start=tok.start, store=store,
    )
    finals, counts = _serial_expect(dt, streams, start=tok.start)
    np.testing.assert_array_equal(carry["states"], finals)
    np.testing.assert_array_equal(carry["counts"], counts)


def test_dist_resilient_scan_nonconvergence_raises(rng):
    """A non-synchronizing automaton with too many blocks must raise, not
    return speculative totals."""
    mesh = make_mesh(2, 4)
    ptable = np.zeros((256, 5), dtype=np.int32)
    for s in range(5):
        ptable[:, s] = (s + 1) % 5
    dt = build_dfa_tables(
        ptable, np.array([False, True, False, False, False])
    )
    streams = np.zeros((2, 4 * 64 * 64), np.uint8)
    with pytest.raises(RuntimeError, match="did not converge"):
        dist_resilient_scan(
            mesh, dt, iter_batch_chunks(streams, streams.shape[1]),
            blocks_per_shard=64, max_iters=4, max_retries=0,
            retry_delay=0.0,
        )


def test_prefetch_abandoned_consumer_no_leak():
    """ADVICE r2: abandoning the prefetch generator early must release the
    worker thread instead of leaving it blocked on a full queue."""
    import threading
    import time

    from regex_fpga_tpu.parallel.ingest import prefetch_chunks

    before = threading.active_count()

    def chunks():
        for i in range(100):
            yield i, np.zeros(8, np.uint8)

    gen = prefetch_chunks(chunks(), depth=1)
    next(gen)
    gen.close()  # consumer abandons early
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_nonconvergence_not_retried(monkeypatch):
    """Deterministic non-convergence must surface immediately — no retry
    sleeps, no re-scans (review r3)."""
    import regex_fpga_tpu.parallel.ingest as ingest_mod

    mesh = make_mesh(2, 4)
    ptable = np.zeros((256, 5), dtype=np.int32)
    for s in range(5):
        ptable[:, s] = (s + 1) % 5
    dt = build_dfa_tables(
        ptable, np.array([False, True, False, False, False])
    )
    streams = np.zeros((2, 4 * 64 * 64), np.uint8)
    sleeps = []
    monkeypatch.setattr(ingest_mod.time, "sleep", sleeps.append)
    with pytest.raises(ingest_mod.NonRetryableScanError):
        dist_resilient_scan(
            mesh, dt, iter_batch_chunks(streams, streams.shape[1]),
            blocks_per_shard=64, max_iters=4, max_retries=5,
        )
    assert sleeps == []
