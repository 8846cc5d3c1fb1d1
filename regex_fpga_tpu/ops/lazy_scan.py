"""Host/device loop for lazy-subset-DFA NFA scanning.

Protocol (see models/lazy_dfa.py and ops/dfa_take.py):

  1. warm the lazy DFA with a short host scan (interning the hot states);
  2. snapshot the known table to the device (cached — re-uploaded only when
     the automaton grew) and chain-scan fixed-size chunks at DFA speed, with
     per-subset-state visit counts accumulated ON DEVICE (per-position
     states never cross the host link in the steady state);
  3. if a chunk fell off the known frontier or its Jacobi seams did not
     converge, re-run it through the states-returning engine, keep the exact
     prefix, expand host-side along the true path (guaranteed progress), and
     continue.

Every byte is counted exactly once; the result equals the golden NFA oracle
bit-for-bit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..models.lazy_dfa import LazyDfa
from .dfa_take import dfa_scan_take, dfa_scan_take_counts

__all__ = ["LazyScanState", "lazy_nfa_scan"]


class LazyScanState(NamedTuple):
    counts: np.ndarray   # (num_nfa_states,) int64
    state_id: int        # current subset-state id
    offset: int          # bytes consumed


class _DeviceCache:
    """Table upload cache: re-upload only when the automaton grew."""

    def __init__(self):
        self.version = -1
        self.pad = 0
        self.table = None
        self.unknown = None


def _pad_for(ld: LazyDfa) -> int:
    pad = 1 << 10
    while pad < ld.num_states:
        pad *= 2
    return pad


def lazy_nfa_scan(
    ld: LazyDfa,
    stream: np.ndarray,
    carry: LazyScanState | None = None,
    warm_bytes: int = 1 << 15,
    host_step: int = 1 << 15,
    num_blocks: int = 1024,
    min_block_bytes: int = 64,
    max_iters: int = 24,
    device_chunk: int = 1 << 22,
) -> LazyScanState:
    stream = np.asarray(stream, dtype=np.uint8)
    if carry is None:
        counts = np.zeros(ld.aut.num_states, dtype=np.int64)
        sid = ld.start
        base = 0
    else:
        counts, sid, base = np.array(carry.counts), carry.state_id, carry.offset

    cache = getattr(ld, "_device_cache", None)
    if cache is None:
        cache = _DeviceCache()
        ld._device_cache = cache

    p = 0
    n = len(stream)
    if carry is None and n:
        counts, sid, consumed = ld.host_scan(stream, sid, counts, max_bytes=warm_bytes)
        p = consumed

    def ensure_table():
        version = ld.version  # counts expansions too, not just interns
        pad = _pad_for(ld)
        if cache.version != version or cache.pad != pad:
            table, unknown, _ = ld.snapshot(pad_to=pad)
            cache.table = jnp.asarray(table)
            cache.unknown = unknown
            cache.version = version
            cache.pad = pad

    while p < n:
        rest = n - p
        l = min(rest, device_chunk)
        nb = num_blocks
        while nb > 1 and l // nb < min_block_bytes:
            nb //= 2
        l = (l // nb) * nb
        if l < nb or nb <= 1:
            counts, sid, consumed = ld.host_scan(stream[p:], sid, counts)
            p += consumed
            continue

        ensure_table()

        # ---- optimistic pipelined dispatch of full-size chunks -----------
        # Chunk k+1's entry is chunk k's final state, chained DEVICE-side —
        # no host sync between chunks, so uploads overlap compute.  Flags
        # are checked once for the whole batch; per-chunk visit counts stay
        # in separate device buffers and merge only for the validated
        # prefix (a bad chunk garbles every later entry).
        if l == device_chunk:
            batch = []
            start_dev = sid
            while p + l <= n and len(batch) < 16:
                classes = jnp.asarray(
                    ld.class_of[stream[p : p + l]].astype(np.uint8)
                )
                vbuf = jnp.zeros(cache.pad + 1, dtype=jnp.int32)
                r = dfa_scan_take_counts(
                    cache.table, classes, vbuf,
                    num_blocks=nb, start=start_dev, max_iters=max_iters,
                    sync_state=ld.start,
                )
                batch.append((p, classes, r))
                start_dev = r.final_state
                p += l
            flags = np.asarray(
                jnp.stack(
                    [jnp.stack([c.converged, c.unknown_hit]) for _, _, c in batch]
                )
            )
            bad = [i for i, f in enumerate(flags) if (not f[0]) or f[1]]
            good_upto = bad[0] if bad else len(batch)
            if good_upto:
                merged = batch[0][2].visits_acc
                for _, _, c in batch[1:good_upto]:
                    merged = merged + c.visits_acc
                counts += ld.accept_counts(np.asarray(merged))
                sid = int(batch[good_upto - 1][2].final_state)
            if not bad:
                continue
            # rewind to the first bad chunk
            p, classes, _ = batch[good_upto]
            l = device_chunk
            # warm the hub-restart paths at this chunk's block boundaries so
            # overlap-sync speculation stays on the interned subgraph, then
            # retry the chunk once before paying for exact recovery
            b_len = l // nb
            ld.warm_restarts(
                stream,
                range(p + b_len - 64, p + l, b_len),
                depth=64,
            )
            ensure_table()
            vbuf = jnp.zeros(cache.pad + 1, dtype=jnp.int32)
            r = dfa_scan_take_counts(
                cache.table, classes, vbuf,
                num_blocks=nb, start=sid, max_iters=max_iters,
                sync_state=ld.start,
            )
            if bool(r.converged) and not bool(r.unknown_hit):
                counts += ld.accept_counts(np.asarray(r.visits_acc))
                sid = int(r.final_state)
                p += l
                continue
        else:
            classes = jnp.asarray(ld.class_of[stream[p : p + l]].astype(np.uint8))

        # recovery / tail: exact prefix via the states-returning engine
        r2 = dfa_scan_take(
            cache.table, classes, num_blocks=nb, start=sid,
            max_iters=max_iters, sync_state=ld.start,
        )
        if not bool(r2.converged):
            # adversarial workload: host path is exact
            counts, sid, consumed = ld.host_scan(stream[p : p + l], sid, counts)
            p += consumed
            continue
        states = np.asarray(r2.states)
        unk = states == cache.unknown
        final = int(r2.final_state)
        if not unk.any() and final != cache.unknown:  # defensive: clean
            counts += ld.accept_counts(
                np.bincount(states, minlength=cache.pad + 1)
            )
            sid = final
            p += l
            continue
        # first unknown; q >= 1 (entry state is known).  A final transition
        # landing on unknown shows only via `final` — treat it as unknown at
        # position len(states)
        q = int(unk.argmax()) if unk.any() else len(states)
        keep = max(q - 1, 0)
        if keep:
            counts += ld.accept_counts(
                np.bincount(states[:keep], minlength=cache.pad + 1)
            )
            sid = int(states[keep])  # state before byte `keep`
        p += keep
        # expand along the true path for guaranteed progress
        counts, sid, consumed = ld.host_scan(
            stream[p:], sid, counts, max_bytes=host_step
        )
        p += consumed

    return LazyScanState(counts=counts, state_id=sid, offset=base + n)
