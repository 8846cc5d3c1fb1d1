"""Lazy (on-demand) subset determinization of CSR NFAs.

The shipped rulesets do not determinize globally (>300k subset states,
SURVEY.md SS0), but real workloads touch a tiny corner of the subset space
(measured: 729 states for l-7_filter, 18,655 for snort_16 across the full
conformance traces).  This module builds the subset automaton *lazily* —
the grep/RE2 "lazy DFA" idea, recast for a device/host split:

  - the dense (C, cap) transition table grows INCREMENTALLY as states are
    interned/expanded; snapshots for the device are a single vectorized
    copy with frontier rows mapped to an absorbing UNKNOWN sentinel;
  - host walking uses the native C++ ``lazy_walk`` (one table load per
    byte, ~10^8 B/s) between expansions, falling back to a Python loop if
    the native toolchain is unavailable;
  - counts stay per-NFA-state: each subset state knows its accepting
    members, and a visit counts each member once — exactly the reference
    testbench semantics (SURVEY.md SS3.3; accepting members contribute no
    successors by construction).
"""

from __future__ import annotations

import numpy as np

from .csr import CsrAutomaton, byte_classes

__all__ = ["LazyDfa"]


class LazyDfa:
    def __init__(self, aut: CsrAutomaton, initial_capacity: int = 1 << 12):
        self.aut = aut
        cls, c = byte_classes(aut)
        self.class_of = cls
        self.num_classes = c
        # per-NFA-state edge keys (class * N + target), sorted+unique, so
        # expansion is pure vectorized numpy
        n = aut.num_states
        ecls = cls[aut.trans_char.astype(np.int64)].astype(np.int64)
        ekey = ecls * n + aut.trans_target.astype(np.int64)
        self._edge_key: list[np.ndarray] = [
            np.unique(ekey[int(aut.offsets[s]) : int(aut.offsets[s + 1])])
            for s in range(n)
        ]
        self._accept_mask = aut.accept_mask

        self._cap = initial_capacity
        self._table = np.full((c, self._cap), -1, dtype=np.int32)
        self._expanded = np.zeros(self._cap, dtype=np.uint8)
        self._ids: dict[tuple, int] = {}
        self._sets: list[tuple] = []
        self._members_acc: list[tuple[int, ...]] = []
        #: bumped on every intern AND every expansion — device-snapshot
        #: caches must key on this (an expansion can change rows without
        #: changing num_states)
        self.version = 0
        self.start = self._intern((0,))

        try:
            from ..utils.native import _load

            self._native = _load()
        except Exception:
            self._native = None

    # -- interning / expansion ------------------------------------------

    @property
    def num_states(self) -> int:
        return len(self._sets)

    def _grow(self, need: int) -> None:
        while self._cap < need:
            self._cap *= 2
        t = np.full((self.num_classes, self._cap), -1, dtype=np.int32)
        t[:, : self._table.shape[1]] = self._table
        self._table = t
        e = np.zeros(self._cap, dtype=np.uint8)
        e[: len(self._expanded)] = self._expanded
        self._expanded = e

    def _intern(self, key: tuple) -> int:
        """key: sorted tuple of NFA state ids."""
        sid = self._ids.get(key)
        if sid is None:
            sid = len(self._sets)
            if sid >= self._cap:
                self._grow(sid + 1)
            self._ids[key] = sid
            self._sets.append(key)
            self._members_acc.append(
                tuple(s for s in key if self._accept_mask[s])
            )
            self.version += 1
        return sid

    def is_expanded(self, sid: int) -> bool:
        return bool(self._expanded[sid])

    def expand(self, sid: int) -> None:
        if self._expanded[sid]:
            return
        n = self.aut.num_states
        cur = self._sets[sid]
        if cur:
            keys = np.unique(np.concatenate([self._edge_key[s] for s in cur]))
        else:
            keys = np.empty(0, dtype=np.int64)
        bounds = np.searchsorted(keys, np.arange(self.num_classes + 1) * n)
        targets = (keys % n).astype(np.int64)
        row = np.empty(self.num_classes, dtype=np.int32)
        memo: dict[tuple, int] = {}
        for c_ in range(self.num_classes):
            key = tuple(targets[bounds[c_] : bounds[c_ + 1]].tolist())
            tid = memo.get(key)
            if tid is None:
                tid = memo[key] = self._intern(key)
            row[c_] = tid
        self._table[:, sid] = row
        self._expanded[sid] = 1
        self.version += 1

    def frontier(self) -> list[int]:
        return [i for i in range(self.num_states) if not self._expanded[i]]

    # -- host scanning ---------------------------------------------------

    def host_scan(
        self,
        stream: np.ndarray,
        start_id: int | None = None,
        counts: np.ndarray | None = None,
        max_bytes: int | None = None,
    ) -> tuple[np.ndarray, int, int]:
        """Scan (a prefix of) a byte stream host-side, expanding on demand.

        Returns (per-NFA-state counts, final subset-state id, bytes consumed).
        """
        sid = self.start if start_id is None else start_id
        if counts is None:
            counts = np.zeros(self.aut.num_states, dtype=np.int64)
        data = np.asarray(stream, dtype=np.uint8)
        n = len(data) if max_bytes is None else min(len(data), max_bytes)
        classes = np.ascontiguousarray(self.class_of[data[:n]], dtype=np.uint8)
        visits = np.zeros(self._cap, dtype=np.int64)
        p = 0
        if self._native is not None:
            import ctypes

            i32 = ctypes.c_int32
            while p < n:
                if not self._expanded[sid]:
                    self.expand(sid)
                if len(visits) < self._cap:
                    visits = np.concatenate(
                        [visits, np.zeros(self._cap - len(visits), np.int64)]
                    )
                sid_io = i32(sid)
                consumed = self._native.lazy_walk(
                    self._table.ctypes.data_as(ctypes.POINTER(i32)),
                    self._cap,
                    self._expanded.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    classes[p:].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    n - p,
                    ctypes.byref(sid_io),
                    visits.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                )
                sid = int(sid_io.value)
                p += consumed
        else:
            for p in range(n):
                if not self._expanded[sid]:
                    self.expand(sid)
                    if len(visits) < self._cap:
                        visits = np.concatenate(
                            [visits, np.zeros(self._cap - len(visits), np.int64)]
                        )
                visits[sid] += 1
                sid = int(self._table[classes[p], sid])
        counts += self.accept_counts(visits)
        return counts, sid, n

    def warm_restarts(self, stream: np.ndarray, positions, depth: int) -> None:
        """Intern the hub-restart paths used by overlap synchronization.

        Speculative block entries are guessed by scanning a short window from
        the hub state (ops/dfa_take.py ``_sync_entries``); those hub-rooted
        paths traverse shallow subset states the true chain never visits —
        intern them so speculation stays on the known subgraph.  Window
        ENDPOINTS coincide with true-chain states (synchronization), so only
        the shallow prefix states are new and they are shared across windows
        of similar content.
        """
        scratch = np.zeros(self.aut.num_states, dtype=np.int64)
        n = len(stream)
        for pos in positions:
            if 0 <= pos < n:
                self.host_scan(
                    stream[pos : pos + depth], self.start, scratch, depth
                )

    # -- device snapshot -------------------------------------------------

    def snapshot(self, pad_to: int | None = None) -> tuple[np.ndarray, int, np.ndarray]:
        """Dense device table.

        Returns (table (C, P+1) int32, unknown_id = P, accepting-member
        counts (P+1,)).  Frontier states' rows are all-unknown; the unknown
        row is absorbing.  ``pad_to`` rounds the state dimension up so
        device shapes stay stable as the automaton grows.
        """
        m = self.num_states
        p = m if pad_to is None else max(m, pad_to)
        unknown = p
        table = np.full((self.num_classes, p + 1), unknown, dtype=np.int32)
        known = self._expanded[:m].astype(bool)
        table[:, :m] = np.where(known[None, :], self._table[:, :m], unknown)
        n_acc = np.zeros(p + 1, dtype=np.int32)
        n_acc[:m] = [len(a) for a in self._members_acc]
        return table, unknown, n_acc

    def accept_counts(self, visit_counts: np.ndarray) -> np.ndarray:
        """Map per-subset-state visit counts -> per-NFA-state match counts."""
        out = np.zeros(self.aut.num_states, dtype=np.int64)
        limit = min(len(visit_counts), self.num_states)
        for sid in np.nonzero(visit_counts[:limit])[0]:
            v = int(visit_counts[sid])
            for m in self._members_acc[sid]:
                out[m] += v
        return out
