"""Lazy (on-demand) subset determinization of CSR NFAs.

The shipped rulesets do not determinize globally (>300k subset states,
SURVEY.md SS0), but real workloads touch a tiny corner of the subset space
(measured: 729 states for l-7_filter, 18,655 for snort_16 across the full
conformance traces).  This module builds the subset automaton *lazily* —
the grep/RE2 "lazy DFA" idea, recast for a device/host split:

  - the host interns subset states and expands transition rows on demand;
  - snapshots export a dense (C, M+1) int32 table where un-expanded
    ("frontier") states have all-UNKNOWN rows and UNKNOWN is an absorbing
    sentinel — the device scans at DFA speed and reports where it fell off
    the known frontier;
  - counts stay per-NFA-state: each subset state knows its accepting
    members, and a visit to the subset state counts each member once —
    exactly the reference testbench semantics (SURVEY.md SS3.3; accepting
    members contribute no successors by construction).
"""

from __future__ import annotations

import numpy as np

from .csr import CsrAutomaton, byte_classes

__all__ = ["LazyDfa"]


class LazyDfa:
    def __init__(self, aut: CsrAutomaton):
        self.aut = aut
        cls, c = byte_classes(aut)
        self.class_of = cls
        self.num_classes = c
        # per-NFA-state edge arrays keyed (class, target), class-major sorted
        # so expansion is pure vectorized numpy (set unions were the cold-
        # phase bottleneck at snort_16 scale)
        n = aut.num_states
        self._edge_key: list[np.ndarray] = []  # (deg,) int64: cls * N + target
        ecls = cls[aut.trans_char.astype(np.int64)].astype(np.int64)
        ekey = ecls * n + aut.trans_target.astype(np.int64)
        for s in range(n):
            lo_, hi_ = int(aut.offsets[s]), int(aut.offsets[s + 1])
            self._edge_key.append(np.unique(ekey[lo_:hi_]))
        self._accept_mask = aut.accept_mask

        self._ids: dict[tuple, int] = {}
        self._sets: list[tuple] = []
        self._rows: list[np.ndarray | None] = []   # (C,) int32 or None
        self._members_acc: list[tuple[int, ...]] = []
        self.start = self._intern((0,))

    # -- interning / expansion ------------------------------------------

    @property
    def num_states(self) -> int:
        return len(self._sets)

    def _intern(self, key: tuple) -> int:
        """key: sorted tuple of NFA state ids."""
        sid = self._ids.get(key)
        if sid is None:
            sid = len(self._sets)
            self._ids[key] = sid
            self._sets.append(key)
            self._rows.append(None)
            self._members_acc.append(
                tuple(s for s in key if self._accept_mask[s])
            )
        return sid

    def is_expanded(self, sid: int) -> bool:
        return self._rows[sid] is not None

    def expand(self, sid: int) -> None:
        if self._rows[sid] is not None:
            return
        n = self.aut.num_states
        cur = self._sets[sid]
        if cur:
            keys = np.unique(np.concatenate([self._edge_key[s] for s in cur]))
        else:
            keys = np.empty(0, dtype=np.int64)
        # keys sorted class-major: split into per-class target tuples
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
        self._rows[sid] = row

    def frontier(self) -> list[int]:
        return [i for i, r in enumerate(self._rows) if r is None]

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
        classes = self.class_of[np.asarray(stream, dtype=np.uint8)]
        n = len(classes) if max_bytes is None else min(len(classes), max_bytes)
        rows = self._rows
        for p in range(n):
            for m in self._members_acc[sid]:
                counts[m] += 1
            if rows[sid] is None:
                self.expand(sid)
            sid = int(rows[sid][classes[p]])
        return counts, sid, n

    def warm_restarts(
        self, stream: np.ndarray, positions, depth: int
    ) -> None:
        """Intern the hub-restart paths used by overlap synchronization.

        Speculative block entries are guessed by scanning a short window
        from the hub state (ops/dfa_take.py `_sync_entries`); those
        hub-rooted paths traverse shallow subset states the true chain
        never visits — intern them so speculation stays on the known
        subgraph.  By the synchronization property the window ENDPOINTS
        coincide with true-chain states, so only the shallow prefix states
        are new, and they are shared across windows of similar content.
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
        row is absorbing.  ``pad_to`` rounds the state dimension up (e.g. to
        a power of two) so device shapes stay stable as the automaton grows
        — unused padding ids are never produced by expanded rows.
        """
        m = self.num_states
        p = m if pad_to is None else max(m, pad_to)
        unknown = p
        table = np.full((self.num_classes, p + 1), unknown, dtype=np.int32)
        for sid, row in enumerate(self._rows):
            if row is not None:
                table[:, sid] = row
        n_acc = np.zeros(p + 1, dtype=np.int32)
        n_acc[:m] = [len(a) for a in self._members_acc]
        return table, unknown, n_acc

    def accept_counts(self, visit_counts: np.ndarray) -> np.ndarray:
        """Map per-subset-state visit counts -> per-NFA-state match counts."""
        out = np.zeros(self.aut.num_states, dtype=np.int64)
        for sid in np.nonzero(visit_counts[: self.num_states])[0]:
            v = int(visit_counts[sid])
            for m in self._members_acc[sid]:
                out[m] += v
        return out
