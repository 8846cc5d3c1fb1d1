"""k-gram precomposition: scan k bytes per engine step (throughput mode).

The fast engine's cost is per STEP (one (NB,C)@(C,S) GEMM + select-reduce),
not per byte.  Transition functions compose associatively, so k consecutive
byte-classes fuse into one "k-gram class" whose table column is the composed
function; the engine then consumes k bytes per step.  Classes are
recompressed at each doubling (distinct composed function+count columns,
bounded by the automaton's transition monoid).

Per-position match bits are not observable at k-gram granularity, so this
mode carries an ACCEPT-COUNT table alongside:

    A_1[c, s]        = accept(s)                      (count before the byte)
    A_2k[(c1,c2), s] = A_k[c1, s] + A_k[c2, T_k[c1, s]]

giving exact TOTAL match counts (reference timing: accept before each byte,
final-byte accept dropped) at k bytes per step — the mode for counting
scans (IDS totals, grep -c, benchmarking).  Use k=1 when per-position masks
or per-state histograms are needed.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .tables import DfaTables

__all__ = ["KgramTables", "build_kgram", "map_kgram_classes", "dfa_scan_kgram"]


@dataclasses.dataclass(frozen=True)
class KgramTables:
    """Composed tables for k = 2^levels bytes per step."""

    table: np.ndarray            # (C_k, S) int32 composed transitions
    acc_table: np.ndarray        # (C_k, S) int32 accept counts per step
    class_of: np.ndarray         # (256,) base byte -> level-0 class
    pair_maps: list[np.ndarray]  # level i: (C_i*C_i,) -> C_{i+1}
    level_classes: list[int]     # C_i per level (len = levels + 1)
    num_states: int
    k: int


def build_kgram(
    tables: DfaTables, levels: int = 2, max_classes: int = 2048
) -> KgramTables | None:
    """Build 2^levels-gram tables, or None if the class count explodes."""
    t = np.asarray(tables.table).astype(np.int32)       # (C, S)
    a = np.broadcast_to(
        np.asarray(tables.accept).astype(np.int32), t.shape
    ).copy()                                            # A_1[c, s] = accept[s]
    pair_maps: list[np.ndarray] = []
    level_classes = [t.shape[0]]
    for _ in range(levels):
        c, s = t.shape
        if c * c > (1 << 22):
            return None
        t2 = t[:, t]                       # [c2, c1, s] = t[c2, t[c1, s]]
        t2 = t2.transpose(1, 0, 2)         # [c1, c2, s]
        a2 = a[:, None, :] + a[:, t].transpose(1, 0, 2)
        # a2[c1, c2, s] = a[c1, s] + a[c2, t[c1, s]]
        t2 = t2.reshape(c * c, s)
        a2 = a2.reshape(c * c, s)
        both = np.concatenate([t2, a2], axis=1)
        uniq, remap = np.unique(both, axis=0, return_inverse=True)
        if uniq.shape[0] > max_classes:
            return None
        pair_maps.append(remap.astype(np.int32))
        t, a = uniq[:, :s].astype(np.int32), uniq[:, s:].astype(np.int32)
        level_classes.append(t.shape[0])
    return KgramTables(
        table=t,
        acc_table=a,
        class_of=np.asarray(tables.class_of),
        pair_maps=pair_maps,
        level_classes=level_classes,
        num_states=tables.num_states,
        k=1 << levels,
    )


def map_kgram_classes(kg: KgramTables, data: np.ndarray) -> np.ndarray:
    """Map raw bytes to k-gram class ids (length L / k; L % k == 0)."""
    cls = kg.class_of[np.asarray(data, dtype=np.uint8)]
    assert len(cls) % kg.k == 0
    for lvl, remap in enumerate(kg.pair_maps):
        c = kg.level_classes[lvl]
        a, b = cls[0::2].astype(np.int64), cls[1::2].astype(np.int64)
        cls = remap[a * c + b]
    return cls.astype(np.int32)


class KgramScanResult(NamedTuple):
    final_state: jnp.ndarray  # () int32
    total: jnp.ndarray        # () int32 total matches
    converged: jnp.ndarray
    iterations: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("num_blocks", "max_iters"))
def dfa_scan_kgram(
    table: jnp.ndarray,       # (C_k, S) int32
    acc_table: jnp.ndarray,   # (C_k, S) int32
    classes_k: jnp.ndarray,   # (L/k,) int32 k-gram class ids
    num_blocks: int = 65536,
    start: int = 0,
    max_iters: int = 16,
) -> KgramScanResult:
    """Jacobi chain scan over k-gram steps; returns final state + exact
    total match count (gather-free MXU inner loop as in dfa_fast)."""
    l = classes_k.shape[0]
    assert l % num_blocks == 0
    b = l // num_blocks
    c, s = table.shape
    # bf16 is exact only for integers <= 256 (7-bit mantissa); off-TPU
    # bf16 dot may be unsupported entirely
    mmdt = (jnp.bfloat16 if s <= 256 and jax.default_backend() == "tpu"
            else jnp.float32)
    t_bf = table.astype(mmdt)
    a_f = acc_table.astype(mmdt)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    cls_seq = classes_k.astype(jnp.int32).reshape(num_blocks, b).T
    start = jnp.asarray(start, jnp.int32)

    def step(state, cls_t, with_acc):
        oh_c = (cls_t[:, None] == iota_c).astype(mmdt)
        rows_t = jnp.dot(oh_c, t_bf, preferred_element_type=jnp.float32)
        oh_x = (state[:, None] == iota_s).astype(jnp.float32)
        nxt = jnp.sum(rows_t * oh_x, axis=-1).astype(jnp.int32)
        if not with_acc:
            return nxt, None
        rows_a = jnp.dot(oh_c, a_f, preferred_element_type=jnp.float32)
        acc = jnp.sum(rows_a * oh_x, axis=-1).astype(jnp.int32)
        return nxt, acc

    def pass_finals(entries):
        def body(st, cl):
            nxt, _ = step(st, cl, False)
            return nxt, None
        finals, _ = jax.lax.scan(body, entries, cls_seq)
        return finals

    def cond(carry):
        _, done, it = carry
        return jnp.logical_and(~done, it < max_iters)

    def body(carry):
        entries, _, it = carry
        finals = pass_finals(entries)
        new_entries = jnp.concatenate([start[None], finals[:-1]])
        return new_entries, jnp.all(new_entries == entries), it + 1

    entries0 = jnp.full((num_blocks,), start, dtype=jnp.int32)
    entries, converged, iters = jax.lax.while_loop(
        cond, body, (entries0, jnp.array(False), jnp.array(0, jnp.int32))
    )

    def body_full(carry, cl):
        st, tot = carry
        nxt, acc = step(st, cl, True)
        return (nxt, tot + acc), None

    (finals, totals), _ = jax.lax.scan(
        body_full, (entries, jnp.zeros_like(entries)), cls_seq
    )
    return KgramScanResult(
        final_state=finals[-1],
        total=totals.sum(),
        converged=converged,
        iterations=iters,
    )
