"""Ruleset-parallel scanning — the expert-parallel axis (SURVEY.md SS2.2).

The reference binds exactly one compiled ruleset to its BRAM; scanning a
corpus against several rulesets (e.g. l-7_filter AND snort_16) means
re-synthesizing.  Here rulesets are padded to a common table shape, stacked,
and sharded over mesh devices: every device scans the (replicated) stream
against its ruleset shard, so R rulesets cost one pass of wall-clock.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.nfa_engine import DEFAULT_ACTIVE_BOUND, nfa_scan_jax
from ..ops.tables import NfaTables
from .mesh import DATA_AXIS, SEQ_AXIS

__all__ = ["stack_nfa_tables", "multi_ruleset_scan"]


def stack_nfa_tables(tables: list[NfaTables]) -> NfaTables:
    """Pad rulesets to a common (C, S+1, K) shape and stack on a leading
    ruleset axis.  Sentinels are remapped to the padded S so inactive slots
    stay self-absorbing."""
    c_max = max(t.delta.shape[0] for t in tables)
    s_max = max(t.num_states for t in tables)
    k_max = max(t.delta.shape[2] for t in tables)
    deltas, classes, accepts = [], [], []
    for t in tables:
        d = np.asarray(t.delta)
        s = t.num_states
        # remap old sentinel (s) to new sentinel (s_max)
        d = np.where(d == s, s_max, d)
        pad = np.full((c_max, s_max + 1, k_max), s_max, dtype=np.int32)
        pad[: d.shape[0], : d.shape[1] - 1, : d.shape[2]] = d[:, :-1, :]
        deltas.append(pad)
        classes.append(np.asarray(t.class_of))
        a = np.zeros(s_max + 1, dtype=bool)
        a[:s] = np.asarray(t.accept)[:s]
        accepts.append(a)
    return NfaTables(
        delta=jnp.asarray(np.stack(deltas)),
        class_of=jnp.asarray(np.stack(classes)),
        accept=jnp.asarray(np.stack(accepts)),
        num_states=s_max,
        max_fanout=k_max,
    )


@functools.partial(
    jax.jit, static_argnames=("mesh", "active_bound")
)
def multi_ruleset_scan(
    mesh,
    stacked: NfaTables,
    stream: jnp.ndarray,
    active_bound: int = DEFAULT_ACTIVE_BOUND,
):
    """Scan one stream against R stacked rulesets, ruleset axis sharded over
    all mesh devices.  Returns per-ruleset counts (R, S_max)."""
    r = stacked.delta.shape[0]
    n_dev = mesh.devices.size
    assert r % n_dev == 0, f"{r} rulesets must divide over {n_dev} devices"

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P((DATA_AXIS, SEQ_AXIS)), P((DATA_AXIS, SEQ_AXIS)),
                  P((DATA_AXIS, SEQ_AXIS)), P()),
        out_specs=P((DATA_AXIS, SEQ_AXIS)),
        check_vma=False,
    )
    def run(delta, class_of, accept, stream):
        def one(d, c, a):
            t = NfaTables(
                delta=d, class_of=c, accept=a,
                num_states=stacked.num_states, max_fanout=stacked.max_fanout,
            )
            return nfa_scan_jax(t, stream, active_bound).counts

        return jax.vmap(one)(delta, class_of, accept)

    return run(stacked.delta, stacked.class_of, stacked.accept, stream)
