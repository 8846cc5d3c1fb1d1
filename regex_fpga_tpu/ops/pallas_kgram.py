"""Pallas TPU kernel for the k-gram counting chain pass.

Same math as ``kgram.dfa_scan_kgram``'s full pass — per step one fused
one-hot GEMM yields the transition row and the accept-count row — but the
whole block chain runs in VMEM: the only HBM traffic is the k-gram class
ids in and (finals, totals) out, instead of XLA's per-step operand
round-trips.

Layout trick (lets both selects use plain 128-lane one-hots, no lane
slicing, which Mosaic cannot relayout): the fused table is padded to
(C, 128) with transitions T[c, s] at lane s and accept counts A[c, s] at
lane 64 + s, so

    rows = onehot(cls) @ TA128          # (TILE, 128) one MXU tile wide
    next = <rows, onehot(state)>        # lanes 0..S-1
    acc  = <rows, onehot(state + 64)>   # lanes 64..64+S-1

requiring S <= 64 (the pre-split tokenizer DFA has S = 23; callers with
larger automata use the jnp path).  Values stay exact: state ids <= 64 and
accept counts <= k are exactly representable in bf16; accumulation is f32.

Reference context: this is the SURVEY.md SS5.7 sequence-parallel hot loop;
the reference engine scans serially per char (``Design/FPGA.v:733-737``).

MEASURED on real v5e (2026-08-20, 64 MiB tokenizer stream, nb=16384,
medians of 3, exact totals): this kernel 1.46 GB/s vs the jnp/XLA k-gram
path 2.37 GB/s in the SAME run — the kernel reaches 62% of the XLA plan
(vs ~50% for the k=1 Pallas chain), consistent with the per-step analysis
in ops/pallas_dfa.py's measured verdict: the explicit-DMA program wins
per-lane but cannot express XLA's wide-plan step overlap.  Kept as the
fused-VMEM design point; production stays on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["kgram_chain_pallas", "pack_ta128", "KGRAM_LANE_TILE"]

KGRAM_LANE_TILE = 512   # chain lanes (blocks) per grid cell
_WINDOW = 128           # ref-load window (Mosaic: dynamic lane slices must
                        # be 128-aligned — empirically 32-aligned fails)
_SUB = 32               # static steps per loop body (larger unrolls blow up
                        # the Mosaic program: 64+ fails to compile, 32 is ~5s)


def pack_ta128(table, acc_table) -> jnp.ndarray:
    """Pack (C, S) transition + accept tables into the (C, 128) layout.

    The single source of the kernel's lane contract (transitions at lane s,
    accept counts at lane 64 + s); jit-traceable, accepts numpy or jnp.
    """
    c, s = table.shape
    assert s <= 64, "pallas k-gram path requires S <= 64"
    ta = jnp.zeros((c, 128), dtype=jnp.int32)
    return ta.at[:, :s].set(table).at[:, 64 : 64 + s].set(acc_table)


def _kernel(cls_ref, ta_ref, entry_ref, finals_ref, tot_ref, *, b, c):
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def steps(chunk, state, tot):
        """_SUB static steps over chunk's first _SUB columns."""
        for t in range(_SUB):
            col = chunk[:, t : t + 1]                       # (TILE, 1)
            oh_c = (col == iota_c).astype(ta_ref.dtype)     # (TILE, C)
            rows = jnp.dot(oh_c, ta_ref[:],
                           preferred_element_type=jnp.float32)  # (TILE, 128)
            oh_t = (state == iota_l).astype(jnp.float32)
            oh_a = ((state + 64) == iota_l).astype(jnp.float32)
            nxt = jnp.sum(rows * oh_t, axis=-1, keepdims=True)
            acc = jnp.sum(rows * oh_a, axis=-1, keepdims=True)
            tot = tot + acc.astype(jnp.int32)
            state = nxt.astype(jnp.int32)
        return state, tot

    def window(w, carry):
        state, tot = carry  # (TILE, 1) int32 each
        base = pl.multiple_of(w * _WINDOW, _WINDOW)
        chunk = cls_ref[:, pl.ds(base, _WINDOW)]  # (TILE, W) 128-aligned load

        def sub(si, carry2):
            # static columns 0.._SUB-1, then rotate the window value so the
            # next _SUB columns move to the front — keeps the compiled body
            # at _SUB steps while consuming the whole 128-lane window
            chunk2, state2, tot2 = carry2
            state2, tot2 = steps(chunk2, state2, tot2)
            # pltpu.roll requires non-negative shift: rotate right by
            # W - _SUB == rotate left by _SUB (brings column _SUB to front)
            rolled = pltpu.roll(chunk2, shift=_WINDOW - _SUB, axis=1)
            return rolled, state2, tot2

        _, state, tot = jax.lax.fori_loop(
            0, _WINDOW // _SUB, sub, (chunk, state, tot)
        )
        return state, tot

    state, tot = jax.lax.fori_loop(
        0, b // _WINDOW, window,
        (entry_ref[:], jnp.zeros_like(entry_ref[:])),
    )
    finals_ref[:] = state
    tot_ref[:] = tot


@functools.partial(jax.jit, static_argnames=("interpret",))
def kgram_chain_pallas(
    ta128: jnp.ndarray,      # (C, 128) packed table (pack_ta128)
    cls_blocks: jnp.ndarray,  # (NB, B) int32 block-major k-gram class ids
    entries: jnp.ndarray,     # (NB,) int32
    interpret: bool | None = None,
):
    """One full counting pass; returns (finals (NB,), totals (NB,))."""
    nb, b = cls_blocks.shape
    c = ta128.shape[0]
    assert nb % KGRAM_LANE_TILE == 0, (
        f"num_blocks must be a multiple of {KGRAM_LANE_TILE}")
    assert b % _WINDOW == 0, f"steps per block must be a multiple of {_WINDOW}"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mmdt = jnp.bfloat16 if not interpret else jnp.float32
    grid = (nb // KGRAM_LANE_TILE,)
    kernel = functools.partial(_kernel, b=b, c=c)
    finals, totals = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((KGRAM_LANE_TILE, b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((KGRAM_LANE_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1), jnp.int32),
        ],
        out_specs=[
            pl.BlockSpec((KGRAM_LANE_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KGRAM_LANE_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(
        cls_blocks,
        # bf16 exact: lane values are state ids <= 64 or accept counts <= k
        ta128.astype(mmdt),
        entries[:, None],
    )
    return finals[:, 0], totals[:, 0]
