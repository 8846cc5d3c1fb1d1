"""Pallas TPU kernel for the fast DFA chain pass.

Same contract as ``dfa_fast.chain_pass_full`` /``chain_pass_finals`` but with
the whole chunk's inner loop fused in VMEM.  The key structural fact: the
table-row lookup ``rows_t = onehot(cls_t) @ T`` does NOT depend on the chain
state — only the per-lane select does.  So the kernel:

  phase A (per W-step window): one ``(W*TILE, C) @ (C, S)`` GEMM on the MXU
     producing all rows of the window into VMEM scratch (full MXU shapes,
     no sequential constraint);
  phase B (sequential): W cheap VPU select-reduce steps
     ``state <- sum(rows_t * onehot(state), -1)``.

HBM traffic is ~1 class byte in + 5 bytes out per scanned byte (states +
accept bits), vs the XLA scan's per-step loop boundaries.  Grid cells tile
the NB chain lanes; every cell runs the full B-byte chain for its lanes.

Integer exactness: row values are states < 2^24, exact in f32 accumulation
from one-hot bf16 operands (SURVEY.md SS7.4 item 4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tables import DfaTables

__all__ = ["chain_pass_full_pallas", "chain_pass_finals_pallas"]

LANE_TILE = 256   # chain lanes per grid cell
WINDOW = 8        # byte-steps per phase-A GEMM


def _kernel(cls_ref, t_ref, acc_vec_ref, entry_ref, finals_ref,
            *out_refs, b, c, s, emit_outputs):
    """cls_ref: (B, TILE) int32 byte-class columns for this cell's lanes;
    t_ref: (C, S) bf16 table; acc_vec_ref: (1, S) f32 accept mask;
    entry_ref: (1, TILE) int32; finals_ref: (1, TILE) int32;
    out_refs = (states_ref, acc_ref), (B, TILE) each, full pass only."""
    states_ref, acc_ref = out_refs if emit_outputs else (None, None)
    tile = cls_ref.shape[1]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    acc_vec = acc_vec_ref[0, :]  # (S,)

    def window(w, state):
        cls_win = cls_ref[pl.ds(w * WINDOW, WINDOW), :]            # (W, TILE)
        oh = (cls_win.reshape(WINDOW * tile, 1) == iota_c).astype(jnp.bfloat16)
        rows = jnp.dot(oh, t_ref[:], preferred_element_type=jnp.float32)

        def step(t, state):
            r = jax.lax.dynamic_slice(rows, (t * tile, 0), (tile, s))
            oh_x = (state[:, None] == iota_s).astype(jnp.float32)  # (TILE, S)
            if emit_outputs:
                states_ref[w * WINDOW + t, :] = state
                acc_ref[w * WINDOW + t, :] = (
                    jnp.sum(oh_x * acc_vec[None, :], axis=-1) > 0.0
                )
            return jnp.sum(r * oh_x, axis=-1).astype(jnp.int32)

        for t in range(WINDOW):  # static unroll
            state = step(t, state)
        return state

    state = jax.lax.fori_loop(0, b // WINDOW, window, entry_ref[0, :])
    finals_ref[0, :] = state


def _pallas_chain(tables: DfaTables, cls_seq: jnp.ndarray, entries: jnp.ndarray,
                  emit_outputs: bool, interpret: bool):
    b, nb = cls_seq.shape
    c, s = tables.table.shape
    assert nb % LANE_TILE == 0, f"num_blocks must be a multiple of {LANE_TILE}"
    assert b % WINDOW == 0, f"block bytes must be a multiple of {WINDOW}"
    grid = (nb // LANE_TILE,)

    kernel = functools.partial(
        _kernel, b=b, c=c, s=s, emit_outputs=emit_outputs
    )
    out_shape = [jax.ShapeDtypeStruct((1, nb), jnp.int32)]  # finals
    out_specs = [
        pl.BlockSpec((1, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    ]
    if emit_outputs:
        out_shape += [
            jax.ShapeDtypeStruct((b, nb), jnp.int32),    # states
            jax.ShapeDtypeStruct((b, nb), jnp.bool_),    # accept bits
        ]
        out_specs += [
            pl.BlockSpec((b, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ]
    acc_vec = tables.accept.astype(jnp.float32)[None, :]  # (1, S)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        interpret=interpret,
    )(cls_seq, tables.table.astype(jnp.bfloat16), acc_vec, entries[None, :])
    if emit_outputs:
        finals, states, acc = out
        return finals[0], states, acc
    return out[0][0], None, None


def _auto_interpret(interpret):
    # run interpreted off-TPU (virtual CPU test meshes); compiled on TPU
    return jax.default_backend() != "tpu" if interpret is None else interpret


@functools.partial(jax.jit, static_argnames=("interpret",))
def chain_pass_finals_pallas(tables: DfaTables, cls_seq: jnp.ndarray,
                             entries: jnp.ndarray, interpret: bool | None = None):
    finals, _, _ = _pallas_chain(
        tables, cls_seq, entries, False, _auto_interpret(interpret)
    )
    return finals


@functools.partial(jax.jit, static_argnames=("interpret",))
def chain_pass_full_pallas(tables: DfaTables, cls_seq: jnp.ndarray,
                           entries: jnp.ndarray, interpret: bool | None = None):
    return _pallas_chain(tables, cls_seq, entries, True, _auto_interpret(interpret))
