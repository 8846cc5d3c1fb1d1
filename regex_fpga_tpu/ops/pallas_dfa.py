"""Pallas TPU kernel for the fast DFA chain pass.

Same contract as ``dfa_fast.chain_pass_full``/``chain_pass_finals`` but with
the whole chunk's inner loop fused in VMEM.  Layout: chains are BLOCK-MAJOR
(``(NB, B)`` — one row per chain lane), so each byte-step reads a natural
``(TILE, 1)`` column slice and every intermediate stays 2D (Mosaic cannot
relayout across the lane dimension, so no reshapes/transposes appear):

    col    = cls_ref[:, t]                (TILE, 1) int32
    oh_c   = col == iota_C                (TILE, C) -> bf16
    rows   = oh_c @ T                     (TILE, S) f32 via MXU — exact
    oh_x   = state == iota_S              (TILE, S)
    state  = sum(rows * oh_x, -1)         (TILE, 1) VPU select-reduce

The row GEMM depends only on the byte, not the chain state, so the MXU and
VPU work of consecutive steps pipeline naturally.  HBM traffic is ~1 class
byte in + 5 bytes out per scanned byte.

Integer exactness: the table rides in bf16 only when ids <= 256 (7-bit
mantissa), f32 otherwise (exact below 2^24); accumulation is f32
(SURVEY.md SS7.4 item 4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dfa_fast import mm_dtype
from .tables import DfaTables

__all__ = ["chain_pass_full_pallas", "chain_pass_finals_pallas", "LANE_TILE"]

LANE_TILE = 256   # chain lanes (blocks) per grid cell


WINDOW = 128  # lane-aligned store/load granularity (Mosaic: lane indices
              # must be static multiples of 128; within a window the step
              # index is a static Python int)


def _kernel(cls_ref, t_ref, acc_vec_ref, entry_ref, finals_ref,
            *rest, b, c, s, emit_outputs):
    """cls_ref: (TILE, B) int32 block-major classes; t_ref: (C, S) bf16;
    acc_vec_ref: (1, S) f32; entry/finals: (TILE, 1) int32; when
    emit_outputs, rest = (states_ref, acc_ref, st_scratch, acc_scratch)."""
    if emit_outputs:
        states_ref, acc_ref, st_scr, acc_scr = rest
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    acc_vec = acc_vec_ref[:]  # (1, S)

    def window(w, state):  # state: (TILE, 1) int32
        base = pl.multiple_of(w * WINDOW, WINDOW)
        chunk = cls_ref[:, pl.ds(base, WINDOW)]  # (TILE, W) aligned load
        for t in range(WINDOW):  # static unroll
            col = chunk[:, t : t + 1]                           # (TILE, 1)
            oh_c = (col == iota_c).astype(t_ref.dtype)          # (TILE, C)
            rows = jnp.dot(oh_c, t_ref[:],
                           preferred_element_type=jnp.float32)  # (TILE, S)
            oh_x = (state == iota_s).astype(jnp.float32)        # (TILE, S)
            if emit_outputs:
                st_scr[:, t : t + 1] = state
                acc_scr[:, t : t + 1] = (
                    jnp.sum(oh_x * acc_vec, axis=-1, keepdims=True) > 0.0
                ).astype(jnp.int32)
            state = jnp.sum(rows * oh_x, axis=-1, keepdims=True).astype(jnp.int32)
        if emit_outputs:
            states_ref[:, pl.ds(base, WINDOW)] = st_scr[:]
            acc_ref[:, pl.ds(base, WINDOW)] = acc_scr[:] != 0
        return state

    state = jax.lax.fori_loop(0, b // WINDOW, window, entry_ref[:])
    finals_ref[:] = state


def _pallas_chain(tables: DfaTables, cls_blocks: jnp.ndarray,
                  entries: jnp.ndarray, emit_outputs: bool, interpret: bool):
    """cls_blocks: (NB, B) block-major class ids."""
    nb, b = cls_blocks.shape
    c, s = tables.table.shape
    assert nb % LANE_TILE == 0, f"num_blocks must be a multiple of {LANE_TILE}"
    assert b % WINDOW == 0, f"block bytes must be a multiple of {WINDOW}"
    grid = (nb // LANE_TILE,)

    kernel = functools.partial(_kernel, b=b, c=c, s=s, emit_outputs=emit_outputs)
    scratch_shapes = (
        [
            pltpu.VMEM((LANE_TILE, WINDOW), jnp.int32),
            pltpu.VMEM((LANE_TILE, WINDOW), jnp.int32),
        ]
        if emit_outputs
        else []
    )
    out_shape = [jax.ShapeDtypeStruct((nb, 1), jnp.int32)]  # finals
    out_specs = [
        pl.BlockSpec((LANE_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    if emit_outputs:
        out_shape += [
            jax.ShapeDtypeStruct((nb, b), jnp.int32),    # state before byte t
            jax.ShapeDtypeStruct((nb, b), jnp.bool_),    # accept bits
        ]
        out_specs += [
            pl.BlockSpec((LANE_TILE, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE_TILE, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
    acc_vec = tables.accept.astype(jnp.float32)[None, :]  # (1, S)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((LANE_TILE, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(
        cls_blocks,
        # exactness rule shared with the other engines (dfa_fast.mm_dtype)
        tables.table.astype(mm_dtype(s)),
        acc_vec,
        entries[:, None],
    )
    if emit_outputs:
        finals, states, acc = out
        return finals[:, 0], states, acc
    return out[0][:, 0], None, None


def _auto_interpret(interpret):
    # run interpreted off-TPU (virtual CPU test meshes); compiled on TPU
    return jax.default_backend() != "tpu" if interpret is None else interpret


@functools.partial(jax.jit, static_argnames=("interpret",))
def chain_pass_finals_pallas(tables: DfaTables, cls_seq: jnp.ndarray,
                             entries: jnp.ndarray, interpret: bool | None = None):
    """cls_seq: (B, NB) columns (the jnp engines' layout); transposed here to
    the kernel's block-major layout once per call."""
    finals, _, _ = _pallas_chain(
        tables, cls_seq.T, entries, False, _auto_interpret(interpret)
    )
    return finals


@functools.partial(jax.jit, static_argnames=("interpret",))
def chain_pass_full_pallas(tables: DfaTables, cls_seq: jnp.ndarray,
                           entries: jnp.ndarray, interpret: bool | None = None):
    finals, states, acc = _pallas_chain(
        tables, cls_seq.T, entries, True, _auto_interpret(interpret)
    )
    # back to the engines' (B, NB) convention
    return finals, states.T, acc.T
