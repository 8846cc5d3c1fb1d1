"""Pallas TPU kernel for the fast DFA chain pass.

Same contract as ``dfa_fast.chain_pass_full``/``chain_pass_finals`` but with
the chunk's inner loop fused in VMEM.  Layout: chains are BLOCK-MAJOR
(``(NB, B)`` — one row per chain lane), so each byte-step reads a natural
``(TILE, 1)`` column slice and every intermediate stays 2D (Mosaic cannot
relayout across the lane dimension, so no reshapes/transposes appear):

    col    = chunk[:, t]                  (TILE, 1) int32
    oh_c   = col == iota_C                (TILE, C) -> mm dtype
    rows   = oh_c @ T                     (TILE, S) f32 via MXU — exact
    oh_x   = state == iota_S              (TILE, S)
    state  = sum(rows * oh_x, -1)         (TILE, 1) VPU select-reduce

The row GEMM depends only on the byte, not the chain state, so the MXU and
VPU work of consecutive steps pipeline naturally.

Remote-compile discipline (CLAUDE.md Mosaic quirks, learned on pallas_kgram):
  * static unrolls are capped at ``_SUB = 32`` steps — larger unrolls blow up
    the Mosaic program and fail the remote compile;
  * dynamic lane slices must be 128-aligned, so instead of slicing the window
    at a dynamic 32-aligned offset the kernel ROTATES the (TILE, 128) window
    left by 32 after each sub-loop (``pltpu.roll``) and always reads static
    columns 0..31; per-step outputs are staged the mirror way — written to
    static columns 96..127 of a scratch that is rotated left by 32 BEFORE
    each sub-loop, so after 4 subs column k holds step k;
  * the byte dimension rides on a second grid axis (one 128-byte window per
    grid step) so Pallas' pipeline machinery double-buffers the HBM->VMEM
    window DMA against compute — the tpu-native equivalent of the
    reference's 3-stage fetch/compare overlap (``Design/FPGA.v:229-406``);
    the chain state carries across windows in a VMEM scratch.

Integer exactness: the table rides in bf16 only when ids <= 256 (7-bit
mantissa), f32 with HIGHEST-precision dots otherwise (exact below 2^24);
accumulation is f32 (SURVEY.md SS7.4 item 4; rule lives in dfa_fast.mm_dtype).

Roofline model (v5e, ~98.5 T bf16 MAC/s): every step issues 2 MXU ops that
pad to (TILE, 128) @ (128, 128) regardless of the real C/S (row lookup +
select-reduce; emit mode adds the accept column dot), i.e. ~32.8 K padded
MACs per byte -> ~3.0 GB/s pad-limited ceiling for the k=1 chain on ANY
lane count.  (The 6+ GB/s headline lives in the k-gram engine, which packs
4 bytes into the same padded step — ops/kgram.py.)

MEASURED VERDICT (r2 item 7 closure; v5e, 64 MiB tokenizer stream,
2026-08-20, scripts/tpu_pallas_sweep{,2}.py + tpu_xla_anchor.py, all
medians of 3 with spread <6%):

    lanes   XLA-jit finals/full   Pallas finals/full
    2048         0.75 / 0.46          1.00 / 0.68    GB/s
    4096              -               0.92 / compile-fail
    8192         1.96 / 1.16          compile-fail
    65536        1.42 / 1.22               -

* At MATCHED lane counts the explicit-DMA Pallas kernel BEATS the XLA
  plan by 1.3-1.5x (VMEM-resident chain state + fused window pipeline vs
  XLA's per-step HBM round trips).  The r2 hypothesis "widening lanes
  closes the gap" is REFUTED: uint8 windows + packed staging let tile
  4096 compile and it runs SLOWER than 2048 (0.92 vs 1.00) — lane-width
  amortization is exhausted by ~2048 and the kernel is bound by the
  serial per-step dependency chain (VPU compare/select traffic ~2.5 KB
  VMEM per byte + back-to-back dependent MXU issues), not by VMEM
  capacity.
* XLA's overall win comes ONLY from plan widths Mosaic cannot reach:
  finals at tile>=8192 and emit mode at tile>=4096 fail the remote
  compile (tpu_compile_helper exit 1 — Mosaic program size), and XLA's
  own sweet spot is 8192 lanes (1.96 GB/s finals, 65% of the padded
  ceiling), where it overlaps steps across lanes through HBM at a depth
  an explicit VMEM-resident pipeline cannot express in this program
  shape.
* Conclusion: the XLA plan is unreachable from explicit-DMA Pallas for
  the k=1 chain on this chip — kept as the measured design point; the
  production fast path stays on XLA (dfa_scan_fast), and Pallas remains
  the right tool where it wins (matched-width fixpoint inner passes,
  k-gram window kernels).

r4 note — the STATE-CONTRACTED orientation (``dfa_fast.transposed_step``,
1.8-2.4x on XLA at S=440/836) was evaluated for this kernel and
deprioritized: the per-step one-hot STATE staging becomes (TILE, S_pad)
— 1.8 MB/step at TILE=1024, S=896 — which reverses the uint8-window VMEM
economy that made tile 2048/4096 compile at all, and the binding
constraint above (serial per-step dependency chain) is orientation-
independent.  Both backends gained equally from the orientation; XLA's
wide-plan advantage persists, so the measured verdict stands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dfa_fast import mm_dtype, mm_precision
from .tables import DfaTables

__all__ = [
    "chain_pass_full_pallas",
    "chain_pass_finals_pallas",
    "chain_pass_counts_pallas",
    "LANE_TILE",
]

LANE_TILE = 1024  # chain lanes (blocks) per grid cell.  Counts mode
                  # (chain_pass_counts_pallas) measured 1.06 GB/s on v5e
                  # (tokenizer DFA, 32 MiB, exact) vs 2.46 GB/s for the
                  # 32768-lane jnp engine — same story as below.
                  # Measured on v5e
                  # (64 MiB stream, tokenizer DFA S=23/C=10, 2026-08-19):
                  # full-output 0.60/0.79/0.94/0.98 GB/s and finals-only
                  # 1.09/1.23/1.33/1.38 GB/s at 256/512/1024/2048 lanes —
                  # per-op overhead amortizes with lane width until the
                  # VMEM window buffers cap it.  The jnp/XLA chain pass runs
                  # the same math at 65536 lanes (2.1 GB/s full output), so
                  # the compiled Pallas kernel currently LOSES to XLA on
                  # this chip; it is kept as the explicit-DMA design point
                  # (and the fixpoint inner loop can use its faster
                  # finals-only pass).  bench.py records both honestly.

_WINDOW = 128     # bytes per grid step (Mosaic: lane-dim loads/stores must be
                  # 128-aligned)
_SUB = 32         # static steps per sub-loop (64+ fails the remote compile)


def _kernel(cls_ref, t_ref, acc_vec_ref, entry_ref, finals_ref,
            *rest, c, s, emit_outputs):
    """Grid: (lane_tiles, num_windows) — window axis innermost, sequential.

    cls_ref: (TILE, 128) uint8 block-major classes of this window (byte
    classes are always < 256; uint8 window buffers quarter the resident
    VMEM vs the r2 int32 layout, which is what capped lanes at ~2048 —
    the whole window is cast to int32 ONCE per grid step below);
    t_ref: (C, S) table in mm dtype; acc_vec_ref: (S, 1) f32 accept column;
    entry/finals: (TILE, 1) int32.  Scratch: st_state (TILE, 1) carries the
    chain state across windows; in emit mode ``st_scr`` stages state AND
    accept PACKED as ``state | accept << 30`` (state ids < 2^24), halving
    the staging footprint vs r2's two scratches.
    """
    if emit_outputs:
        states_ref, acc_ref, st_state, st_scr = rest
    else:
        (st_state,) = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        st_state[:] = entry_ref[:]

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    acc_col = acc_vec_ref[:]  # (S, 1) f32 accept indicator column
    ones_s = jnp.ones((s, 1), jnp.float32)
    prec = mm_precision(t_ref.dtype)

    def sub(si, carry):
        chunk, state = carry  # (TILE, 128) int32, (TILE, 1) int32
        if emit_outputs:
            # rotate staged outputs left by _SUB; this sub writes 96..127
            st_scr[:] = pltpu.roll(st_scr[:], shift=_WINDOW - _SUB, axis=1)
        for t in range(_SUB):  # static unroll, <= 32 steps
            col = chunk[:, t : t + 1]                           # (TILE, 1)
            oh_c = (col == iota_c).astype(t_ref.dtype)          # (TILE, C)
            rows = jnp.dot(oh_c, t_ref[:], precision=prec,
                           preferred_element_type=jnp.float32)  # (TILE, S)
            oh_x = (state == iota_s).astype(jnp.float32)        # (TILE, S)
            if emit_outputs:
                o = _WINDOW - _SUB + t
                # accept bit = <onehot(state), accept> — one MXU column dot
                # (a VPU cross-lane reduce here costs ~log2(S) shuffles and
                # dominated the measured kernel time); packed with the
                # state into one staged int32
                acc_bit = (
                    jnp.dot(oh_x, acc_col,
                            preferred_element_type=jnp.float32) > 0.0
                ).astype(jnp.int32)
                st_scr[:, o : o + 1] = state | (acc_bit << 30)
            # select-reduce on the MXU: sum_s (rows*oh_x)[i,s] via @ones
            state = jnp.dot(rows * oh_x, ones_s,
                            preferred_element_type=jnp.float32).astype(jnp.int32)
        # rotate the window so the next _SUB columns move to the front
        chunk = pltpu.roll(chunk, shift=_WINDOW - _SUB, axis=1)
        return chunk, state

    _, state = jax.lax.fori_loop(
        0, _WINDOW // _SUB, sub, (cls_ref[:].astype(jnp.int32), st_state[:])
    )
    if emit_outputs:
        packed = st_scr[:]
        states_ref[:] = packed & ((1 << 30) - 1)
        acc_ref[:] = (packed >> 30) != 0
    st_state[:] = state
    finals_ref[:] = state  # last window's write is the final state


def _counts_kernel(cls_ref, t_ref, entry_ref, finals_ref, counts_ref,
                   st_state, vis_scr, *, c, s):
    """Counting variant: per-lane one-hot visit accumulation (one VPU add
    per step into a (TILE, S) scratch) collapsed ONCE per window via an MXU
    column sum — no cross-lane work on the per-byte critical path.

    Exactness: per-lane visit counts <= block bytes and the per-tile column
    sum <= TILE * bytes, both far below 2^24, so f32 accumulation is exact.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        st_state[:] = entry_ref[:]
        vis_scr[:] = jnp.zeros_like(vis_scr)

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    ones_s = jnp.ones((s, 1), jnp.float32)
    prec = mm_precision(t_ref.dtype)
    tile = vis_scr.shape[0]
    ones_row = jnp.ones((1, tile), jnp.float32)

    def sub(si, carry):
        chunk, state, vis = carry
        for t in range(_SUB):  # static unroll, <= 32 steps
            col = chunk[:, t : t + 1]
            oh_c = (col == iota_c).astype(t_ref.dtype)
            rows = jnp.dot(oh_c, t_ref[:], precision=prec,
                           preferred_element_type=jnp.float32)
            oh_x = (state == iota_s).astype(jnp.float32)
            vis = vis + oh_x
            state = jnp.dot(rows * oh_x, ones_s,
                            preferred_element_type=jnp.float32).astype(jnp.int32)
        chunk = pltpu.roll(chunk, shift=_WINDOW - _SUB, axis=1)
        return chunk, state, vis

    _, state, vis = jax.lax.fori_loop(
        0, _WINDOW // _SUB, sub,
        (cls_ref[:].astype(jnp.int32), st_state[:], vis_scr[:]),
    )
    st_state[:] = state
    vis_scr[:] = vis
    finals_ref[:] = state
    # per-tile visit histogram: collapse lanes on the MXU (exact in f32).
    # counts_ref holds the FULL (n_tiles, S) array (Mosaic: block dims must
    # be 8/128-divisible or equal-to-full — a (1, S) block is neither);
    # each lane-tile writes its own row via a dynamic sublane store.
    counts_ref[pl.ds(pl.program_id(0), 1), :] = jnp.dot(
        ones_row, vis, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("interpret", "lane_tile"))
def chain_pass_counts_pallas(tables: DfaTables, cls_seq: jnp.ndarray,
                             entries: jnp.ndarray,
                             interpret: bool | None = None,
                             lane_tile: int = LANE_TILE):
    """Counting pass: returns (finals (NB,), counts (S,) int32) — the
    per-state ACCEPT-visit histogram (visits masked by accept, matching
    dfa_fast.chain_pass_counts)."""
    interpret = _auto_interpret(interpret)
    cls_blocks = cls_seq.T
    nb, b = cls_blocks.shape
    c, s = tables.table.shape
    assert nb % lane_tile == 0, f"num_blocks must be a multiple of {lane_tile}"
    assert b % _WINDOW == 0, f"steps per block must be a multiple of {_WINDOW}"
    # per-tile column sums accumulate in f32: exact only below 2^24 visits
    assert lane_tile * b < (1 << 24), (
        "lane_tile * block_bytes must stay below 2^24 for exact f32 "
        "visit accumulation — use more lane tiles or shorter blocks"
    )
    grid = (nb // lane_tile, b // _WINDOW)
    kernel = functools.partial(_counts_kernel, c=c, s=s)
    finals, tile_counts = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((lane_tile, _WINDOW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, s), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lane_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1), jnp.int32),
            jax.ShapeDtypeStruct((nb // lane_tile, s), jnp.float32),
        ],
        out_specs=[
            pl.BlockSpec((lane_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            # full-array block, resident across the grid; row i written by
            # lane-tile i (see kernel comment)
            pl.BlockSpec((nb // lane_tile, s), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((lane_tile, 1), jnp.int32),
            pltpu.VMEM((lane_tile, s), jnp.float32),
        ],
        interpret=interpret,
    )(
        cls_blocks.astype(jnp.uint8),  # see _pallas_chain: uint8 windows
        tables.table.astype(mm_dtype(s)),
        entries[:, None],
    )
    visits = jnp.sum(tile_counts, axis=0).astype(jnp.int32)
    counts = visits * tables.accept.astype(jnp.int32)
    return finals[:, 0], counts


def _pallas_chain(tables: DfaTables, cls_blocks: jnp.ndarray,
                  entries: jnp.ndarray, emit_outputs: bool, interpret: bool,
                  lane_tile: int = LANE_TILE):
    """cls_blocks: (NB, B) block-major class ids."""
    LANE_TILE_ = lane_tile
    nb, b = cls_blocks.shape
    c, s = tables.table.shape
    assert nb % LANE_TILE_ == 0, f"num_blocks must be a multiple of {LANE_TILE_}"
    assert b % _WINDOW == 0, f"block bytes must be a multiple of {_WINDOW}"
    grid = (nb // LANE_TILE_, b // _WINDOW)

    kernel = functools.partial(_kernel, c=c, s=s, emit_outputs=emit_outputs)
    scratch_shapes = [pltpu.VMEM((LANE_TILE_, 1), jnp.int32)]  # chain state
    out_shape = [jax.ShapeDtypeStruct((nb, 1), jnp.int32)]  # finals
    out_specs = [
        pl.BlockSpec((LANE_TILE_, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    ]
    if emit_outputs:
        out_shape += [
            jax.ShapeDtypeStruct((nb, b), jnp.int32),    # state before byte t
            jax.ShapeDtypeStruct((nb, b), jnp.bool_),    # accept bits
        ]
        out_specs += [
            pl.BlockSpec((LANE_TILE_, _WINDOW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE_TILE_, _WINDOW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ]
        # emit-mode staging: ONE packed scratch (state | accept << 30),
        # rolled by _SUB per sub-loop; rest order is
        # (states_ref, acc_ref, st_state, st_scr)
        scratch_shapes = [
            pltpu.VMEM((LANE_TILE_, 1), jnp.int32),
            pltpu.VMEM((LANE_TILE_, _WINDOW), jnp.int32),
        ]
    acc_vec = tables.accept.astype(jnp.float32)[:, None]  # (S, 1) column
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((LANE_TILE_, _WINDOW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, s), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANE_TILE_, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(
        # uint8 window buffers: byte classes are < 256 by construction, and
        # the resident double-buffered windows were the VMEM term that
        # capped lane width at ~2048 in r2
        cls_blocks.astype(jnp.uint8),
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


@functools.partial(jax.jit, static_argnames=("interpret", "lane_tile"))
def chain_pass_finals_pallas(tables: DfaTables, cls_seq: jnp.ndarray,
                             entries: jnp.ndarray, interpret: bool | None = None,
                             lane_tile: int = LANE_TILE):
    """cls_seq: (B, NB) columns (the jnp engines' layout); transposed here to
    the kernel's block-major layout once per call."""
    finals, _, _ = _pallas_chain(
        tables, cls_seq.T, entries, False, _auto_interpret(interpret), lane_tile
    )
    return finals


@functools.partial(jax.jit, static_argnames=("interpret", "lane_tile"))
def chain_pass_full_pallas(tables: DfaTables, cls_seq: jnp.ndarray,
                           entries: jnp.ndarray, interpret: bool | None = None,
                           lane_tile: int = LANE_TILE):
    finals, states, acc = _pallas_chain(
        tables, cls_seq.T, entries, True, _auto_interpret(interpret), lane_tile
    )
    # back to the engines' (B, NB) convention
    return finals, states.T, acc.T
