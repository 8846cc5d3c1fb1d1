"""On-chip probe: can the one-hot chain step ride the int8 MXU path?

v5e executes s8 x s8 -> s32 matmuls at ~2x the bf16 MAC rate, and the
k-gram engine is partially MXU-bound (measured ~52% of bf16 peak), so an
int8 one-hot GEMM could lift the counting headline well past 6 GB/s.
Exactness is free: integer operands, integer accumulate.

This probe times three variants of the same chain pass on the tokenizer
k-gram tables (values <= 127 fit int8):
  A) bf16 operands, f32 accumulate (current engine)
  B) int8 operands, preferred_element_type=int32, int select-reduce
  C) int8 operands, int32 accumulate, f32 select-reduce (mixed)

Run only when no other chip process is active:
  timeout 560 python scripts/tpu_int8_probe.py
"""

# --- r5 guard: the int8 flags this probe toggles were PRUNED (they lost
# their on-chip A/Bs; docs/ENGINE_GRAVEYARD.md).  setattr on the module
# would silently succeed and this script would measure an A/A comparison,
# emitting a bogus artifact.  Check out commit 2a3e0ba to re-run it.
import regex_fpga_tpu.ops.dfa_fast as _df

if not hasattr(_df, "INT8_SPLIT") and not hasattr(_df, "INT8_ONEHOT"):
    raise SystemExit(
        "This probe targets the pruned int8 engine paths "
        "(docs/ENGINE_GRAVEYARD.md). Check out commit 2a3e0ba to re-run."
    )

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import functools

from regex_fpga_tpu.models import build_tokenizer_dfa
from regex_fpga_tpu.ops import build_dfa_tables
from regex_fpga_tpu.ops.kgram import build_kgram, map_kgram_classes


def main() -> None:
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)
    kg = build_kgram(dt, levels=2)
    c, s = kg.table.shape
    assert kg.table.max() < 128 and kg.acc_table.max() < 128
    print(f"# kgram C={c} S={s} k={kg.k}", file=sys.stderr)

    l = 1 << 26
    frag = (b"The quick brown fox jumps over 1234 lazy dogs 99.5%!  " * 64)
    text = np.frombuffer(frag * (l // len(frag) + 1), np.uint8)[:l]
    t0 = time.perf_counter()
    ck = jnp.asarray(map_kgram_classes(kg, text).astype(np.int16))
    np.asarray(ck[:4])
    print(f"# upload done {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    nb = 16384
    steps = (l // kg.k) // nb
    ta_i8 = jnp.asarray(
        np.concatenate([kg.table, kg.acc_table], axis=1).astype(np.int8)
    )
    ta_bf = jnp.asarray(
        np.concatenate([kg.table, kg.acc_table], axis=1).astype(np.float32)
    ).astype(jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("mode",))
    def chain(ta, ck, mode: str):
        cls_seq = ck.astype(jnp.int32).reshape(nb, steps).T  # (B, NB)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)

        def body(carry, cls_t):
            st, tot = carry
            if mode == "bf16":
                oh = (cls_t[:, None] == iota_c).astype(jnp.bfloat16)
                rows = jnp.dot(oh, ta, preferred_element_type=jnp.float32)
                oh_x = (st[:, None] == iota_s).astype(jnp.float32)
                nxt = jnp.sum(rows[:, :s] * oh_x, -1).astype(jnp.int32)
                acc = jnp.sum(rows[:, s:] * oh_x, -1).astype(jnp.int32)
            elif mode == "int8":
                oh = (cls_t[:, None] == iota_c).astype(jnp.int8)
                rows = jnp.dot(oh, ta, preferred_element_type=jnp.int32)
                oh_x = (st[:, None] == iota_s).astype(jnp.int32)
                nxt = jnp.sum(rows[:, :s] * oh_x, -1)
                acc = jnp.sum(rows[:, s:] * oh_x, -1)
            else:  # int8 GEMM + f32 select-reduce (VPU prefers f32)
                oh = (cls_t[:, None] == iota_c).astype(jnp.int8)
                rows = jnp.dot(
                    oh, ta, preferred_element_type=jnp.int32
                ).astype(jnp.float32)
                oh_x = (st[:, None] == iota_s).astype(jnp.float32)
                nxt = jnp.sum(rows[:, :s] * oh_x, -1).astype(jnp.int32)
                acc = jnp.sum(rows[:, s:] * oh_x, -1).astype(jnp.int32)
            return (nxt, tot + acc), None

        e0 = jnp.full((nb,), tok.start, jnp.int32)
        (fin, tot), _ = jax.lax.scan(
            body, (e0, jnp.zeros((nb,), jnp.int32)), cls_seq
        )
        return fin[-1], tot.sum()

    ref = None
    for mode, ta in (("bf16", ta_bf), ("int8", ta_i8), ("mixed", ta_i8)):
        try:
            t0 = time.perf_counter()
            f, tot = chain(ta, ck, mode)
            tot = int(tot)
            warm = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                f, tt = chain(ta, ck, mode)
                int(tt)
                times.append(time.perf_counter() - t0)
            times.sort()
            if ref is None:
                ref = tot
            print(f"{mode}: {l/times[1]/1e9:.2f} GB/s "
                  f"(spread {l/times[-1]/1e9:.2f}-{l/times[0]/1e9:.2f}; "
                  f"compile {warm:.0f}s; total={tot} "
                  f"{'EXACT' if tot == ref else 'MISMATCH!'})")
        except Exception as e:
            print(f"{mode}: failed {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
