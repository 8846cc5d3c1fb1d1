"""Focused on-chip Pallas follow-up (r2 verdict #7 closure).

The full sweep (tpu_pallas_sweep.py, 2026-08-20 run) established:
  * pallas finals nb=8192 b=8192: 1.00 GB/s @ tile 2048, 0.92 @ tile 4096
    -> widening lanes past 2048 gains NOTHING (uint8 windows removed the
       VMEM cap; the cap was not the limiter).
  * xla finals at the same 8192 lanes: 0.13 GB/s — Pallas beats XLA 7x at
    matched lane counts; XLA's win comes only from its 65536-lane plan.
  * pallas full tile=4096 fails remote compile (Mosaic emit-mode program).

This script pins the remaining points: r2's comparable layout
(nb=2048..65536 at L=64MiB), one max-width finals tile, and the XLA
65536-lane anchor, so the module-header roofline verdict is fully
measured.  Run alone: timeout 560 python scripts/tpu_pallas_sweep2.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from regex_fpga_tpu.models import build_tokenizer_dfa
from regex_fpga_tpu.ops import build_dfa_tables
from regex_fpga_tpu.ops.dfa_fast import chain_pass_finals, chain_pass_full
from regex_fpga_tpu.ops.pallas_dfa import (
    chain_pass_finals_pallas,
    chain_pass_full_pallas,
)


def main() -> None:
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)
    l = 1 << 26  # 64 MiB
    frag = (b"The quick brown fox jumps over 1234 lazy dogs 99.5%!  " * 64)
    text = np.frombuffer(frag * (l // len(frag) + 1), np.uint8)[:l]
    cls_host = np.asarray(dt.class_of).astype(np.uint8)[text]
    t0 = time.perf_counter()
    cls_flat = jnp.asarray(cls_host)
    np.asarray(cls_flat[:4])
    print(f"# upload done in {time.perf_counter()-t0:.0f}s", file=sys.stderr)

    def bench(fn, tag):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[0] if isinstance(out, tuple) else out)
        warm = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out[0] if isinstance(out, tuple) else out)
            times.append(time.perf_counter() - t0)
        times.sort()
        print(f"{tag}: {l/times[1]/1e9:.2f} GB/s "
              f"(spread {l/times[-1]/1e9:.2f}-{l/times[0]/1e9:.2f}, "
              f"warm+compile {warm:.1f}s)", flush=True)
        return l / times[1]

    def layout(nb):
        b = l // nb
        cls_seq = jax.jit(lambda x: x.reshape(nb, b).T.astype(jnp.int32))(cls_flat)
        np.asarray(cls_seq[:1, :1])
        return cls_seq, jnp.zeros((nb,), jnp.int32)

    # 1. XLA anchor at its preferred width (what bench.py uses)
    cls_seq, entries = layout(65536)
    bench(lambda: chain_pass_finals(dt, cls_seq, entries), "xla finals nb=65536")
    bench(lambda: chain_pass_full(dt, cls_seq, entries), "xla full nb=65536")

    # 2. r2-comparable layout: nb=2048, b=32768 (tile == nb)
    cls_seq, entries = layout(2048)
    bench(lambda: chain_pass_finals_pallas(dt, cls_seq, entries, lane_tile=2048),
          "pallas finals nb=2048 tile=2048 (r2 layout)")
    bench(lambda: chain_pass_full_pallas(dt, cls_seq, entries, lane_tile=2048),
          "pallas full nb=2048 tile=2048 (r2 layout)")

    # 3. one max-width finals attempt: tile 8192 (uint8 windows)
    cls_seq, entries = layout(8192)
    try:
        bench(lambda: chain_pass_finals_pallas(dt, cls_seq, entries,
                                               lane_tile=8192),
              "pallas finals nb=8192 tile=8192")
    except Exception as e:
        print(f"pallas finals tile=8192: {type(e).__name__}: {str(e)[:140]}",
              flush=True)
    # exactness anchor
    fp = chain_pass_finals_pallas(dt, cls_seq, entries, lane_tile=2048)
    fx = chain_pass_finals(dt, cls_seq, entries)
    print("# exactness", "ok" if np.array_equal(np.asarray(fp), np.asarray(fx))
          else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
