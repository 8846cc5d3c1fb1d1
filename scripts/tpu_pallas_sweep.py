"""On-chip Pallas lane-width sweep (r2 verdict #7).

Measures the DFA chain kernel (finals-only + full-output) across lane
tiles on the real TPU with the r3 layout changes — uint8 window buffers
(4x less resident VMEM than r2's int32) and packed state|accept staging —
to find where the ~16 MB/core VMEM actually caps lanes now, and whether
the kernel can reach the 65536-lane XLA plan's rate.  Results land in
ops/pallas_dfa.py's header and BENCH_r03.

Run only when no other chip process is active:  timeout 560 python
scripts/tpu_pallas_sweep.py
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
    rng = np.random.default_rng(0)
    frag = (b"The quick brown fox jumps over 1234 lazy dogs 99.5%!  " * 64)
    text = np.frombuffer(frag * (l // len(frag) + 1), np.uint8)[:l]
    cls_host = np.asarray(dt.class_of).astype(np.uint8)[text]
    # ONE uint8 upload (64 MB through the tunnel); per-config layouts are
    # derived on device (reshape/transpose/cast are HBM-local)
    import time as _t
    t0 = _t.perf_counter()
    cls_flat = jnp.asarray(cls_host)
    np.asarray(cls_flat[:4])
    print(f"# upload done in {_t.perf_counter()-t0:.0f}s", file=sys.stderr)

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
              f"warm+compile {warm:.1f}s)")
        return l / times[1]

    results = {}
    for nb in (8192, 16384, 32768, 65536):
        b = l // nb
        if b % 128:
            continue
        cls_seq = jax.jit(
            lambda x: x.reshape(nb, b).T.astype(jnp.int32)
        )(cls_flat)
        np.asarray(cls_seq[:1, :1])
        entries = jnp.zeros((nb,), jnp.int32)
        # XLA reference at this lane count
        try:
            results[f"xla_finals_{nb}"] = bench(
                lambda: chain_pass_finals(dt, cls_seq, entries),
                f"xla finals nb={nb} b={b}")
        except Exception as e:
            print(f"xla finals nb={nb}: {e}")
        for lane_tile in (2048, 4096, 8192, 16384, 32768):
            if nb % lane_tile or lane_tile > nb:
                continue
            try:
                results[f"pl_finals_{nb}_{lane_tile}"] = bench(
                    lambda: chain_pass_finals_pallas(
                        dt, cls_seq, entries, lane_tile=lane_tile),
                    f"pallas finals nb={nb} tile={lane_tile}")
            except Exception as e:
                print(f"pallas finals nb={nb} tile={lane_tile}: "
                      f"{type(e).__name__}: {str(e)[:120]}")
            try:
                results[f"pl_full_{nb}_{lane_tile}"] = bench(
                    lambda: chain_pass_full_pallas(
                        dt, cls_seq, entries, lane_tile=lane_tile),
                    f"pallas full nb={nb} tile={lane_tile}")
            except Exception as e:
                print(f"pallas full nb={nb} tile={lane_tile}: "
                      f"{type(e).__name__}: {str(e)[:120]}")
        # exactness spot check at one tile
        try:
            fp = chain_pass_finals_pallas(dt, cls_seq, entries,
                                          lane_tile=min(nb, 4096))
            fx = chain_pass_finals(dt, cls_seq, entries)
            assert np.array_equal(np.asarray(fp), np.asarray(fx)), "MISMATCH"
            print(f"# exactness ok nb={nb}")
        except Exception as e:
            print(f"# exactness check failed nb={nb}: {e}")


if __name__ == "__main__":
    main()
