"""Measure the bounded-active-set NFA engine (ops/nfa_engine.py) on chip.

This engine is the distributed/TP building block; its sort-per-byte dedupe
(jnp.unique) was flagged r1 as never-measured.  Scans the reference traces.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)
    from regex_fpga_tpu.models import load_golden_histograms
    from regex_fpga_tpu.ops import build_nfa_tables
    from regex_fpga_tpu.ops.nfa_engine import nfa_scan_jax
    from regex_fpga_tpu.utils import load_ruleset, load_trace_pair

    golden = load_golden_histograms()
    for name in ("l-7_filter", "snort_16"):
        aut = load_ruleset(name)
        t = build_nfa_tables(aut)
        lo, _ = load_trace_pair(name)
        stream = jnp.asarray(lo)
        t0 = time.perf_counter()
        res = nfa_scan_jax(t, stream)
        counts = np.asarray(res.counts)
        print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s "
              f"K={t.max_fanout}", flush=True)
        got = {int(i): int(c) for i, c in enumerate(counts) if c}
        ok = got == golden[f"{name}/lo"]["histogram"]
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            res = nfa_scan_jax(t, stream)
            np.asarray(res.counts)
            best = max(best, len(lo) / (time.perf_counter() - t0))
        print(f"{name}: active-set engine {best/1e6:.2f} MB/s exact={ok}",
              flush=True)


if __name__ == "__main__":
    main()
