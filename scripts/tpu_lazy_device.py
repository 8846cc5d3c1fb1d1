"""Measure on-TPU NFA conformance strategies vs the host walker (VERDICT r1 #3).

Paths measured on the real chip:
  A. lazy-device take-chain (ops/lazy_scan.py, gather-per-byte) — both rulesets.
  B. one-hot MXU fast engine over the warmed lazy-DFA snapshot — l-7_filter
     (D~729 interned states; snort's D~18.7k makes C*D MACs/byte hopeless:
     74*18656 = 1.38 M MACs/byte -> ~24 MB/s roofline at f32-HIGHEST rates).
  C. host native multi-cursor (the round-1 winner) for the same workloads.

All paths must be bit-exact vs models/golden_histograms.json.
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

    from regex_fpga_tpu import api
    from regex_fpga_tpu.models import load_golden_histograms
    from regex_fpga_tpu.models.lazy_dfa import LazyDfa
    from regex_fpga_tpu.ops import build_dfa_tables
    from regex_fpga_tpu.ops.dfa_fast import dfa_scan_fast_multi
    from regex_fpga_tpu.utils import load_ruleset, load_trace_pair

    golden = load_golden_histograms()

    def check(name, sname, counts):
        got = {int(i): int(c) for i, c in enumerate(counts) if c}
        want = golden[f"{name}/{sname}"]["histogram"]
        ok = got == want
        print(f"  {name}/{sname}: {'EXACT' if ok else 'MISMATCH'}", flush=True)
        return ok

    for name in ("l-7_filter", "snort_16"):
        print(f"== {name} ==", flush=True)
        lo, hi = load_trace_pair(name)
        total = len(lo) + len(hi)

        # --- A: lazy-device (take-chain)
        m = api.compile_ruleset(
            os.path.join(
                "/root/reference/Block_Mem",
                "CSR_BlockMem.coe" if name == "l-7_filter"
                else "CSR_BlockMem_snort_16.coe",
            ),
            strategy="lazy-device",
        )
        t0 = time.perf_counter()
        rep = m.scan([lo, hi])
        cold = time.perf_counter() - t0
        ok = check(name, "lo", rep.counts[0]) & check(name, "hi", rep.counts[1])
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            rep = m.scan([lo, hi])
            best = max(best, total / (time.perf_counter() - t0))
        print(f"  lazy-device take-chain: cold {total/cold/1e6:.1f} MB/s, "
              f"warm {best/1e6:.1f} MB/s exact={ok}", flush=True)

        # --- C: host native multi-cursor on the same matcher's lazy dfa
        mh = api.compile_ruleset(
            os.path.join(
                "/root/reference/Block_Mem",
                "CSR_BlockMem.coe" if name == "l-7_filter"
                else "CSR_BlockMem_snort_16.coe",
            ),
            strategy="lazy",
        )
        rep = mh.scan([lo, hi])  # warm/intern
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            rep = mh.scan([lo, hi])
            best = max(best, total / (time.perf_counter() - t0))
        ok = check(name, "lo", rep.counts[0]) & check(name, "hi", rep.counts[1])
        print(f"  host lazy walker: warm {best/1e6:.1f} MB/s exact={ok}",
              flush=True)

        # --- B: one-hot MXU engine on the warmed snapshot (l-7 only)
        if name != "l-7_filter":
            continue
        aut = load_ruleset(name)
        ld = LazyDfa(aut)
        scratch = np.zeros(aut.num_states, dtype=np.int64)
        for s in (lo, hi):
            ld.host_scan(s, ld.start, scratch, len(s))  # intern true paths
        # intern hub-restart paths for the engine's overlap speculation
        nb_ms, ov = 625, 64
        b = len(lo) // nb_ms
        positions = [i * b - ov for i in range(1, nb_ms)]
        for s in (lo, hi):
            ld.warm_restarts(s, positions, ov)
        table, unknown, n_acc = ld.snapshot()
        d = table.shape[1]
        print(f"  lazy snapshot D={d} C={ld.num_classes}", flush=True)
        accept = n_acc > 0
        dt = build_dfa_tables(
            # expand class table back to 256 for build_dfa_tables
            np.asarray(table)[np.asarray(ld.class_of)], accept
        )
        # build_dfa_tables re-derives the same class PARTITION but may order
        # class ids differently — map streams with ITS class_of
        cls_lut = np.asarray(dt.class_of)
        classes2 = jnp.asarray(
            np.stack([cls_lut[lo], cls_lut[hi]]).astype(np.int32)
        )
        res = dfa_scan_fast_multi(
            dt, classes2, num_blocks=nb_ms, starts=ld.start,
            emit="counts", overlap=ov,
        )
        np.asarray(res.final_states)
        print(f"  mxu converged={bool(res.converged)} "
              f"iters={int(res.iterations)}", flush=True)
        visits = np.asarray(res.counts)  # (2, D') masked by accept
        ok = True
        for i, sname in enumerate(("lo", "hi")):
            nfa_counts = ld.accept_counts(visits[i].astype(np.int64))
            ok &= check(name, sname, nfa_counts)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            res = dfa_scan_fast_multi(
                dt, classes2, num_blocks=nb_ms, starts=ld.start,
                emit="counts", overlap=ov,
            )
            np.asarray(res.final_states)
            best = max(best, total / (time.perf_counter() - t0))
        print(f"  one-hot MXU on lazy table: warm {best/1e6:.1f} MB/s "
              f"exact={ok}", flush=True)


if __name__ == "__main__":
    main()
