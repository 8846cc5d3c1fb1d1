"""Same-process A/B behind the r4 KGRAM_MAX_STATES re-measurement: k=1
counts (state-contracted orientation) vs k-gram level-2 counting on the
tokenizer DFA (S=23 — inside every historical k-gram win region).

Measured 2026-08-20 (32 MiB, nb=16384, totals equal):
    tok_k1_gbps 1.1837   tok_kgram_gbps 1.1413   (k1 1.04x — parity)
together with the r4 bench sweep's k1 wins at S=67/107, this is the
evidence that moved the gate from 128 to 32 (``ops/kgram.py``
constant docstring).  The S=67/107 rows live in the bench size sweep
(docs/bench_r04_builder_run.jsonl).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax.numpy as jnp

    from regex_fpga_tpu.models import build_tokenizer_dfa
    from regex_fpga_tpu.ops import build_dfa_tables
    from regex_fpga_tpu.ops.dfa_fast import dfa_scan_fast
    from regex_fpga_tpu.ops.kgram import (
        build_kgram, dfa_scan_kgram, map_kgram_classes,
    )

    out = {}
    frag = (b"The quick brown fox jumps over 1234 lazy dogs, it's 99.5% "
            b"fine!  pre-split   benchmark text \xc3\xa9t\xc3\xa9 2026... ")
    l = 1 << 25
    text = np.frombuffer(frag * (l // len(frag) + 1), np.uint8)[:l]

    def med(run, force, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            force(run())
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return round(l / ts[n // 2] / 1e9, 4)

    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)
    cls = jnp.asarray(np.asarray(dt.class_of).astype(np.uint8)[text])
    r = dfa_scan_fast(dt, cls, num_blocks=16384, start=tok.start,
                      emit="counts")
    total = int(np.asarray(r.counts).sum())
    out["tok_k1_gbps"] = med(
        lambda: dfa_scan_fast(dt, cls, num_blocks=16384, start=tok.start,
                              emit="counts"),
        lambda rr: np.asarray(rr.counts),
    )
    kg = build_kgram(dt, levels=2)
    ck = jnp.asarray(map_kgram_classes(kg, text).astype(np.int16))
    tj, aj = jnp.asarray(kg.table), jnp.asarray(kg.acc_table)
    rk = dfa_scan_kgram(tj, aj, ck, num_blocks=16384, start=tok.start,
                        acc_bound=kg.k)
    assert int(rk.total) == total  # cross-engine exactness on silicon
    out["tok_kgram_gbps"] = med(
        lambda: dfa_scan_kgram(tj, aj, ck, num_blocks=16384,
                               start=tok.start, acc_bound=kg.k),
        lambda rr: np.asarray(rr.final_state),
    )
    out["k1_vs_kgram"] = round(out["tok_k1_gbps"] / out["tok_kgram_gbps"], 3)
    print(json.dumps(out))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
