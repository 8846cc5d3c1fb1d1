"""num_blocks sweep for dfa_scan_fast full output + kgram counting.

The jit-corrected anchors (tpu_xla_anchor.py) showed the finals chain pass
peaking at nb=8192 (1.96 GB/s) vs nb=65536 (1.42) — this sweeps the FULL
engine (speculation prescan + emit) to check whether the headline's
nb=65536 default is still right.  Run alone:
timeout 560 python scripts/tpu_nb_sweep.py
"""

import os
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from regex_fpga_tpu.models import build_tokenizer_dfa
from regex_fpga_tpu.ops import build_dfa_tables
from regex_fpga_tpu.ops.dfa_fast import dfa_scan_fast
from regex_fpga_tpu.ops.kgram import build_kgram, dfa_scan_kgram, map_kgram_classes


def bench(fn, l, tag):
    np.asarray(fn().final_state)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn().final_state)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{tag}: {l/ts[1]/1e9:.2f} GB/s ({l/ts[-1]/1e9:.2f}-{l/ts[0]/1e9:.2f})",
          flush=True)


def main():
    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)
    l = 1 << 26
    frag = (b"The quick brown fox jumps over 1234 lazy dogs, it's 99.5% fine!  "
            b"pre-split   benchmark text \xc3\xa9t\xc3\xa9 2026... ")
    text = np.frombuffer(frag * -(-l // len(frag)), np.uint8)[:l]
    cls = jnp.asarray(np.asarray(dt.class_of).astype(np.uint8)[text])
    np.asarray(cls[:4])
    for nb in (8192, 16384, 32768, 65536, 131072):
        bench(lambda nb=nb: dfa_scan_fast(dt, cls, num_blocks=nb,
                                          start=tok.start), l, f"full nb={nb}")
    kg = build_kgram(dt, levels=2)
    ck = jnp.asarray(map_kgram_classes(kg, text).astype(np.int16))
    tj, aj = jnp.asarray(kg.table), jnp.asarray(kg.acc_table)
    for nb in (4096, 8192, 16384, 32768):
        bench(lambda nb=nb: dfa_scan_kgram(tj, aj, ck, num_blocks=nb,
                                           start=tok.start, acc_bound=kg.k),
              l, f"kgram nb={nb}")


if __name__ == "__main__":
    main()
