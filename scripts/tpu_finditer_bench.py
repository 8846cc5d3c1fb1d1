"""finditer vs scan wall time on a 64 MiB match-dense corpus (VERDICT r1 #5).

finditer = device backward pass (reversed-pattern DFA marks match starts)
+ native anchored forward walks.  Target: within ~2x of plain scan wall.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    print(f"device: {jax.devices()[0]}", flush=True)
    import re as pyre

    from regex_fpga_tpu.api import compile_regex

    m = compile_regex(rb"[a-z]+")
    frag = b"lorem ipsum dolor sit amet 42 CONSECTETUR 7, adipiscing elit!  "
    l = 1 << 25
    corpus = (frag * (l // len(frag) + 1))[:l]
    stream = np.frombuffer(corpus, dtype=np.uint8)

    # plain scan (counts) timing
    t0 = time.perf_counter()
    rep = m.scan(stream)  # warm/compile
    print(f"scan warm/compile: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    rep = m.scan(stream)
    t_scan = time.perf_counter() - t0

    t0 = time.perf_counter()
    spans = m.finditer(stream)  # warm (compiles the reverse engine)
    print(f"finditer warm/compile: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    spans = m.finditer(stream)
    t_find = time.perf_counter() - t0

    n_expected = sum(1 for _ in pyre.finditer(rb"[a-z]+", frag)) * (l // len(frag))
    print(f"scan: {t_scan:.3f}s ({l/t_scan/1e9:.2f} GB/s)", flush=True)
    print(f"finditer: {t_find:.3f}s ({l/t_find/1e9:.2f} GB/s), "
          f"{len(spans)} spans (~{n_expected} expected), "
          f"ratio {t_find/t_scan:.2f}x", flush=True)
    # spot-check correctness at the head
    head = [tuple(x) for x in spans[:6]]
    want = [mm.span() for mm in pyre.finditer(rb"[a-z]+", corpus[:200])][:6]
    assert head == want, (head, want)
    print("head spans exact vs python re", flush=True)


if __name__ == "__main__":
    main()
