"""Phase-level profile of finditer on the chip: where do 19.6s go?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    print(f"device: {jax.devices()[0]}", flush=True)
    from regex_fpga_tpu.api import compile_regex
    from regex_fpga_tpu.utils.native import anchored_spans_native

    m = compile_regex(rb"[a-z]+")
    frag = b"lorem ipsum dolor sit amet 42 CONSECTETUR 7, adipiscing elit!  "
    l = 1 << 25
    corpus = (frag * (l // len(frag) + 1))[:l]
    stream = np.frombuffer(corpus, dtype=np.uint8)

    m._ensure_anchored()
    rm = m._reverse_matcher

    # warm
    rm._scan_stream(stream[::-1])

    t0 = time.perf_counter()
    rev = stream[::-1].copy()
    t_rev = time.perf_counter() - t0

    t0 = time.perf_counter()
    _, rmask, _, _ = rm._scan_stream(rev)
    t_scan = time.perf_counter() - t0

    t0 = time.perf_counter()
    pos = np.nonzero(rmask)[0]
    starts_mask = np.zeros(l, dtype=bool)
    starts_mask[l - pos[pos > 0]] = True
    starts = np.nonzero(starts_mask)[0]
    t_mask = time.perf_counter() - t0

    table, accept, dead, accept_eof = m._anchored_np
    t0 = time.perf_counter()
    out = anchored_spans_native(
        table, accept, accept_eof, m._anchored_start, dead, stream, starts
    )
    t_walk = time.perf_counter() - t0

    t0 = time.perf_counter()
    spans = [(int(a), int(b)) for a, b in out]
    t_conv = time.perf_counter() - t0

    print(f"reverse copy: {t_rev:.2f}s\nreverse scan (device+readback): "
          f"{t_scan:.2f}s\nmask/nonzero: {t_mask:.2f}s\n"
          f"native anchored walk ({len(starts)} starts): {t_walk:.2f}s\n"
          f"tuple conversion ({len(out)} spans): {t_conv:.2f}s", flush=True)


if __name__ == "__main__":
    main()
