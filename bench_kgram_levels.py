"""One-off: sweep k-gram levels / block counts on the real chip."""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from regex_fpga_tpu.models import build_tokenizer_dfa
    from regex_fpga_tpu.ops import build_dfa_tables
    from regex_fpga_tpu.ops.kgram import (
        build_kgram,
        dfa_scan_kgram,
        map_kgram_classes,
    )

    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)

    rng = np.random.default_rng(0)
    frag = (
        b"The quick brown fox jumps over 1234 lazy dogs, it's 99.5% fine!  "
        b"pre-split   benchmark text \xc3\xa9t\xc3\xa9 2026... "
    )
    l = 1 << 26
    reps = int(np.ceil(l / len(frag)))
    text = np.frombuffer(frag * reps, dtype=np.uint8)[:l]

    configs = []
    for lv in (int(a) for a in (sys.argv[1:] or ["1", "3"])):
        configs.append(lv)
    for lv in configs:
        kg = build_kgram(dt, levels=lv, max_classes=4096)
        if kg is None:
            print(f"levels={lv}: blowup")
            continue
        ck = jnp.asarray(map_kgram_classes(kg, text))
        tj, aj = jnp.asarray(kg.table), jnp.asarray(kg.acc_table)
        for nb in (8192, 16384, 32768):
            if (l // kg.k) % nb:
                continue
            run = lambda: dfa_scan_kgram(
                tj, aj, ck, num_blocks=nb, start=tok.start, acc_bound=kg.k
            )
            r = run()
            np.asarray(r.final_state)
            t0 = time.perf_counter()
            n = 5
            for _ in range(n):
                r = run()
            np.asarray(r.final_state)
            bps = l / ((time.perf_counter() - t0) / n)
            print(
                f"levels={lv} k={kg.k} C={kg.level_classes[-1]} nb={nb}: "
                f"{bps/1e9:.2f} GB/s conv={bool(r.converged)} "
                f"total={int(r.total)}",
                flush=True,
            )


if __name__ == "__main__":
    main()
