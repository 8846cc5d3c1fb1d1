"""Sweep Pallas DFA kernel lane_tile on the real chip; also kgram pallas vs jnp."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)
    from regex_fpga_tpu.models import build_tokenizer_dfa
    from regex_fpga_tpu.ops import build_dfa_tables
    from regex_fpga_tpu.ops.dfa_fast import chain_pass_finals, chain_pass_full
    from regex_fpga_tpu.ops.pallas_dfa import (
        chain_pass_finals_pallas,
        chain_pass_full_pallas,
    )

    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)

    frag = (
        b"The quick brown fox jumps over 1234 lazy dogs, it's 99.5% fine!  "
        b"pre-split   benchmark text \xc3\xa9t\xc3\xa9 2026... "
    )
    l = 1 << 26
    reps = int(np.ceil(l / len(frag)))
    text = np.frombuffer(frag * reps, dtype=np.uint8)[:l]
    classes = jnp.asarray(np.asarray(dt.class_of)[text].astype(np.int32))

    nb = 65536
    b = l // nb
    cls_seq = classes.reshape(nb, b).T  # (B, NB)
    entries = jnp.zeros((nb,), jnp.int32)

    def timeit(fn, n=5):
        r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0])  # force
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        return (time.perf_counter() - t0) / n

    for lt in (256, 512, 1024, 2048):
        try:
            dt_full = timeit(lambda: chain_pass_full_pallas(
                dt, cls_seq, entries, lane_tile=lt))
            dt_fin = timeit(lambda: chain_pass_finals_pallas(
                dt, cls_seq, entries, lane_tile=lt))
            print(f"pallas lane_tile={lt}: full {l/dt_full/1e9:.3f} GB/s, "
                  f"finals {l/dt_fin/1e9:.3f} GB/s", flush=True)
        except Exception as e:
            print(f"pallas lane_tile={lt}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    dt_full = timeit(lambda: chain_pass_full(dt, cls_seq, entries))
    dt_fin = timeit(lambda: chain_pass_finals(dt, cls_seq, entries))
    print(f"jnp: full {l/dt_full/1e9:.3f} GB/s, finals {l/dt_fin/1e9:.3f} GB/s",
          flush=True)

    # ---- kgram: pallas vs jnp
    from regex_fpga_tpu.ops.kgram import build_kgram, dfa_scan_kgram, map_kgram_classes
    from regex_fpga_tpu.ops.pallas_kgram import (
        KGRAM_LANE_TILE, kgram_chain_pallas, pack_ta128,
    )

    kg = build_kgram(dt, levels=2)
    ck = jnp.asarray(map_kgram_classes(kg, text))  # (L/k,) k-gram classes
    tj, aj = jnp.asarray(kg.table), jnp.asarray(kg.acc_table)
    nbk = 16384
    dt_kj = timeit(lambda: dfa_scan_kgram(tj, aj, ck, num_blocks=nbk,
                                          start=tok.start, acc_bound=kg.k))
    print(f"jnp kgram4 counting: {l/dt_kj/1e9:.3f} GB/s", flush=True)

    ta128 = pack_ta128(tj, aj)
    steps = ck.shape[0]
    for nbp in (4096, 8192, 16384):
        if steps % nbp or (steps // nbp) % 128 or nbp % KGRAM_LANE_TILE:
            print(f"kgram pallas nb={nbp}: shape-skip", flush=True)
            continue
        blocks = ck.astype(jnp.int32).reshape(nbp, steps // nbp)
        ent = jnp.zeros((nbp,), jnp.int32)
        try:
            dt_kp = timeit(lambda: kgram_chain_pallas(ta128, blocks, ent))
            print(f"pallas kgram4 chain nb={nbp}: {l/dt_kp/1e9:.3f} GB/s "
                  f"(raw chain, no seam fixpoint)", flush=True)
        except Exception as e:
            print(f"pallas kgram nb={nbp}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
