"""Pallas counts kernel vs jnp chain_pass_counts on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)
    from regex_fpga_tpu.models import build_aho_corasick, build_tokenizer_dfa
    from regex_fpga_tpu.ops import build_dfa_tables
    from regex_fpga_tpu.ops.dfa_fast import dfa_scan_fast
    from regex_fpga_tpu.ops.pallas_dfa import chain_pass_counts_pallas

    rng = np.random.default_rng(0)
    frag = (b"The quick brown fox jumps over 1234 lazy dogs, it's 99.5% "
            b"fine!  errors0 warning21 gateway7 ")
    l = 1 << 25  # 32 MiB
    text = np.frombuffer(frag * (l // len(frag) + 1), dtype=np.uint8)[:l]

    tok = build_tokenizer_dfa()
    words = [w % i for i in range(24)
             for w in (b"error%04d", b"warning%03d", b"gate%dway")]
    ac = build_aho_corasick(words)

    for name, (table, accept, start) in {
        "tokenizer": (tok.table, tok.accept, tok.start),
        "ac72": (ac.dfa.table, ac.dfa.accept, ac.dfa.start),
    }.items():
        dt = build_dfa_tables(table, accept)
        cls = jnp.asarray(np.asarray(dt.class_of).astype(np.uint8)[text])
        nb = 32768
        b = l // nb
        cls_seq = cls.astype(jnp.int32).reshape(nb, b).T
        entries = jnp.full((nb,), start, jnp.int32)

        # jnp counts (through the full engine, spec path)
        r = dfa_scan_fast(dt, cls, num_blocks=nb, start=start, emit="counts")
        ref_counts = np.asarray(r.counts)
        t0 = time.perf_counter()
        for _ in range(3):
            r = dfa_scan_fast(dt, cls, num_blocks=nb, start=start,
                              emit="counts")
        np.asarray(r.final_state)
        jnp_bps = 3 * l / (time.perf_counter() - t0)

        for lt in (1024, 2048):
            try:
                f, c = chain_pass_counts_pallas(dt, cls_seq, entries,
                                                lane_tile=lt)
                np.asarray(f)
                t0 = time.perf_counter()
                for _ in range(3):
                    f, c = chain_pass_counts_pallas(dt, cls_seq, entries,
                                                    lane_tile=lt)
                np.asarray(f)
                p_bps = 3 * l / (time.perf_counter() - t0)
                # exactness vs the engine result (same entries: engine spec
                # converged in 1 pass means entries==true; compare raw pass
                # by running jnp chain on identical entries)
                from regex_fpga_tpu.ops.dfa_fast import chain_pass_counts
                fr, cr = chain_pass_counts(dt, cls_seq, entries)
                ok = (np.array_equal(np.asarray(f), np.asarray(fr))
                      and np.array_equal(np.asarray(c), np.asarray(cr)))
                print(f"{name} S={dt.num_states} C={dt.num_classes} "
                      f"lane_tile={lt}: pallas {p_bps/1e9:.3f} GB/s vs "
                      f"jnp-engine {jnp_bps/1e9:.3f} GB/s exact={ok}",
                      flush=True)
            except Exception as e:
                print(f"{name} lane_tile={lt}: FAILED {type(e).__name__}: "
                      f"{str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
