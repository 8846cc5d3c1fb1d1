"""Compile + validate + time the Pallas DFA chain kernel on the real TPU.

Stage 1: small shape — correctness vs the jnp chain pass (exact).
Stage 2: bench shape (64 MiB) — timed full-output and finals-only passes,
plus the end-to-end dfa_scan_fast(use_pallas=True) vs jnp comparison.

Tunnel rules: every timed region forces a small np.asarray (block_until_ready
does not sync through the tunnel); run under `timeout`.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    assert jax.default_backend() == "tpu", jax.default_backend()

    from regex_fpga_tpu.models import build_tokenizer_dfa
    from regex_fpga_tpu.ops import build_dfa_tables
    from regex_fpga_tpu.ops.dfa_fast import (
        chain_pass_finals,
        chain_pass_full,
        dfa_scan_fast,
    )
    from regex_fpga_tpu.ops.pallas_dfa import (
        chain_pass_finals_pallas,
        chain_pass_full_pallas,
    )

    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)
    print(f"tokenizer DFA: S={dt.num_states} C={dt.num_classes}", flush=True)

    rng = np.random.default_rng(0)

    # ---- stage 1: small-shape correctness, compiled on the chip
    b, nb = 256, 512
    cls_seq = jnp.asarray(
        rng.integers(0, dt.num_classes, size=(b, nb), dtype=np.int32)
    )
    entries = jnp.asarray(rng.integers(0, dt.num_states, size=(nb,), dtype=np.int32))

    t0 = time.perf_counter()
    f_p, st_p, acc_p = chain_pass_full_pallas(dt, cls_seq, entries)
    f_p = np.asarray(f_p)
    print(f"stage1 full compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    f_ref, st_ref, acc_ref = chain_pass_full(dt, cls_seq, entries)
    np.testing.assert_array_equal(f_p, np.asarray(f_ref))
    np.testing.assert_array_equal(np.asarray(st_p), np.asarray(st_ref))
    np.testing.assert_array_equal(np.asarray(acc_p), np.asarray(acc_ref))
    t0 = time.perf_counter()
    f_only = np.asarray(chain_pass_finals_pallas(dt, cls_seq, entries))
    print(f"stage1 finals compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    np.testing.assert_array_equal(f_only, np.asarray(f_ref))
    print("stage1 CORRECT (full + finals exact vs jnp)", flush=True)

    # ---- stage 2: bench shape
    frag = (
        b"The quick brown fox jumps over 1234 lazy dogs, it's 99.5% fine!  "
        b"pre-split   benchmark text \xc3\xa9t\xc3\xa9 2026... "
    )
    l = 1 << 26
    reps = int(np.ceil(l / len(frag)))
    text = np.frombuffer(frag * reps, dtype=np.uint8)[:l]
    classes_np = np.asarray(dt.class_of)[text].astype(np.int32)
    classes = jnp.asarray(classes_np)

    nb = 65536
    for use_pallas in (True, False):
        tag = "pallas" if use_pallas else "jnp"
        run = lambda: dfa_scan_fast(
            dt, classes, num_blocks=nb, start=tok.start, use_pallas=use_pallas
        )
        t0 = time.perf_counter()
        r = run()
        np.asarray(r.final_state)
        print(f"stage2 {tag} compile+run: {time.perf_counter()-t0:.1f}s "
              f"converged={bool(r.converged)} iters={int(r.iterations)}", flush=True)
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            r = run()
        np.asarray(r.final_state)
        dt_s = (time.perf_counter() - t0) / n
        print(f"stage2 {tag} full-output: {l/dt_s/1e9:.3f} GB/s", flush=True)

    # cross-check the two paths agree at bench shape
    rp = dfa_scan_fast(dt, classes, num_blocks=nb, start=tok.start, use_pallas=True)
    rj = dfa_scan_fast(dt, classes, num_blocks=nb, start=tok.start, use_pallas=False)
    assert int(rp.final_state) == int(rj.final_state)
    mm = np.asarray(rp.match_mask) == np.asarray(rj.match_mask)
    assert mm.all(), f"match masks differ at {np.argmin(mm)}"
    print("stage2 CORRECT (pallas == jnp at 64 MiB)", flush=True)


if __name__ == "__main__":
    main()
