"""Corrected XLA chain-pass anchor for the Pallas roofline verdict.

The sweep scripts called ``chain_pass_finals``/``chain_pass_full`` raw;
those helpers are not top-level-jitted, so every call pays several eager
dispatches at ~0.25 s tunnel sync each — the 0.08-0.13 GB/s "XLA" rows in
the 2026-08-20 sweeps are measurement artifact, not engine rate.  This
script wraps them in one ``jax.jit`` (what ``dfa_scan_fast`` does for the
production path) and re-measures at the plan widths that matter.

Run alone: timeout 560 python scripts/tpu_xla_anchor.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from regex_fpga_tpu.models import build_tokenizer_dfa
from regex_fpga_tpu.ops import build_dfa_tables
from regex_fpga_tpu.ops import dfa_fast


def main() -> None:
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)
    l = 1 << 26
    frag = (b"The quick brown fox jumps over 1234 lazy dogs 99.5%!  " * 64)
    text = np.frombuffer(frag * (l // len(frag) + 1), np.uint8)[:l]
    cls_host = np.asarray(dt.class_of).astype(np.uint8)[text]
    cls_flat = jnp.asarray(cls_host)
    np.asarray(cls_flat[:4])

    finals_j = jax.jit(dfa_fast.chain_pass_finals)
    full_j = jax.jit(dfa_fast.chain_pass_full)

    def bench(fn, tag):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[0] if isinstance(out, tuple) else out)
        warm = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out[0] if isinstance(out, tuple) else out)
            times.append(time.perf_counter() - t0)
        times.sort()
        print(f"{tag}: {l/times[1]/1e9:.2f} GB/s "
              f"(spread {l/times[-1]/1e9:.2f}-{l/times[0]/1e9:.2f}, "
              f"warm+compile {warm:.1f}s)", flush=True)

    for nb in (65536, 8192, 2048):
        b = l // nb
        cls_seq = jax.jit(lambda x, nb=nb, b=b: x.reshape(nb, b).T.astype(jnp.int32))(cls_flat)
        np.asarray(cls_seq[:1, :1])
        entries = jnp.zeros((nb,), jnp.int32)
        bench(lambda: finals_j(dt, cls_seq, entries), f"xla-jit finals nb={nb}")
        bench(lambda: full_j(dt, cls_seq, entries), f"xla-jit full nb={nb}")


if __name__ == "__main__":
    main()
