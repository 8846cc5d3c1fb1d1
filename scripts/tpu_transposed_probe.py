"""On-chip A/B: class-contracted vs STATE-CONTRACTED one-hot step
orientation (``ops.dfa_fast.transposed_step``) at S=440/836, with the
offset-corrected int8 encoding stacked on top of the winner.

Motivation (r4, scripts/tpu_int8_split_probe.py): the int8 2x-MAC probe
moved nothing (0.96-1.03x) and nb=65536 collapsed 4x — the step is bound
by the (NB, 2S) f32 rows intermediate, not MACs.  Contracting over STATES
instead makes the rows (NB, 2C) — 14x narrower at S=836/C=36 — and
halves the padded GEMM tiles.  This probe measures it.

Protocol: upload once per size, jit-wrapped timing, one cache epoch per
mode (the orientation fn is read at trace time).  One JSON line out.
"""

# --- r5 guard: the int8 flags this probe toggles were PRUNED (they lost
# their on-chip A/Bs; docs/ENGINE_GRAVEYARD.md).  setattr on the module
# would silently succeed and this script would measure an A/A comparison,
# emitting a bogus artifact.  Check out commit 2a3e0ba to re-run it.
import regex_fpga_tpu.ops.dfa_fast as _df

if not hasattr(_df, "INT8_SPLIT") and not hasattr(_df, "INT8_ONEHOT"):
    raise SystemExit(
        "This probe targets the pruned int8 engine paths "
        "(docs/ENGINE_GRAVEYARD.md). Check out commit 2a3e0ba to re-run."
    )

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_T0 = time.perf_counter()
_BUDGET = float(os.environ.get("PROBE_BUDGET_S", "1800"))


def main() -> None:
    import jax
    import jax.numpy as jnp

    import regex_fpga_tpu.ops.dfa_fast as df
    from regex_fpga_tpu.models import build_aho_corasick
    from regex_fpga_tpu.ops import build_dfa_tables

    out: dict = {"metric": "transposed_step_ab",
                 "device": str(jax.devices()[0]), "points": []}
    words = [
        w % i
        for i in range(300)
        for w in (b"error%04d", b"warning%03d", b"GET /path%d HTTP",
                  b"user-agent: bot%d", b"fail%dure")
    ]
    frag = (
        b"The quick brown fox error0031 jumps over warning099 lazy dogs, "
        b"GET /path7 HTTP fail3ure user-agent: bot5 99.5% fine!  "
    )
    l = 1 << 25
    text = np.frombuffer(frag * (l // len(frag) + 1), np.uint8)[:l]

    combos = [(150, 16384), (300, 4096), (300, 16384), (300, 65536)]
    sizes = {}
    for n_pat, _ in combos:
        if n_pat not in sizes:
            ac = build_aho_corasick(words[:n_pat])
            dt = build_dfa_tables(ac.dfa.table, ac.dfa.accept)
            sizes[n_pat] = (dt, np.asarray(dt.class_of).astype(np.uint8)[text])

    # (label, transposed forced, INT8_SPLIT)
    modes = [("orig", False, False), ("tr", True, False),
             ("tr_i8", True, "auto")]
    points: dict = {}
    for label, tr, i8 in modes:
        df.transposed_step = (lambda c, s, _tr=tr: _tr)
        df.INT8_SPLIT = i8
        jax.clear_caches()
        uploaded = {}
        for n_pat, nb in combos:
            if _BUDGET - (time.perf_counter() - _T0) < 120:
                print(f"# budget: skip {label} {n_pat}/{nb}", file=sys.stderr)
                break
            dt, cls_host = sizes[n_pat]
            if n_pat not in uploaded:
                uploaded[n_pat] = jnp.asarray(cls_host)
            cls = uploaded[n_pat]
            pt = points.setdefault((n_pat, nb), {
                "S": int(dt.num_states), "C": int(dt.num_classes),
                "num_blocks": nb,
            })
            try:
                run = lambda: df.dfa_scan_fast(
                    dt, cls, num_blocks=nb, emit="counts"
                )
                r = run()
                pt[f"{label}_total"] = int(np.asarray(r.counts).sum())
                assert bool(np.asarray(r.converged))
                times = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    rr = run()
                    np.asarray(rr.counts)
                    times.append(time.perf_counter() - t0)
                times.sort()
                pt[f"{label}_gbps"] = round(l / times[2] / 1e9, 4)
                pt[f"{label}_minmax"] = [round(l / times[-1] / 1e9, 4),
                                         round(l / times[0] / 1e9, 4)]
                print(f"# {label} S={pt['S']} nb={nb}: {pt[f'{label}_gbps']}"
                      f" GB/s t={time.perf_counter() - _T0:.0f}s",
                      file=sys.stderr)
            except Exception as e:
                pt[f"{label}_error"] = repr(e)[:200]
                print(f"# {label} S={pt['S']} nb={nb} failed: {e}",
                      file=sys.stderr)

    for key in sorted(points):
        pt = points[key]
        if "orig_gbps" in pt and "tr_gbps" in pt:
            pt["tr_vs_orig"] = round(pt["tr_gbps"] / pt["orig_gbps"], 3)
        if "tr_gbps" in pt and "tr_i8_gbps" in pt:
            pt["i8_vs_tr"] = round(pt["tr_i8_gbps"] / pt["tr_gbps"], 3)
        totals = {pt.get(f"{m}_total") for m, _, _ in modes
                  if f"{m}_total" in pt}
        pt["totals_agree"] = len(totals) == 1
        out["points"].append(pt)
    print(json.dumps(out))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
