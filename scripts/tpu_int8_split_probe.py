"""Same-day A/B on silicon: bf16 byte-split vs OFFSET-CORRECTED int8
byte-split (``ops.dfa_fast.INT8_SPLIT``) at realistic automaton sizes.

The r3 verdict's target: at S=440/836 the k=1 counting step is MAC-bound
at the bf16 padded ceiling; the s8 x s8 -> s32 MXU path runs at 2x the
bf16 MAC rate on v5e, so the offset-corrected split should approach 2x —
or this probe records that it doesn't and why the flag stays off.  The
r2/r3 int8 probe only ever measured S=23 (tile counts too small for MAC
rate to matter); THESE shapes are 7-14 padded tiles wide.

Protocol (CLAUDE.md tunnel rules): class streams upload ONCE per size
outside every timed region; only jit-wrapped engine calls are timed;
sync via small host transfers; one mode's graphs are compiled per
``jax.clear_caches()`` epoch (the flag is read at trace time and is not
part of the jit cache key — clearing between modes is what makes the A/B
honest).  Emits one JSON line; partial results survive a mid-probe hang.
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


def _left() -> float:
    return _BUDGET - (time.perf_counter() - _T0)


def main() -> None:
    import jax
    import jax.numpy as jnp

    import regex_fpga_tpu.ops.dfa_fast as df
    from regex_fpga_tpu.models import build_aho_corasick
    from regex_fpga_tpu.ops import build_dfa_tables

    out: dict = {"metric": "int8_split_ab", "device": str(jax.devices()[0]),
                 "points": []}
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
    l = 1 << 25  # 32 MiB per timed pass
    text = np.frombuffer(frag * (l // len(frag) + 1), np.uint8)[:l]

    # (n_patterns, num_blocks) combos, cheapest first so partial runs
    # still carry the S=440 point; S=836 is the verdict's acceptance size
    combos = [(150, 16384), (300, 16384), (300, 65536)]
    sizes = {}
    for n_pat, _ in combos:
        if n_pat not in sizes:
            ac = build_aho_corasick(words[:n_pat])
            dt = build_dfa_tables(ac.dfa.table, ac.dfa.accept)
            cls_host = np.asarray(dt.class_of).astype(np.uint8)[text]
            sizes[n_pat] = (dt, cls_host)

    points: dict = {}
    for mode in ("bf16", "int8"):
        # one cache epoch per mode: the INT8_SPLIT flag is read at trace
        # time, so stale compiled graphs from the other mode must go
        df.INT8_SPLIT = "auto" if mode == "int8" else False
        jax.clear_caches()
        uploaded = {}
        for n_pat, nb in combos:
            if _left() < 180:
                print(f"# budget: skipping {mode} S-combo {n_pat}/{nb}",
                      file=sys.stderr)
                break
            dt, cls_host = sizes[n_pat]
            if n_pat not in uploaded:
                uploaded[n_pat] = jnp.asarray(cls_host)  # upload ONCE/mode
            cls = uploaded[n_pat]
            key = (n_pat, nb)
            pt = points.setdefault(key, {
                "S": int(dt.num_states), "C": int(dt.num_classes),
                "num_blocks": nb,
            })
            try:
                t_c0 = time.perf_counter()
                run = lambda: df.dfa_scan_fast(
                    dt, cls, num_blocks=nb, emit="counts"
                )
                r = run()
                total = int(np.asarray(r.counts).sum())
                pt[f"{mode}_compile_s"] = round(
                    time.perf_counter() - t_c0, 1
                )
                assert bool(np.asarray(r.converged))
                times = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    rr = run()
                    np.asarray(rr.counts)  # tunnel: force real completion
                    times.append(time.perf_counter() - t0)
                times.sort()
                pt[f"{mode}_gbps"] = round(l / times[2] / 1e9, 4)
                pt[f"{mode}_gbps_minmax"] = [
                    round(l / times[-1] / 1e9, 4),
                    round(l / times[0] / 1e9, 4),
                ]
                pt[f"{mode}_total"] = total
                print(f"# {mode} S={pt['S']} nb={nb}: "
                      f"{pt[f'{mode}_gbps']} GB/s "
                      f"t={time.perf_counter() - _T0:.0f}s",
                      file=sys.stderr)
            except Exception as e:
                pt[f"{mode}_error"] = repr(e)[:200]
                print(f"# {mode} S={pt['S']} nb={nb} failed: {e}",
                      file=sys.stderr)

    for key in sorted(points):
        pt = points[key]
        if "bf16_gbps" in pt and "int8_gbps" in pt:
            pt["int8_vs_bf16"] = round(pt["int8_gbps"] / pt["bf16_gbps"], 3)
            pt["totals_agree"] = pt.get("bf16_total") == pt.get("int8_total")
        out["points"].append(pt)
    print(json.dumps(out))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
