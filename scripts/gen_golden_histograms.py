"""Regenerate the full golden per-state match histograms fixture.

Runs the golden NFA oracle (models/oracle.py — the executable form of
SURVEY.md §4.3 / Simulation/testbench_BLK_Mem.sv:49-87) over all four
reference trace/ruleset combos at the harness's 200,000-char run length and
writes regex_fpga_tpu/models/golden_histograms.json: the complete
``match_count[i]`` tables the testbench prints (testbench_BLK_Mem.sv:75-85),
used as the bit-exactness gate by tests/test_oracle.py and the CLI
``conformance`` command.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from regex_fpga_tpu.models import nfa_scan
from regex_fpga_tpu.utils import load_ruleset, load_trace_pair


def main():
    out = {}
    for name in ("l-7_filter", "snort_16"):
        aut = load_ruleset(name)
        lo, hi = load_trace_pair(name)
        for sname, stream in (("lo", lo), ("hi", hi)):
            counts = nfa_scan(aut, stream)
            hist = {str(i): int(c) for i, c in enumerate(counts) if c}
            out[f"{name}/{sname}"] = {
                "total": int(counts.sum()),
                "distinct": len(hist),
                "histogram": hist,
            }
            print(f"{name}/{sname}: total={counts.sum()} distinct={len(hist)}")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "regex_fpga_tpu", "models", "golden_histograms.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
