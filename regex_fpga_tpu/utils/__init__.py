from .traces import (
    REFERENCE_RUN_LENGTH,
    RULESETS,
    load_ruleset,
    load_trace_pair,
    read_mem_trace,
    reference_root,
)

__all__ = [
    "REFERENCE_RUN_LENGTH",
    "RULESETS",
    "load_ruleset",
    "load_trace_pair",
    "read_mem_trace",
    "reference_root",
]
