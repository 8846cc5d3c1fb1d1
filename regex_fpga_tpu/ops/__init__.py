from .dfa_engine import (
    DfaScanResult,
    block_entry_states,
    block_transition_functions,
    compose,
    dfa_match_positions,
    dfa_scan_blocked,
    dfa_scan_serial,
)
from .dfa_fast import (
    FastScanResult,
    chain_pass_finals,
    chain_pass_full,
    dfa_scan_fast,
)
from .nfa_engine import (
    DEFAULT_ACTIVE_BOUND,
    NfaScanResult,
    nfa_scan_batch,
    nfa_scan_jax,
)
from .tables import (
    DfaTables,
    NfaTables,
    build_dfa_tables,
    build_dfa_tables_from_csr,
    build_nfa_tables,
)

__all__ = [
    "DEFAULT_ACTIVE_BOUND",
    "DfaScanResult",
    "DfaTables",
    "FastScanResult",
    "chain_pass_finals",
    "chain_pass_full",
    "dfa_scan_fast",
    "NfaScanResult",
    "NfaTables",
    "block_entry_states",
    "block_transition_functions",
    "build_dfa_tables",
    "build_dfa_tables_from_csr",
    "build_nfa_tables",
    "compose",
    "dfa_match_positions",
    "dfa_scan_blocked",
    "dfa_scan_serial",
    "nfa_scan_batch",
    "nfa_scan_jax",
]
