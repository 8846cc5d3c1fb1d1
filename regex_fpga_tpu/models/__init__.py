from .coe import read_coe, write_coe
from .l7 import L7Pattern, load_l7_dir, load_l7_pattern, parse_l7_pattern
from .csr import (CsrAutomaton, byte_classes, from_words, load_coe,
                  prefix_automaton, split_words)
from .literals import AhoCorasick, build_aho_corasick
from .snort import (
    ByteExtract,
    ByteJump,
    ByteTest,
    IsDataAt,
    SnortContent,
    SnortRule,
    load_snort_rules,
    parse_snort_rules,
)
from .golden import GOLDEN_KEYS, load_golden_histograms
from .oracle import dfa_scan_counts, dfa_step_table, nfa_scan, nfa_scan_trace
from .regex import CompiledDfa, DfaBlowupError, RegexError, compile_pattern
from .tokenizer_dfa import (
    GPT2_PRESPLIT,
    TokenizerDfa,
    boundaries_from_flags,
    build_tokenizer_dfa,
)

__all__ = [
    "prefix_automaton",
    "GOLDEN_KEYS",
    "load_golden_histograms",
    "AhoCorasick",
    "build_aho_corasick",
    "ByteExtract",
    "ByteJump",
    "ByteTest",
    "IsDataAt",
    "SnortContent",
    "SnortRule",
    "load_snort_rules",
    "parse_snort_rules",
    "CompiledDfa",
    "L7Pattern",
    "load_l7_dir",
    "load_l7_pattern",
    "parse_l7_pattern",
    "CsrAutomaton",
    "DfaBlowupError",
    "GPT2_PRESPLIT",
    "RegexError",
    "TokenizerDfa",
    "boundaries_from_flags",
    "build_tokenizer_dfa",
    "compile_pattern",
    "byte_classes",
    "dfa_scan_counts",
    "dfa_step_table",
    "from_words",
    "load_coe",
    "nfa_scan",
    "nfa_scan_trace",
    "read_coe",
    "split_words",
    "write_coe",
]
