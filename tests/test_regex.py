"""Regex compiler: fuzz vs Python re, guard, minimization, scanning mode."""

import re

import numpy as np
import pytest

from regex_fpga_tpu.models.regex import (
    DfaBlowupError,
    RegexError,
    compile_pattern,
)

PATTERNS = [
    r"abc", r"a|b", r"a*b+c?", r"[a-c]{2,4}", r"(ab|cd)*e", r"\d+\.\d+",
    r"[^x]y", r"a{3}", r"(a|bc)+d", r"\w+@\w+", r"a.c", r"[\x41-\x43]z",
    r"(0|1(01*0)*1)*", r"abc|abd|abe", r"x(yz){0,2}w", r"\s+\S+",
]


def run_dfa(dfa, data: bytes) -> bool:
    s = dfa.start
    for b in data:
        s = int(dfa.table[b, s])
    return bool(dfa.accept[s])


@pytest.mark.parametrize("pat", PATTERNS)
def test_fullmatch_fuzz_vs_re(pat):
    rng = np.random.default_rng(hash(pat) % 2**32)
    dfa = compile_pattern(pat)
    cre = re.compile(("(?s)" + pat).encode())
    alphabet = list(b"abcdexyz01.@w\x41\x42\x43\n \t")
    for _ in range(300):
        w = bytes(rng.choice(alphabet, size=int(rng.integers(0, 10))))
        assert run_dfa(dfa, w) == (cre.fullmatch(w) is not None), (pat, w)


def test_unanchored_scanning_mode():
    dfa = compile_pattern(r"abc", anchored=False)
    data = b"xxabcxxxabc"
    s, ends = dfa.start, []
    for i, b in enumerate(data):
        s = int(dfa.table[b, s])
        if dfa.accept[s]:
            ends.append(i)
    assert ends == [4, 10]


def test_blowup_guard():
    with pytest.raises(DfaBlowupError):
        compile_pattern("(a|b)*a" + "(a|b)" * 18, max_states=1000)


def test_minimization_shrinks():
    d1 = compile_pattern(r"abc|abd", minimize=False)
    d2 = compile_pattern(r"abc|abd")
    assert d2.num_states < d1.num_states
    # behavior preserved
    rng = np.random.default_rng(0)
    for _ in range(200):
        w = bytes(rng.choice(list(b"abcd"), size=int(rng.integers(0, 6))))
        assert run_dfa(d1, w) == run_dfa(d2, w)


@pytest.mark.parametrize("bad", [r"a{2,1}", r"*a", r"(ab", r"[z-a]", r"a\x2"])
def test_syntax_errors(bad):
    with pytest.raises(RegexError):
        compile_pattern(bad)


def test_dead_state_absorbing():
    dfa = compile_pattern(r"ab")
    assert (dfa.table[:, dfa.dead] == dfa.dead).all()
    assert not dfa.accept[dfa.dead]
