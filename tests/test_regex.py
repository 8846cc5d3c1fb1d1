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


def _gen_pattern(rng, depth=0) -> str:
    """Random alternation-free pattern: for these, Python's backtracking-
    greedy spans coincide with this engine's POSIX leftmost-longest, so
    finditer/findall/sub can be compared 1:1 (alternation-ORDER differences
    are exercised separately by the fullmatch fuzz above)."""
    atoms = ["a", "b", "c", "x", "0", "1", r"\d", "[ab]", "[^c]", "[a-c]", "."]
    parts = []
    for _ in range(int(rng.integers(1, 5))):
        a = atoms[int(rng.integers(0, len(atoms)))]
        if depth < 2 and rng.random() < 0.25:
            a = "(" + _gen_pattern(rng, depth + 1) + ")"
        q = rng.random()
        if q < 0.15:
            a += "*"
        elif q < 0.3:
            a += "+"
        elif q < 0.4:
            a += "?"
        elif q < 0.45:
            a += "{1,3}"
        parts.append(a)
    return "".join(parts)


@pytest.mark.parametrize("seed", range(10))
def test_random_pattern_span_fuzz_vs_re(seed):
    """Generated patterns: finditer spans == Python re (leftmost; greedy ==
    longest for alternation-free patterns), sub replacements identical."""
    from regex_fpga_tpu.api import compile_regex
    from regex_fpga_tpu.models.regex import DfaBlowupError

    rng = np.random.default_rng(seed)
    pat = _gen_pattern(rng)
    cre = re.compile(("(?s)" + pat).encode())
    try:
        m = compile_regex(("(?s)" + pat).encode())
    except DfaBlowupError:
        pytest.skip(f"blowup: {pat}")
    alphabet = list(b"abcx01 \n")
    for _ in range(6):
        # fixed length keeps the per-pattern jit shape count low
        w = bytes(rng.choice(alphabet, size=48))
        want = []
        # skip Python's zero-width match positions the same way finditer
        # does (non-overlap + empty advances one byte) — re.finditer already
        # implements exactly that rule, so spans compare directly
        want = [mm.span() for mm in cre.finditer(w)]
        got = m.finditer(w)
        assert got == want, (pat, w, got, want)
        assert m.sub(b"<>", w) == cre.sub(b"<>", w), (pat, w)
