"""Aho–Corasick multi-literal engine (models/literals.py, api.compile_literals)
vs a naive every-occurrence oracle.
"""

import numpy as np
import pytest

from regex_fpga_tpu.api import compile_literals
from regex_fpga_tpu.models import build_aho_corasick


def naive_occurrences(patterns, data: bytes):
    """All (start, end, pid) occurrences, overlapping included."""
    hits = []
    for pid, p in enumerate(patterns):
        off = data.find(p)
        while off != -1:
            hits.append((off, off + len(p), pid))
            off = data.find(p, off + 1)
    return sorted(hits, key=lambda t: (t[1], t[2]))


def test_automaton_shape():
    ac = build_aho_corasick([b"he", b"she", b"his", b"hers"])
    # classic textbook automaton: root + 10 trie states
    assert ac.num_states == 10
    assert ac.dfa.table.shape == (256, 10)
    # 'hers' state outputs both 'hers' and the suffix 'he'... no: outputs of
    # state 'hers' = {hers}; suffix chain of 'she' endpoint includes 'he'
    she_hits = [o for o in ac.outputs if len(o) == 2]
    assert she_hits == [(1, 0)] or she_hits == [(0, 1)]


def test_classic_example():
    m = compile_literals([b"he", b"she", b"his", b"hers"])
    data = b"ushers"
    got = m.finditer(data)
    assert sorted(got) == sorted(naive_occurrences(m.ac.patterns, data))
    rep = m.scan_patterns(data)
    # he:1 she:1 hers:1 his:0
    assert rep.pattern_counts.tolist() == [[1, 1, 0, 1]]


def test_overlapping_and_nested():
    m = compile_literals([b"aa", b"aaa"])
    data = b"aaaa"
    want = naive_occurrences(m.ac.patterns, data)
    assert sorted(m.finditer(data)) == sorted(want)
    assert m.scan_patterns(data).pattern_counts.tolist() == [[3, 2]]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    alpha = b"abcd"
    pats = []
    seen = set()
    for _ in range(12):
        l = int(rng.integers(1, 6))
        p = bytes(alpha[i] for i in rng.integers(0, len(alpha), l))
        if p not in seen:
            seen.add(p)
            pats.append(p)
    data = bytes(alpha[i] for i in rng.integers(0, len(alpha), 2000))
    m = compile_literals(pats)
    want = naive_occurrences(pats, data)
    assert sorted(m.finditer(data)) == sorted(want)
    per = m.scan_patterns(data).pattern_counts[0]
    for pid in range(len(pats)):
        assert per[pid] == sum(1 for h in want if h[2] == pid), pats[pid]


def test_binary_patterns():
    pats = [b"\x00\xff", b"\xff\xff", b"\x00"]
    data = b"\x00\xff\xff\x00\x00\xff"
    m = compile_literals(pats)
    assert sorted(m.finditer(data)) == sorted(naive_occurrences(pats, data))


def test_final_byte_match_counted():
    m = compile_literals([b"ab"])
    assert m.scan_patterns(b"zzab").pattern_counts.tolist() == [[1]]
    assert m.finditer(b"zzab") == [(2, 4, 0)]


def test_search_match_fullmatch():
    m = compile_literals([b"foo", b"foobar", b"bar"])
    s = m.search(b"zzfoobar")
    assert s.span() == (2, 5) and s.group() == b"foo"  # earliest END
    assert m.match(b"foobar!").span() == (0, 6)  # longest prefix literal
    assert m.match(b"xfoo") is None
    assert m.fullmatch(b"bar").span() == (0, 3)
    assert m.fullmatch(b"barz") is None
    assert m.search(b"zzz") is None
    assert m.findall(b"barfoo") == [b"bar", b"foo"]


def test_duplicates_and_errors():
    m = compile_literals([b"ab", b"ab"])
    assert m.scan_patterns(b"xabx").pattern_counts.tolist() == [[1, 1]]
    with pytest.raises(ValueError):
        compile_literals([])
    with pytest.raises(ValueError):
        compile_literals([b"a", b""])


def test_str_patterns_coerced():
    m = compile_literals(["abc", "bc"])
    assert m.scan_patterns(b"xabcx").pattern_counts.tolist() == [[1, 1]]


def test_large_set_count_mode():
    # a thousand distinct literals through the k-gram/count path
    pats = [b"P%04d" % i for i in range(1000)]
    data = b"".join(b"xx" + p for p in pats[::3]) + b"P0003"
    m = compile_literals(pats)
    # count() counts match-ENDING positions (distinct ends)
    want = naive_occurrences(pats, data)
    assert m.count(data) == len({(e) for _, e, _ in want})
    per = m.scan_patterns(data).pattern_counts[0]
    assert per.sum() == len(want)
