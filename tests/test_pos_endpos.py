"""``re.Pattern`` pos/endpos parity across all three matcher families:
device DFA (context-free), host Pike VM (boundary/anchor assertions),
host backtracker (lookbehind/backrefs).  The subtle rules under test:
``pos`` is NOT slicing (lookbehind/\\b context before it stays visible;
``^`` does not match at pos > 0) while ``endpos`` IS truncation
(``$``/lookahead behave as if the string ended there)."""

import re

import numpy as np
import pytest

from regex_fpga_tpu import api
from regex_fpga_tpu import re_compat as rc

FAMILIES = [
    (r"[0-9]+", "ab12 cd345 e6", "dfa"),          # DfaMatcher
    (r"ab+", "xabb ab abbb", "dfa"),
    (r"\bcat\b", "cat concat cat", "pike"),       # HostRegexMatcher
    (r"(?m)^x$", "x\nyx\nx", "pike"),
    (r"(?<=a)b+", "ab abb cb", "bt"),             # HostBacktrackMatcher
    (r"(\w+) \1", "ho ho hi hi", "bt"),
    (r"(a)?(?(1)b|c)", "ab c ac", "bt"),
]


@pytest.mark.parametrize("pat,text,_fam", FAMILIES)
def test_search_match_fullmatch_pos_endpos_vs_re(pat, text, _fam):
    rx = re.compile(pat)
    m = api.compile_regex(pat)
    n = len(text)
    for pos in range(0, n + 2):
        for endpos in list(range(0, n + 1)) + [None]:
            args = (pos,) if endpos is None else (pos, endpos)
            for name in ("search", "match", "fullmatch"):
                want = getattr(rx, name)(text, *args)
                got = getattr(m, name)(text.encode(), *args)
                assert (got is None) == (want is None), (name, pat, pos,
                                                         endpos)
                if want:
                    assert got.span() == want.span(), (name, pat, pos,
                                                       endpos)


@pytest.mark.parametrize("pat,text,_fam", FAMILIES)
def test_finditer_pos_endpos_vs_re(pat, text, _fam):
    rx = re.compile(pat)
    m = api.compile_regex(pat)
    n = len(text)
    for pos in range(0, n + 1, 2):
        for endpos in [None, n, n - 1, n // 2, 1, 0]:
            args = (pos,) if endpos is None else (pos, endpos)
            want = [mm.span() for mm in rx.finditer(text, *args)]
            got = m.finditer(text.encode(), pos=pos, endpos=endpos)
            assert got == want, (pat, pos, endpos, got, want)


def test_leading_caret_never_matches_at_pos():
    # pos is not slicing: ^ stays pinned to the true string start
    for pat, text in [(r"^ab", "xab ab"), (r"^(a)\1", "zaa aa"),
                      (r"^cat\b", "xcat cat")]:
        rx = re.compile(pat)
        m = api.compile_regex(pat)
        for pos in range(0, len(text)):
            assert (m.search(text.encode(), pos) is None) == (
                rx.search(text, pos) is None), (pat, pos)
            assert (m.match(text.encode(), pos) is None) == (
                rx.match(text, pos) is None), (pat, pos)


def test_lookbehind_sees_before_pos():
    # the defining non-slicing case: (?<=a)b at pos=1 must match 'ab'
    m = api.compile_regex(r"(?<=a)b")
    assert m.search(b"ab", 1).span() == (1, 2)
    assert re.compile(r"(?<=a)b").search("ab", 1).span() == (1, 2)
    # \b context likewise (Pike path)
    mb = api.compile_regex(r"\bbat")
    assert mb.search(b"x bat", 2).span() == (2, 5)
    assert mb.search(b"xbat", 1) is None  # no boundary before 'b'
    assert re.compile(r"\bbat").search("xbat", 1) is None


def test_endpos_truncates_lookahead_and_dollar():
    # endpos behaves like end-of-string: $ matches there, lookahead stops
    m = api.compile_regex(r"ab$")
    assert m.search(b"abx", endpos=2).span() == (0, 2)
    assert re.compile(r"ab$").search("abx", 0, 2).span() == (0, 2)
    mb = api.compile_regex(r"a(?=b)")
    assert mb.search(b"ab", endpos=1) is None
    assert re.compile(r"a(?=b)").search("ab", 0, 1) is None


def test_re_compat_pattern_pos_endpos():
    p = rc.compile(r"\d+")
    assert p.search("ab12cd34", 3).span() == (3, 4)
    assert p.match("12x34", 3, 5).group() == b"34"
    assert [m.span() for m in p.finditer("1 22 333", 2)] == [(2, 4), (5, 8)]
    assert p.findall("1 22 333", 2, 4) == ["22"]  # str pattern -> decoded
    q = rc.compile(r"(?<=x)\d")
    assert q.search("x5", 1).group() == b"5"


def test_pos_endpos_fuzz_vs_re():
    rnd = np.random.default_rng(23)
    pats = [r"a+b", r"[ab]{2}", r"\bab", r"(?<=b)a", r"(a)\1", r"a$",
            r"(a)?(?(1)b|a??)"]
    checked = 0
    for _ in range(150):
        pat = pats[int(rnd.integers(0, len(pats)))]
        text = "".join("ab "[int(i)] for i in rnd.integers(0, 3, 10))
        pos = int(rnd.integers(0, 11))
        endpos = int(rnd.integers(0, 11))
        rx = re.compile(pat)
        m = api.compile_regex(pat)
        want = [mm.span() for mm in rx.finditer(text, pos, endpos)]
        got = m.finditer(text.encode(), pos=pos, endpos=endpos)
        assert got == want, (pat, text, pos, endpos, got, want)
        ws = rx.search(text, pos, endpos)
        gs = m.search(text.encode(), pos, endpos)
        assert (gs is None) == (ws is None)
        if ws:
            assert gs.span() == ws.span()
        checked += 1
    assert checked == 150


def test_literalset_pos_endpos():
    m = api.compile_literals([b"ab", b"bc"])
    text = b"xabcab"
    allhits = m.finditer(text)
    assert m.finditer(text, pos=2) == [(h if False else h)
                                      for h in allhits if h[0] >= 2]
    assert m.finditer(text, endpos=3) == [h for h in allhits if h[1] <= 3]
    assert m.finditer(text, pos=2, endpos=4) == [
        h for h in allhits if h[0] >= 2 and h[1] <= 4
    ]
    assert m.search(text, 4).span() == (4, 6)
    assert m.search(text, 5) is None


def test_clamping_edges_vs_re():
    """r4 review: pos clamps to len FIRST (search('xx', 7) still finds the
    empty match at 2), and pos > endpos after clamping means NO match."""
    cases = [
        (r"a*", "aaaa", [(3, 2), (4, 2), (2, 2), (7, None), (0, 99)]),
        (r"x*", "xx", [(7, None), (5, 1), (0, 0)]),
        (r"(a)?(?(1)b|a??)", "aa", [(5, None), (3, 1), (2, 2)]),
        (r"\bx*", "xx", [(9, None), (3, 2)]),
    ]
    for pat, text, pes in cases:
        rx = re.compile(pat)
        m = api.compile_regex(pat)
        for pos, endpos in pes:
            args = (pos,) if endpos is None else (pos, endpos)
            for name in ("search", "match", "fullmatch"):
                want = getattr(rx, name)(text, *args)
                got = getattr(m, name)(text.encode(), *args)
                assert (got is None) == (want is None), (pat, name, pos,
                                                         endpos, got, want)
                if want:
                    assert got.span() == want.span(), (pat, name, pos,
                                                       endpos)
            want_f = [mm.span() for mm in rx.finditer(text, *args)]
            got_f = m.finditer(text.encode(), pos=pos, endpos=endpos)
            assert got_f == want_f, (pat, pos, endpos, got_f, want_f)


def test_fast_pattern_only_not_metadata():
    from regex_fpga_tpu.api import compile_snort

    m = compile_snort(
        'alert tcp any any -> any any (msg:"a"; content:"foo"; '
        'fast_pattern:only; sid:1;)\n'
        'alert tcp any any -> any any (msg:"b"; content:"bar"; '
        'fast_pattern; sid:2;)\n'
    )
    rows = {r["sid"]: r for r in m.enforcement_report()["rules"]}
    assert rows[1]["status"] == "partial"       # :only changes matching
    assert rows[1]["unenforced_options"] == ["fast_pattern"]
    assert rows[2]["status"] == "enforced"      # plain hint: metadata
