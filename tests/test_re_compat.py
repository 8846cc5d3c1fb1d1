"""re-module-compatible API layer (api.Match + re_compat) vs Python's re.

Comparisons use patterns where POSIX leftmost-longest and Python's
backtracking leftmost-first agree (greedy quantifiers, no prefix-ordered
alternations), so both engines must return identical spans.
"""

import re as pyre

import numpy as np
import pytest

from regex_fpga_tpu import re_compat as tre
from regex_fpga_tpu.api import compile_regex

TEXT = (
    b"The year 1984 was followed by 1985, then 2001: a space odyssey.  "
    b"IPv4 10.0.42.255 and 192.168.1.1 appear; emails a@b.co x_1@y.org.  "
    b"   whitespace   runs\t\tand\nnewlines \xff\x00 binary too. 7 42 999"
)

AGREEING = [
    (rb"\d+", None),
    (rb"[a-z]+", None),
    (rb"\s+", None),
    (rb"\d+\.\d+\.\d+\.\d+", None),
    (rb"[A-Za-z_][A-Za-z0-9_]*@[a-z]+\.[a-z]+", None),
    (rb"19[0-9]{2}", None),
]


@pytest.mark.parametrize("pat,_", AGREEING)
def test_finditer_spans_match_re(pat, _):
    m = compile_regex(pat)
    got = m.finditer(TEXT)
    want = [mm.span() for mm in pyre.finditer(pat, TEXT)]
    assert got == want


@pytest.mark.parametrize("pat,_", AGREEING)
def test_search_match_fullmatch(pat, _):
    m = compile_regex(pat)
    ps = pyre.search(pat, TEXT)
    gs = m.search(TEXT)
    assert (gs is None) == (ps is None)
    if ps:
        assert gs.span() == ps.span()
        assert gs.group() == ps.group(0)
    pm = pyre.match(pat, TEXT)
    gm = m.match(TEXT)
    assert (gm is None) == (pm is None)
    if pm:
        assert gm.span() == pm.span()
    pf = pyre.fullmatch(pat, TEXT)
    gf = m.fullmatch(TEXT)
    assert (gf is None) == (pf is None)


def test_match_is_longest_at_zero():
    m = compile_regex(rb"a+")
    mm = m.match(b"aaab")
    assert mm.span() == (0, 3)
    assert m.match(b"baaa") is None


def test_fullmatch_exact():
    m = compile_regex(rb"[0-9]+")
    assert m.fullmatch(b"12345").span() == (0, 5)
    assert m.fullmatch(b"123a5") is None
    assert m.fullmatch(b"") is None
    assert compile_regex(rb"a*").fullmatch(b"").span() == (0, 0)


def test_split_sub_subn_vs_re():
    for pat, data in [
        (rb"\s+", b"split  on   runs\tof whitespace"),
        (rb",", b"a,b,,c,"),
        (rb"\d+", b"a1b22c333d"),
    ]:
        m = compile_regex(pat)
        assert m.split(data) == pyre.split(pat, data)
        assert m.split(data, maxsplit=2) == pyre.split(pat, data, maxsplit=2)
        assert m.sub(b"<>", data) == pyre.sub(pat, b"<>", data)
        assert m.subn(b"<>", data, 1) == pyre.subn(pat, b"<>", data, 1)


def test_sub_callable():
    m = compile_regex(rb"\d+")
    out = m.sub(lambda mo: b"[" + mo.group() + b"]", b"a1b22c")
    assert out == b"a[1]b[22]c"


def test_match_object_protocol():
    mo = compile_regex(rb"\d+").search(b"ab123cd")
    assert (mo.start(), mo.end()) == (2, 5)
    assert mo.span() == (2, 5)
    assert mo.group() == mo.group(0) == mo[0] == b"123"
    with pytest.raises(IndexError):
        mo.group(1)
    assert "123" in repr(mo)


def test_empty_stream_nullable():
    assert compile_regex(rb"a*").finditer(b"") == [(0, 0)]
    assert compile_regex(rb"a+").finditer(b"") == []


# ---------------------------------------------------------------------------
# re_compat module surface
# ---------------------------------------------------------------------------


def test_module_level_functions():
    assert tre.findall(rb"\d+", b"a1b22") == [b"1", b"22"]
    assert tre.search(rb"\d+", b"a1b22").group() == b"1"
    assert tre.match(rb"[a-z]+", b"abc1").span() == (0, 3)
    assert tre.fullmatch(rb"[a-z0-9]+", b"abc1") is not None
    assert tre.split(rb",", b"a,b") == [b"a", b"b"]
    assert tre.sub(rb"\d", b"#", b"a1b2") == b"a#b#"
    assert tre.subn(rb"\d", b"#", b"a1b2") == (b"a#b#", 2)
    assert tre.count(rb"\d", b"a1b2c3") == 3


def test_str_mode_utf8():
    assert tre.findall(r"[0-9]+", "année 2026!") == ["2026"]
    assert tre.sub(r"\s+", " ", "a  b\tc") == "a b c"
    got = tre.split(r",", "α,β")
    assert got == ["α", "β"]


def test_ignorecase_flag():
    assert tre.findall(rb"abc", b"ABC abc AbC", flags=tre.IGNORECASE) == [
        b"ABC", b"abc", b"AbC"
    ]
    assert tre.findall(rb"abc", b"ABC abc AbC") == [b"abc"]


def test_compile_cache_and_purge():
    p1 = tre.compile(rb"\d+")
    assert tre.compile(rb"\d+") is p1
    tre.purge()
    assert tre.compile(rb"\d+") is not p1


def test_unsupported_flags_raise():
    with pytest.raises(ValueError):
        tre.compile(rb"a", flags=256)  # re.ASCII stays unsupported


def test_error_is_regexerror():
    with pytest.raises(tre.error):
        tre.compile(rb"a{2,1}")


def test_pattern_engine_extras():
    p = tre.compile(rb"ab")
    n = p.count(b"zabzzabab")
    assert n == 3
    rep = p.scan(np.frombuffer(b"zabzab", dtype=np.uint8))
    assert rep.total == 2


def test_multiline_flag_matches_python_re():
    import re as pyre

    from regex_fpga_tpu import re_compat as fre

    text = "foo bar\nbar foo\nfoo\n\nbaz foo"
    for pat in (r"^foo", r"foo$", r"^foo$", r"^$", r"^(\w+) (\w+)$"):
        want = [m.span() for m in pyre.finditer(pat, text, pyre.M)]
        got = [m.span() for m in fre.finditer(pat, text, fre.MULTILINE)]
        assert got == want, (pat, got, want)
    # groups under (?m)
    w = pyre.search(r"^(\w+) (\w+)$", text, pyre.M)
    g = fre.search(r"^(\w+) (\w+)$", text, fre.M)
    assert g.groups() == tuple(x.encode() for x in w.groups())
    assert g.span() == w.span()
    # sub with line anchors
    assert fre.sub(r"^foo", "X", text, flags=fre.M) == \
        pyre.sub(r"^foo", "X", text, flags=pyre.M)


def test_multiline_prefix_flag_group():
    """(?m) inline prefix works through compile_regex directly."""
    from regex_fpga_tpu.api import compile_regex

    m = compile_regex(rb"(?m)^ab+$")
    assert m.finditer(b"abb\nxabb\nab\nabbb") == [(0, 3), (9, 11), (12, 16)]
    assert m.search(b"zz\nabb\n").span() == (3, 6)
    # without (?m), mid-pattern anchors still raise
    import pytest as _pytest

    from regex_fpga_tpu.models.regex import RegexError

    with _pytest.raises(RegexError):
        compile_regex(rb"a^b")


def test_verbose_flag():
    import re

    from regex_fpga_tpu import re_compat as re2

    pat = r"""
        \d+      # the integer part
        \.       # the dot
        \d+      # the fraction
        [ ]      # literal space stays (class context)
    """
    assert re2.compile(pat, re2.X).findall("pi 3.14  e 2.71 x") == \
        re.compile(pat, re.X).findall("pi 3.14  e 2.71 x")
    # escaped whitespace/hash survive stripping
    assert re2.compile(r"a\ b", re2.X).search(b"a b") is not None
    assert re2.compile(r"a\#b", re2.X).search(b"a#b") is not None
    with pytest.raises(ValueError):
        re2.compile("a", 4)  # re.L remains unsupported


def test_match_parity_attributes():
    """re.Match parity: pos/endpos/re/lastgroup/regs (r4 leftover)."""
    import re as _re

    import regex_fpga_tpu.re_compat as rc

    for pat, s, pos, endpos in [
        (rb"(?P<w>\w+)\s+(?P<d>\d+)", b"hey  42 tail", 0, None),
        (rb"a(b)?c", b"xxabcxx", 2, None),
        (rb"\d+", b"a1b22c333", 3, 8),
    ]:
        p, rp = rc.compile(pat), _re.compile(pat)
        m = p.search(s, pos, endpos)
        rm = (rp.search(s, pos) if endpos is None
              else rp.search(s, pos, endpos))
        assert (m is None) == (rm is None)
        if m is None:
            continue
        assert m.pos == rm.pos
        assert m.lastgroup == rm.lastgroup
        assert m.lastindex == rm.lastindex
        assert m.regs == rm.regs
        assert m.re is p
        # endpos: ours is relative to the truncated subject (string IS
        # the endpos-truncated subject); equal to re's when no truncation
        if endpos is None:
            assert m.endpos == rm.endpos
    # finditer matches carry pos and re too
    p, rp = rc.compile(rb"\d+"), _re.compile(rb"\d+")
    ours = list(p.finditer(b"a1b22c333", 2))
    refs = list(rp.finditer(b"a1b22c333", 2))
    assert [m.span() for m in ours] == [m.span() for m in refs]
    assert all(m.pos == 2 and m.re is p for m in ours)
    # lastgroup None for unnamed winning group
    m = rc.compile(rb"(a)|(?P<nb>b)").search(b"za")
    rm = _re.compile(rb"(a)|(?P<nb>b)").search(b"za")
    assert m.lastgroup == rm.lastgroup is None
    m2 = rc.compile(rb"(a)|(?P<nb>b)").search(b"zb")
    rm2 = _re.compile(rb"(a)|(?P<nb>b)").search(b"zb")
    assert m2.lastgroup == rm2.lastgroup == "nb"
