"""Backreference + lookaround patterns: host backtracking engine vs
Python ``re`` (the semantics contract is exact re-equivalence)."""

import re

import numpy as np
import pytest

from regex_fpga_tpu import api
from regex_fpga_tpu.models.regex import RegexError, contains_backtrack, parse_pattern


DIRECTED = [
    (r"(a+)b\1", "aabaax aabaa abab aaabaaa"),
    (r"(\w+) \1", "hello hello world world word words"),
    (r"(a)\1{2,3}", "aaaa aaa aa aaaaa"),
    (r"foo(?=bar)", "foobar foobaz barfoo foobarbar"),
    (r"foo(?!bar)", "foobar foobaz foo"),
    (r"(?<=a)b", "ab cb aab b"),
    (r"(?<!a)b", "ab cb b abb"),
    (r"(a)(?=(b))", "ab ac abb"),
    (r"(a|b)\1", "aa bb ab ba"),
    (r"(?P<x>cat|dog)s? and (?P=x)s?", "cats and cat dog and dogs"),
    (r"([abc]+)x\1", "abcxabc aaxaa bxb abxba"),
    (r"(a*)b\1", "aabaa b ba aabaaa"),
    (r"x(?=y)(?=.z)", "xyz xy xzy"),
    (r"(?<=ab)c(?=de)", "abcde abce bcde"),
    (r"(a?)b\1", "bab ab b aba"),
    (r"(x+)(?!x)\1", "xxxx xxx xx"),
    (r"(?i)(CaT)\s+\1", "cat CAT Cat cat"),
    (r"^(a+)\1$", "aaaa"),
    (r"^(a+)\1$", "aaa"),
    (r"(ab|a)(?=b)", "abb ab"),
    # conditionals (?(id)yes|no) — branch on group participation
    (r"(a)?(?(1)b|c)", "ab c abc ac"),
    (r"(a)?(?(1)b)", "ab x b"),
    (r"(?P<g>x)?(?(g)y|z)", "xy z xz y"),
    (r"(?(1)a|b)(x)", "bx ax abx"),
    (r"(<)?\w+(?(1)>)", "<tag> word <open"),
    (r"(a)?(?(1)|c)x", "ax cx x"),
    (r"(a)(b)?(?(2)c|d)", "abc ad abd ac"),
]


@pytest.mark.parametrize("pat,text", DIRECTED)
def test_directed_vs_re(pat, text):
    m = api.compile_regex(pat)
    assert isinstance(m, api.HostBacktrackMatcher)
    data = text.encode()
    assert m.finditer(data) == [mm.span() for mm in re.finditer(pat, text)]
    gm, wm = m.search(data), re.search(pat, text)
    assert (gm is None) == (wm is None)
    if wm:
        assert gm.span() == wm.span()
        assert gm.groups() == tuple(
            None if g is None else g.encode() for g in wm.groups()
        )
        assert gm.lastindex == wm.lastindex
    gf, wf = m.fullmatch(data), re.fullmatch(pat, text)
    assert (gf is None) == (wf is None)
    if wf:
        assert gf.groups() == tuple(
            None if g is None else g.encode() for g in wf.groups()
        )
    gm0, wm0 = m.match(data), re.match(pat, text)
    assert (gm0 is None) == (wm0 is None)
    if wm0:
        assert gm0.span() == wm0.span()


def test_fuzz_vs_re():
    """Random pattern/subject fuzz over an alphabet small enough to hit
    backrefs and lookarounds constantly."""
    rnd = np.random.default_rng(7)
    atoms = ["a", "b", "c", "(a)", "(b|a)", "(ab)", "[ab]", "a+", "b*",
             "(a+)", "(b+?)", "(?:ab)+"]
    tails = ["", r"\1", r"(?=a)", r"(?=b)", r"(?!a)", r"(?<=a)", r"(?<!b)"]
    checked = 0
    for _ in range(400):
        n = int(rnd.integers(2, 5))
        pat = "".join(atoms[int(i)] for i in rnd.integers(0, len(atoms), n))
        pat += tails[int(rnd.integers(0, len(tails)))]
        if r"\1" in pat and "(" not in pat.split("\\1")[0]:
            continue
        try:
            rx = re.compile(pat)
        except re.error:
            continue
        if not contains_backtrack(parse_pattern(pat).node):
            continue
        try:
            m = api.compile_regex(pat)
        except RegexError:
            continue
        text = "".join("ab c"[int(i)] for i in rnd.integers(0, 4, 24))
        want = [mm.span() for mm in rx.finditer(text)]
        got = m.finditer(text.encode())
        assert got == want, (pat, text, got, want)
        wm = rx.search(text)
        if wm:
            gm = m.search(text.encode())
            assert gm.groups() == tuple(
                None if g is None else g.encode() for g in wm.groups()
            ), (pat, text)
        checked += 1
    assert checked > 150, checked


def test_re_compat_layer_routes_backtrack():
    from regex_fpga_tpu import re_compat as re2

    p = re2.compile(r"(\w+)=\1")
    assert p.findall("a=a b=c xx=xx") == ["a", "xx"]  # group semantics
    assert p.sub("DUP", "a=a b=c") == "DUP b=c"
    q = re2.compile(r"\d+(?= dollars)")
    # re_compat is byte-oriented by contract (module docstring): Match
    # contents are bytes even for str patterns
    assert q.search("pay 42 dollars").group() == b"42"
    assert q.groupindex == {}
    assert re2.compile(r"(?P<q>.)(?P=q)").groupindex == {"q": 1}
    # named backref + groupdict through the compat Match
    r_ = re2.compile(r"(?P<q>['\"]).*?(?P=q)")
    mm = r_.search("say \"hi\" ok")
    assert mm.group() == b'"hi"'


def test_sub_templates_and_split_with_backrefs():
    m = api.compile_regex(rb"(a+)b\1")
    assert m.sub(b"<X>", b"aabaa c aba") == b"<X> c <X>"
    assert m.split(b"zaabaaz") == [b"z", b"z"]
    mm = m.search(b"xxaabaax")
    assert mm.expand(rb"[\1]") == b"[aa]"


def test_errors_match_re_rules():
    with pytest.raises(RegexError):
        api.compile_regex(r"(a)\2")  # invalid group reference
    with pytest.raises(RegexError):
        api.compile_regex(r"(?P=nope)a")  # unknown name
    with pytest.raises(RegexError):
        api.compile_regex(r"(?<=a+)b")  # variable-width lookbehind
    # fixed-width alternation lookbehind is fine (as in re)
    assert api.compile_regex(r"(?<=ab|cd)e").finditer(b"abe cde xe") == [
        (2, 3), (6, 7)
    ]


def test_device_apis_raise():
    m = api.compile_regex(r"(a)\1")
    with pytest.raises(NotImplementedError):
        m.scan(b"aa")
    with pytest.raises(NotImplementedError):
        m.count(b"aa")


def test_lookahead_capture_persists():
    # as in Python: groups captured inside a positive lookahead are visible
    m = api.compile_regex(r"(a)(?=(b))").search(b"ab")
    w = re.search(r"(a)(?=(b))", "ab")
    assert m.groups() == (b"a", b"b") and w.groups() == ("a", "b")
    assert m.lastindex == w.lastindex == 2


def test_empty_match_iteration_rules():
    for pat, text in [(r"(?=a)", "aa b a"), (r"(a?)\1", "aab"),
                      (r"(?<=a)", "baab")]:
        m = api.compile_regex(pat)
        assert m.finditer(text.encode()) == [
            mm.span() for mm in re.finditer(pat, text)
        ], (pat, text)


def test_finditer_arrays_on_host_matchers():
    """finditer_arrays must work on every host-routed matcher family (the
    base implementation used to raise RegexError for \\b patterns)."""
    for pat, text, n in [(r"\bcat\b", b"a cat sat cat", 2),
                         (r"(a)\1", b"aa b aa", 2)]:
        m = api.compile_regex(pat)
        arr = m.finditer_arrays(text)
        assert arr.shape == (n, 2)
        assert arr.tolist() == [list(s) for s in m.finditer(text)]


def test_conditional_fuzz_vs_re():
    """Fuzz (?(id)yes|no) against re: random optional-group prefixes and
    conditional bodies over a tiny alphabet."""
    rnd = np.random.default_rng(11)
    prefixes = ["(a)?", "(b)?", "(?P<n>a)?", "(a|b)?", "(ab)?"]
    conds = ["(?(1)b|c)", "(?(1)b)", "(?(1)|c)", "(?(1)a+|c?)",
             "(?(1)(?:b|c)|a)"]
    named_conds = ["(?(n)b|c)", "(?(n)b)"]
    checked = 0
    for _ in range(200):
        pre = prefixes[int(rnd.integers(0, len(prefixes)))]
        cond = (named_conds[int(rnd.integers(0, 2))] if "?P<n>" in pre
                else conds[int(rnd.integers(0, len(conds)))])
        mid = "".join("abc"[int(i)] for i in rnd.integers(0, 3, int(rnd.integers(0, 3))))
        pat = pre + mid + cond
        rx = re.compile(pat)
        m = api.compile_regex(pat)
        assert isinstance(m, api.HostBacktrackMatcher)
        text = "".join("ab c"[int(i)] for i in rnd.integers(0, 4, 24))
        got = m.finditer(text.encode())
        want = [mm.span() for mm in rx.finditer(text)]
        assert got == want, (pat, text, got, want)
        wm = rx.search(text)
        if wm:
            gm = m.search(text.encode())
            assert gm.groups() == tuple(
                None if g is None else g.encode() for g in wm.groups()
            ), (pat, text)
        checked += 1
    assert checked == 200


def test_conditional_errors_match_re():
    # validated against the FINAL group count: later groups are fine,
    # out-of-range numbers / unknown names / >2 branches are errors
    assert api.compile_regex(r"(?(1)a|b)(x)").finditer(b"bx") == [(0, 2)]
    with pytest.raises(RegexError):
        api.compile_regex(r"(?(2)a|b)(x)")
    with pytest.raises(RegexError):
        api.compile_regex(r"(?(1)y|n)")  # no groups at all
    with pytest.raises(RegexError):
        api.compile_regex(r"(?(1)a|b|c)(x)")  # three branches
    with pytest.raises(RegexError):
        api.compile_regex(r"(?(name)a|b)")  # unknown group name


def test_multidigit_backrefs_vs_re():
    # \10 and up: two digits form the group number, exactly as re
    pat = "".join(f"({c})" for c in "abcdefghijk") + r"\11"
    assert api.compile_regex(pat).finditer(b"abcdefghijkk") == [
        mm.span() for mm in re.finditer(pat, "abcdefghijkk")
    ]
    with pytest.raises(RegexError):
        api.compile_regex(r"(a)\12")  # invalid group reference 12 (as re)
    with pytest.raises(RegexError):
        api.compile_regex(r"(a)\19")  # 9 not octal -> group 19 -> invalid
    with pytest.raises(RegexError):
        # re reads \123 as an OCTAL escape; this byte parser refuses octal
        # escapes (never silently literal) instead of matching chr(0o123)
        api.compile_regex(r"(a)\123")


def test_lookaround_capture_no_leak_into_siblings():
    """r3 advisor: captures from a successful positive lookaround must be
    rolled back when the enclosing branch later fails (re parity)."""
    for pat, text in [
        (r"(?=(a))b|(.)", "a"),
        (r"(?=(a))ax|(a)y", "ay"),
        (r"((?<=(a))x|.)", "bx"),
        (r"(?=(a+))\1b|(a)", "aa"),
    ]:
        gm = api.compile_regex(pat).search(text.encode())
        wm = re.search(pat, text)
        assert (gm is None) == (wm is None), (pat, text)
        if wm:
            assert gm.groups() == tuple(
                None if g is None else g.encode() for g in wm.groups()
            ), (pat, text)


def test_repeated_complex_body_is_iterative():
    """r3 advisor: Rep over a deterministic fixed-width body must not
    recurse per iteration (RecursionError on kilobyte inputs)."""
    text = "ab" * 600 + "x"
    m = api.compile_regex(r"((?:ab)+)\1")
    w = re.search(r"((?:ab)+)\1", text)
    g = m.search(text.encode())
    assert g.span() == w.span() == (0, 1200)
    # equal-width alternation bodies take the iterative path too
    text2 = "foobarfoo" * 300 + "!"
    m2 = api.compile_regex(r"((?:foo|bar)+)!\Z")
    w2 = re.search(r"((?:foo|bar)+)!\Z", text2)
    assert m2.search(text2.encode()).span() == w2.span()
    # a truly non-deterministic body still backtracks correctly (small n)
    m3 = api.compile_regex(r"((a+)b)+\2")
    w3 = re.search(r"((a+)b)+\2", "aabab a")
    g3 = m3.search(b"aabab a")
    assert (g3 is None) == (w3 is None)
    if w3:
        assert g3.span() == w3.span()


def test_max_steps_bounds_redos():
    """Opt-in step budget turns catastrophic backtracking into a prompt
    BacktrackLimitExceeded; default (None) stays unlimited."""
    import time

    from regex_fpga_tpu.models.backtrack import BacktrackLimitExceeded

    m = api.compile_regex(r"(a+)+b(?=x)", max_steps=200_000)
    t0 = time.monotonic()
    with pytest.raises(BacktrackLimitExceeded):
        m.search(b"a" * 64)
    assert time.monotonic() - t0 < 10.0
    # benign inputs under the same budget still match
    assert m.search(b"aaabx").span() == (0, 4)
    # the budget is per-search: a second search gets a fresh allowance
    assert m.search(b"aabx aaabx").span() == (0, 3)
    # BacktrackLimitExceeded is a RegexError (catchable as engine error)
    assert issubclass(BacktrackLimitExceeded, RegexError)
    # re_compat passthrough
    from regex_fpga_tpu import re_compat as re2

    p = re2.compile(r"(a+)+b(?=x)", max_steps=100_000)
    with pytest.raises(BacktrackLimitExceeded):
        p.search("a" * 64)
    assert p.search("aabx").group() == b"aab"


def test_absolute_anchors_A_Z_vs_re():
    """\\A and \\Z escapes (absolute buffer start/end, Python re
    semantics) — on the Pike-VM path alone and combined with backtrack
    features."""
    cases = [
        (r"\Afoo", "foo bar foo"),
        (r"foo\Z", "foo bar foo"),
        (r"foo\Z", "foofoo"),
        (r"\Aab*\Z", "abbb"),
        (r"(?m)^x$|\Ay", "y\nx\ny"),
        (r"\A(a+)\1\Z", "aaaa"),
        (r"\A(a+)\1\Z", "aaa"),
        (r"a\Z", "a\n"),  # \Z does NOT allow a trailing newline (unlike $)
    ]
    for pat, text in cases:
        m = api.compile_regex(pat)
        got = m.finditer(text.encode())
        want = [mm.span() for mm in re.finditer(pat, text)]
        assert got == want, (pat, text, got, want)


def test_empty_match_iteration_modern_rule():
    """r4 review finding 3: Python 3.7+ empty-match rule on the
    backtracker — after an empty match at q, resume AT q banning only the
    empty match there (a non-empty match at q must still be found)."""
    for pat, text in [
        (r"(a)?(?(1)|b??)", "b"),
        (r"(?:ab)*?(?=a)", "abab"),
        (r"(a?)\1", "aab"),
        (r"(x)??", "xx"),
        (r"(a+)?", "aa b"),
    ]:
        m = api.compile_regex(pat)
        got = m.finditer(text.encode())
        want = [mm.span() for mm in re.finditer(pat, text)]
        assert got == want, (pat, text, got, want)
