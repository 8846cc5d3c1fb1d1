"""Capture groups: tagged-Pike-VM extraction vs Python ``re``.

The reference RTL reports only accept-state indices (``Design/FPGA.v:210-226``
— no sub-span concept exists in the hardware), so captures are new framework
surface: device engines find spans, ``models/captures.py`` recovers group
spans host-side.  Every case here is chosen so that Python ``re`` agrees on
the overall span (no leftmost-longest vs leftmost-first divergence), making
``re`` a valid oracle for group assignment.
"""

import re

import pytest

from regex_fpga_tpu import re_compat
from regex_fpga_tpu.api import compile_regex
from regex_fpga_tpu.models.captures import CaptureProgram
from regex_fpga_tpu.models.regex import RegexError, parse_pattern

AGREEING_CASES = [
    (r"(\w+)@(\w+)\.(com|org)", b"mail me at bob@example.org now"),
    (r"(?P<year>\d{4})-(?P<mo>\d{2})-(?P<day>\d{2})", b"date: 2026-08-19."),
    (r"(ab)+c", b"xxababc!"),          # repeated group: last repetition wins
    (r"(a)?b", b"zzb"),                # optional group left unmatched
    (r"(a)?b", b"zab"),
    (r"((a+)(b+))c", b"aaabbc"),       # nested groups
    (r"(x|y)(z?)", b"qxz"),
    (r"(\d+)\.(\d+)", b"pi=3.14159"),
    (r"(?:no)(yes)", b"..noyes.."),    # non-capturing mixed with capturing
    (r"(a(b(c)))", b"abc"),            # deep nesting
    (r"([ab]+)([bc]+)", b"zabbccz"),   # greedy split inside fixed span
    (r"(a*)(a*)", b"aaa"),             # first greedy star takes everything
]


@pytest.mark.parametrize("pat,data", AGREEING_CASES)
def test_groups_match_python_re(pat, data):
    m1 = compile_regex(pat).search(data)
    m2 = re.search(pat.encode(), data)
    assert (m1 is None) == (m2 is None)
    assert m1.span() == m2.span()
    assert m1.groups() == m2.groups()
    assert m1.groupdict() == m2.groupdict()
    for i in range(len(m2.groups()) + 1):
        assert m1.span(i) == m2.span(i)
        assert m1.group(i) == m2.group(i)
    assert m1.lastindex == m2.lastindex


def test_named_group_access():
    m = compile_regex(r"(?P<k>\w+)=(?P<v>\d+)").search(b"set x=42;")
    assert m.group("k") == b"x"
    assert m.group("v") == b"42"
    assert m.group("k", "v") == (b"x", b"42")
    assert m["k"] == b"x"
    with pytest.raises(IndexError):
        m.group("nope")
    with pytest.raises(IndexError):
        m.group(3)


def test_groups_default():
    m = compile_regex(r"(a)?(b)").search(b"b")
    assert m.groups() == (None, b"b")
    assert m.groups(default=b"-") == (b"-", b"b")


def test_capture_program_direct():
    prog = CaptureProgram(parse_pattern(r"(a+)(b+)"))
    assert prog.num_groups == 2
    # absolute offsets: span embedded mid-buffer
    spans, lastindex = prog.extract(b"zzaabbbzz", 2, 7)
    assert spans == [(2, 4), (4, 7)]
    assert lastindex == 2


def test_match_finditer_and_repeats():
    ms = compile_regex(r"(\w+)=(\d+)").finditer_matches(b"a=1 bb=22 c=333")
    assert [(m.group(1), m.group(2)) for m in ms] == [
        (b"a", b"1"), (b"bb", b"22"), (b"c", b"333")
    ]


def test_parser_rejects_unsupported_constructs():
    # r3: lookaround and backreferences now PARSE (they route to the host
    # backtracking engine — tests/test_backtrack.py); the DFA compiler
    # still refuses them, and genuinely unsupported (?...) forms, invalid
    # group refs, and bad names still raise at parse
    from regex_fpga_tpu.models.regex import compile_pattern

    for pat in [r"(?=a)b", r"(?<=a)b", r"(a)\1"]:
        parse_pattern(pat)  # parses...
        with pytest.raises(RegexError):
            compile_pattern(pat)  # ...but never compiles to the device
    for pat in [r"(?#comment)a", r"(?P=name)", r"a\1"]:
        with pytest.raises(RegexError):
            parse_pattern(pat)
    with pytest.raises(RegexError):
        parse_pattern(r"(?P<dup>a)(?P<dup>b)")  # duplicate name
    with pytest.raises(RegexError):
        parse_pattern(r"(?P<1bad>a)")  # invalid identifier


def test_group_numbering_is_textual_order():
    pp = parse_pattern(r"((a)(b))(?:c)(d)")
    assert pp.num_groups == 4
    m = compile_regex(r"((a)(b))(?:c)(d)").search(b"abcd")
    assert m.groups() == (b"ab", b"a", b"b", b"d")


# -- re_compat integration ---------------------------------------------------


def test_re_compat_findall_group_semantics():
    text = "a=1 bb=22"
    assert re_compat.findall(r"(\w+)=(\d+)", text) == re.findall(
        r"(\w+)=(\d+)", text
    )
    assert re_compat.findall(r"(\w+)=\d+", text) == re.findall(
        r"(\w+)=\d+", text
    )
    assert re_compat.findall(r"\w+=\d+", text) == re.findall(r"\w+=\d+", text)


def test_re_compat_split_with_groups():
    for pat, s in [(r"(,)", "a,b,c"), (r"([,;])", "a,b;c"),
                   (r"(\s)(\s)?", "a  b c")]:
        assert re_compat.split(pat, s) == re.split(pat, s)


def test_re_compat_sub_backrefs():
    cases = [
        (r"(\w+)@(\w+)", r"\2 at \1", "bob@host and eve@door"),
        (r"(?P<a>\d+)-(?P<b>\d+)", r"\g<b>:\g<a>", "1-2, 30-40"),
        (r"(a)(b)?", r"[\1|\2]", "ab a"),  # unmatched group -> empty
        (r"x", r"\\n\n", "axa"),
        (r"(.)", r"\g<0>\g<0>", "ab"),
    ]
    for pat, repl, s in cases:
        assert re_compat.sub(pat, repl, s) == re.sub(pat, repl, s)
    assert re_compat.subn(r"(\d)", r"<\1>", "a1b2")[1] == 2


def test_re_compat_sub_bad_template():
    with pytest.raises(re_compat.error):
        re_compat.sub(r"(a)", r"\q", "a")
    with pytest.raises(re_compat.error):
        re_compat.sub(r"(a)", "bad\\", "a")


def test_re_compat_match_objects_from_finditer():
    ms = list(re_compat.finditer(r"(?P<n>\d+)", "a1b22"))
    assert [m.group("n") for m in ms] == [b"1", b"22"]  # byte-oriented Match


def test_re_compat_text_mode_groups():
    m = re_compat.search(r"(?P<w>\w+)!", "hello world!")
    assert m.group("w") == b"world"  # Match is byte-oriented by design


def test_re_compat_escape_roundtrip():
    for s in ["a.b*c", "(x)|[y]{2}", "plain", "a\\b$^"]:
        assert re_compat.fullmatch(re_compat.escape(s), s) is not None
    raw = b"a.b(c)\\d"
    assert re_compat.fullmatch(re_compat.escape(raw), raw) is not None
    assert re_compat.escape("a.b") == re.escape("a.b")


def test_re_compat_dotall_flag():
    assert re_compat.search(r"a.b", "a\nb") is None
    assert re_compat.search(r"a.b", "a\nb", re_compat.DOTALL).span() == (0, 3)
    assert re_compat.search(r"(?s)a.b", "a\nb").span() == (0, 3)
    # combined prefix flags
    assert re_compat.search(r"(?is)A.B", "a\nb").span() == (0, 3)


def test_pattern_groups_groupindex():
    p = re_compat.compile(r"(?P<a>x)(y)(?P<b>z)")
    assert p.groups == 3
    assert p.groupindex == {"a": 1, "b": 3}
    assert re_compat.compile(r"xyz").groups == 0


def test_match_expand():
    m = re_compat.search(r"(?P<k>\w+)=(\d+)", "n=42")
    assert m.expand(rb"\g<k>:\2") == b"n:42"
    assert m.expand(rb"\1/\g<0>") == b"n/n=42"


def test_flag_values_match_re():
    assert re_compat.IGNORECASE == re.IGNORECASE
    assert re_compat.DOTALL == re.DOTALL


# -- \b / \B word boundaries (host Pike-VM path) -----------------------------

BOUNDARY_CASES = [
    (r"\bword\b", b"a word, wordy words word"),
    (r"\b\w+\b", b"hi there, world_9! x"),
    (r"\Bar\b", b"bar car ar"),
    (r"\bfoo", b"food foo bar-foo"),
    (r"foo\b", b"food foo bar-foo"),   # trailing \b: accept needs NEXT byte
    (r"(?P<w>\b[a-z]+\b)", b"Big cat, Small dog"),
    (r"\b(\w)(\w*)\b", b"to be or not"),
    (r"\B", b"abc d"),                 # zero-width non-boundary positions
    (r"\b", b""),
    (r"(?i)\bWORD\b", b"word sword word."),
]


@pytest.mark.parametrize("pat,data", BOUNDARY_CASES)
def test_word_boundary_vs_re(pat, data):
    from regex_fpga_tpu.api import HostRegexMatcher

    m = compile_regex(pat)
    assert isinstance(m, HostRegexMatcher)
    flags = re.IGNORECASE if pat.startswith("(?i)") else 0
    ref = re.compile(pat.removeprefix("(?i)").encode(), flags)
    assert m.finditer(data) == [x.span() for x in ref.finditer(data)]
    m1, m2 = m.search(data), ref.search(data)
    assert (m1 is None) == (m2 is None)
    if m1 is not None:
        assert m1.span() == m2.span() and m1.groups() == m2.groups()
    f1, f2 = m.match(data), ref.match(data)
    assert (f1 is None) == (f2 is None)
    if f1 is not None:
        assert f1.span() == f2.span()


def test_word_boundary_fullmatch_sub_split():
    m = compile_regex(r"\b\w+\b")
    assert m.fullmatch(b"word") is not None
    assert m.fullmatch(b"wo rd") is None
    assert m.sub(b"X", b"a bb c") == b"X X X"
    assert re_compat.sub(r"\bcat\b", "dog", "cat catalog cat") == re.sub(
        r"\bcat\b", "dog", "cat catalog cat"
    )
    assert re_compat.split(r"\b", "ab cd") == re.split(r"\b", "ab cd")


def test_word_boundary_device_paths_raise():
    m = compile_regex(r"\bx\b")
    for fn in (m.scan, m.count, m.findall_ends):
        with pytest.raises(NotImplementedError):
            fn(b"x")
    with pytest.raises(NotImplementedError):
        m.stream_scanner()


def test_backspace_in_class_is_not_boundary():
    # [\b] is a literal backspace byte, as in Python re
    m = compile_regex(r"a[\b]c")
    assert m.fullmatch(b"a\x08c") is not None
    assert re.fullmatch(rb"a[\b]c", b"a\x08c") is not None


def test_boundary_context_outside_span():
    # assertions must see buffer context OUTSIDE the matched span
    m = compile_regex(r"\bfoo")
    assert m.finditer(b"xfoo foo") == [(5, 8)]  # 'xfoo' has no boundary
    prog = CaptureProgram(rb"\bfoo")
    assert prog.longest_end_at(b"xfoo foo", 1) == -1
    assert prog.longest_end_at(b"xfoo foo", 5) == 8


# -- non-greedy quantifiers (leftmost-first host mode) ----------------------

def test_lazy_quantifiers_match_python_re():
    import re as pyre

    from regex_fpga_tpu.api import HostRegexMatcher, compile_regex

    cases = [
        (rb"<.+?>", b"<a><bb><ccc> <> <dd>"),
        (rb"<.+>", b"<a><bb><ccc>"),          # greedy control (device route)
        (rb"a*?b", b"aaab aab b xb"),
        (rb"a+?", b"aaaa"),
        (rb"x??y", b"xy y xxy"),
        (rb"[ab]{1,3}?c", b"aababc abc bc"),
        (rb"(a+?)(a*)", b"aaaa baa"),
        (rb"\d+?\.", b"123. 4."),
    ]
    for pat, text in cases:
        m = compile_regex(pat)
        got = m.finditer(text)
        want = [mm.span() for mm in pyre.finditer(pat, text)]
        assert got == want, (pat, got, want)
        # groups + sub agree too
        gm, wm = m.search(text), pyre.search(pat, text)
        if wm is None:
            assert gm is None, pat
        else:
            assert (gm.span(), gm.groups()) == (wm.span(), wm.groups()), pat
        assert m.sub(b"#", text) == pyre.sub(pat, b"#", text), pat


def test_lazy_with_anchors_and_boundaries():
    import re as pyre

    from regex_fpga_tpu.api import compile_regex

    # whole-pattern anchors now honored on the host route
    m = compile_regex(rb"^a+?b")
    assert m.finditer(b"aab xaab") == [(0, 3)]
    assert m.match(b"aaab").span() == (0, 4)
    assert m.search(b"xaab") is None
    m = compile_regex(rb"a+?$")
    assert m.finditer(b"baa") == [(1, 3)]
    assert m.finditer(b"aa b") == []
    # \b + anchored host patterns honor the anchor too (regression)
    m = compile_regex(rb"^\bword\b")
    assert m.finditer(b"word word") == [(0, 4)]
    # lazy + \b mixes: PCRE-first mode, equals Python
    pat, text = rb"\ba+?\b", b"aa a aaa"
    m = compile_regex(pat)
    assert m.finditer(text) == [mm.span() for mm in pyre.finditer(pat, text)]


def test_lazy_empty_matches_like_re():
    import re as pyre

    from regex_fpga_tpu.api import compile_regex

    for pat, text in [(rb"a*?", b"aa"), (rb"x??", b"xy")]:
        m = compile_regex(pat)
        got = m.finditer(text)
        want = [mm.span() for mm in pyre.finditer(pat, text)]
        assert got == want, (pat, got, want)


@pytest.mark.parametrize("seed", range(12))
def test_lazy_fuzz_vs_python_re(seed):
    """Generated patterns with non-greedy quantifiers (alternation allowed:
    leftmost-FIRST mode follows textual priority exactly like Python re)."""
    import re as pyre

    import numpy as np

    from regex_fpga_tpu.api import compile_regex

    rng = np.random.default_rng(1000 + seed)

    def gen(depth=0):
        atoms = ["a", "b", "[ab]", "[^b]", "x", "."]
        parts = []
        for _ in range(int(rng.integers(1, 4))):
            a = atoms[int(rng.integers(0, len(atoms)))]
            if depth < 2 and rng.random() < 0.3:
                inner = gen(depth + 1)
                if rng.random() < 0.4:
                    inner += "|" + gen(depth + 1)
                a = "(" + inner + ")"
            q = rng.random()
            if q < 0.2:
                a += "*?"
            elif q < 0.4:
                a += "+?"
            elif q < 0.5:
                a += "??"
            elif q < 0.6:
                a += "{1,2}?"
            elif q < 0.7:
                a += "+"
            parts.append(a)
        return "".join(parts)

    pat = gen()
    if "?" not in pat:
        pat += "x*?"  # force the lazy (host leftmost-first) route
    cre = pyre.compile(pat.encode())
    m = compile_regex(pat.encode())
    alphabet = list(b"abx ")
    for _ in range(8):
        w = bytes(rng.choice(alphabet, size=24).astype(np.uint8))
        want = [mm.span() for mm in cre.finditer(w)]
        got = m.finditer(w)
        assert got == want, (pat, w, got, want)
        gm, wm = m.search(w), cre.search(w)
        if wm is not None:
            assert gm.groups() == wm.groups(), (pat, w)
