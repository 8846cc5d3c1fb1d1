"""Anchors (^ / $) and the (?i) flag — new regex surface vs Python re."""

import re

import numpy as np
import pytest

from regex_fpga_tpu import api
from regex_fpga_tpu.models.regex import RegexError, compile_pattern, parse


def _ends(pattern, data):
    return api.compile_regex(pattern).findall_ends(data).tolist()


def _re_ends(pattern, data):
    return sorted({m.end() for m in re.finditer(pattern, data)})


# -- case-insensitive flag ---------------------------------------------------


def test_ignore_case_literal():
    data = b"abc ABC aBc xbc"
    assert _ends(r"(?i)abc", data) == _re_ends(rb"(?i)abc", data)
    assert api.compile_regex(r"(?i)abc").count(data) == 3


def test_ignore_case_class_and_range():
    data = b"AbC xyz XYZ 123"
    assert _ends(r"(?i)[a-c]{3}", data) == _re_ends(rb"(?i)[a-c]{3}", data)


def test_ignore_case_negated_class():
    # folding applies before negation: [^a-z] must not match uppercase
    m = api.compile_regex(r"(?i)[^a-z]")
    assert m.count(b"aAzZ9") == 1


def test_ignore_case_escaped_literal():
    # \x41 = 'A', folded to match both cases; leftmost-longest span
    assert api.compile_regex(r"(?i)\x41+").finditer(b"aAaA") == [(0, 4)]


# -- start anchor ------------------------------------------------------------


def test_start_anchor_scan_counts():
    m = api.compile_regex(r"^abc")
    assert m.count(b"abcabc") == 1
    assert m.count(b"xabc") == 0
    assert m.count(b"abc") == 1


def test_start_anchor_finditer():
    m = api.compile_regex(r"^a+")
    assert m.finditer(b"aaabaaa") == [(0, 3)]
    assert m.finditer(b"baaa") == []


# -- end anchor --------------------------------------------------------------


def test_end_anchor_scan_counts():
    m = api.compile_regex(r"abc$")
    assert m.count(b"abcabc") == 1
    assert m.count(b"abcx") == 0
    assert m.count(b"abc") == 1


def test_end_anchor_finditer():
    m = api.compile_regex(r"a+$")
    assert m.finditer(b"aaabaaa") == [(4, 7)]
    assert m.finditer(b"aaab") == []


def test_end_anchor_ends_positions():
    data = b"xx abc yy abc"
    assert _ends(r"abc$", data) == _re_ends(rb"abc$", data)


# -- both anchors (full match) ----------------------------------------------


def test_full_anchored():
    m = api.compile_regex(r"^a(b|c)*d$")
    assert m.count(b"abccbd") == 1
    assert m.count(b"abccbdx") == 0
    assert m.count(b"xabccbd") == 0
    assert m.finditer(b"abd") == [(0, 3)]


def test_anchored_group_alternation():
    m = api.compile_regex(r"^(?:foo|ba+r)$")
    assert m.count(b"baaar") == 1
    assert m.count(b"foo") == 1
    assert m.count(b"foobar") == 0


# -- escapes and class membership stay literal -------------------------------


def test_escaped_dollar_and_caret_are_literal():
    assert api.compile_regex(r"a\$").count(b"a$ a$") == 2
    assert api.compile_regex(r"\^a").count(b"^a x") == 1


def test_dollar_inside_class_is_literal():
    assert api.compile_regex(r"[$%]x").count(b"$x %x ax") == 2


def test_anchor_after_escaped_backslash():
    # r"a\\$": literal backslash then end anchor
    m = api.compile_regex("a\\\\$")
    assert m.count(b"a\\") == 1
    assert m.count(b"a\\x") == 0


# -- error cases: anchors are never silently literal -------------------------


@pytest.mark.parametrize("bad", [r"a^b", r"a$b", r"ab|cd$", r"^ab|cd", r"(a^)"])
def test_misplaced_anchor_raises(bad):
    with pytest.raises(RegexError):
        compile_pattern(bad)


def test_export_path_handles_anchors():
    # bare parse() has no anchor semantics to offer
    with pytest.raises(RegexError):
        parse(r"^abc")
    # '$' has no CSR representation (no stream-end concept)
    with pytest.raises(ValueError):
        api.compile_regex_set([r"abc$"])
    # all-anchored rulesets are valid (hub-free start state)
    m = api.compile_regex_set([r"^ab", r"^a\d"])
    assert m.scan(b"a7 ab").rule_counts.tolist() == [[0, 1]]
    # mixed rulesets scan via two CSR partitions (r2) but cannot export
    # a single .coe image
    m = api.compile_regex_set([r"^ab", r"cd"])
    assert m.scan(b"ab then cd!").rule_counts.tolist() == [[1, 1]]
    with pytest.raises(ValueError, match="mixed"):
        m.export_coe("/tmp/na.coe")


# -- compiler internals ------------------------------------------------------


def test_minimize_preserves_eof_accept():
    d1 = compile_pattern(r"abc$", minimize=False, anchored=False)
    d2 = compile_pattern(r"abc$", anchored=False)
    assert d2.num_states <= d1.num_states
    assert not d2.accept.any()          # no mid-stream accepts
    assert d2.eof_accept.any()          # EOF accepts preserved
    m1, m2 = api.DfaMatcher(d1), api.DfaMatcher(d2)
    data = b"zzabc abc"
    assert m1.count(data) == m2.count(data) == 1


def test_anchors_with_scan_report():
    # scan() reports every match END (prefix matches "1", "12", "123");
    # the start anchor keeps "456" out entirely
    rep = api.compile_regex(r"^\d+").scan(b"123 456", collect_positions=True)
    assert rep.total == 3
    assert rep.match_positions[0].tolist() == [1, 2, 3]


# -- device prefilter for host-routed patterns (r2 verdict #6) ---------------


def test_host_prefilter_spans_equal_pure_host_fuzz():
    """HostRegexMatcher's device-prefiltered finditer == the pure-host Pike
    VM walk, on a fuzz suite of boundary/multiline/lazy patterns."""
    import numpy as np

    rng = np.random.default_rng(11)
    pats = [r"\bcat\b", r"\bword", r"ing\b", r"\Bsub\B", r"(?m)^line",
            r"(?m)end$", r"a+?b", r"<.+?>", r"\b\d{2,4}\b"]
    alphabet = b"cat catalog word wording line end sub a b <x> 12 1234 \n. "
    for pat in pats:
        m = api.compile_regex(pat)
        assert isinstance(m, api.HostRegexMatcher)
        for trial in range(4):
            idx = rng.integers(0, len(alphabet), size=600)
            raw = bytes(bytearray(alphabet[i] for i in idx))
            pure = (m._prog.finditer_spans_first(raw)
                    if m._first_mode else m._prog.finditer_spans(raw))
            assert m.finditer(raw) == pure, pat


def test_host_prefilter_engages_and_prunes():
    """The envelope compiles for \\bcat\\b and prunes a clean stream to
    zero candidate starts (no host verification work at all)."""
    m = api.compile_regex(r"\bcat\b")
    assert m._ensure_envelope() is not None
    clean = np.frombuffer(b"dog " * 2048, np.uint8)
    starts = m._candidate_starts(clean)
    assert starts is not None and len(starts) == 0
    assert m.finditer(bytes(clean)) == []
    # candidates appear exactly where "cat" occurs (superset of true starts)
    data = np.frombuffer(b"cat concatenate cat." * 8, np.uint8)
    starts = m._candidate_starts(data)
    true_spans = m.finditer(bytes(data))
    assert all(a in starts.tolist() for a, _ in true_spans)
    import re as pyre
    assert [s for s, _ in true_spans] == [
        mm.start() for mm in pyre.finditer(rb"\bcat\b", bytes(data))
    ]


def test_host_prefilter_nullable_envelope_falls_back():
    """A bare \\b has a nullable envelope (zero pruning power): the matcher
    must decline the prefilter and still produce re-identical spans."""
    import re as pyre

    m = api.compile_regex(r"\bcat\b|\B")
    assert m._ensure_envelope() is None
    raw = b"a cat sat"
    assert m.finditer(raw) == [
        (mm.start(), mm.end()) for mm in pyre.finditer(rb"\bcat\b|\B", raw)
    ]
