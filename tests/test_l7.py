"""l7-filter .pat interop + anchored CSR ruleset export."""

import numpy as np
import pytest

from regex_fpga_tpu import api
from regex_fpga_tpu.models import nfa_scan, parse_l7_pattern
from regex_fpga_tpu.models.export_csr import regex_to_csr, regexes_to_csr

HTTP_PAT = """\
# HTTP - HyperText Transfer Protocol
# Pattern attributes: great notsofast fast
http
http/(0\\.9|1\\.0|1\\.1) [1-5][0-9][0-9]
userspace flags=REG_NOSUB REG_ICASE
"""

SSH_PAT = """\
# SSH - Secure SHell
ssh
^ssh-[12]\\.[0-9]
"""


def test_parse_pat_with_flags():
    p = parse_l7_pattern(HTTP_PAT)
    assert p.name == "http"
    assert p.ignore_case
    assert p.compile_pattern.startswith("(?i)")


def test_parse_pat_userspace_pattern_override():
    text = "name\nkernelpat\nuserspace pattern=userpat\n"
    p = parse_l7_pattern(text)
    assert p.pattern == "userpat"
    assert not p.ignore_case


def test_parse_pat_rejects_garbage():
    with pytest.raises(ValueError):
        parse_l7_pattern("# only comments\n")


def test_compile_l7_file_and_dir(tmp_path):
    (tmp_path / "http.pat").write_text(HTTP_PAT)
    m = api.compile_l7(str(tmp_path / "http.pat"))
    assert m.rule_names == ["http"]
    rep = m.scan(b"xx HTTP/1.1 200 OK yy http/1.0 404 zz")
    assert rep.rule_counts[0, 0] == 2

    (tmp_path / "ssh.pat").write_text(SSH_PAT)
    # mixed anchored (ssh) + unanchored (http) rules: two CSR partitions
    m = api.compile_l7(str(tmp_path))
    assert sorted(m.rule_names) == ["http", "ssh"]
    i_ssh = m.rule_names.index("ssh")
    rep = m.scan(b"ssh-2.0-OpenSSH hello\n")
    assert rep.rule_counts[0, i_ssh] == 1
    rep = m.scan(b"x ssh-2.0 not at start\n")
    assert rep.rule_counts[0, i_ssh] == 0


def test_anchored_csr_export_semantics():
    # ^-anchored pattern: hub-free state 0, matches only at stream start
    aut = regex_to_csr(r"^ab")
    c1 = nfa_scan(aut, np.frombuffer(b"abxab", dtype=np.uint8))
    assert c1.sum() == 1
    c2 = nfa_scan(aut, np.frombuffer(b"xabab", dtype=np.uint8))
    assert c2.sum() == 0


def test_all_anchored_ruleset_ok():
    aut, owner = regexes_to_csr([r"^ab", r"^cd"])
    counts = nfa_scan(aut, np.frombuffer(b"cdab", dtype=np.uint8))
    # only rule 1 (^cd) fires, at the start
    assert counts[owner == 0].sum() == 0
    assert counts[owner == 1].sum() == 1


def test_dollar_not_exportable():
    with pytest.raises(ValueError):
        regex_to_csr(r"ab$")


def test_compile_l7_prefiltered_equal_counts(tmp_path):
    from regex_fpga_tpu.api import compile_l7

    (tmp_path / "http.pat").write_text("http\nhttp/(0\\.9|1\\.0|1\\.1)\n")
    (tmp_path / "ssh.pat").write_text("ssh\nssh-[12]\\.[0-9]\n")
    plain = compile_l7(str(tmp_path))
    pre = compile_l7(str(tmp_path), prefilter=True)
    assert pre.rule_names == plain.rule_names
    streams = [b"GET / http/1.1\r\n", b"ssh-2.0-OpenSSH\n", b"plain noise"]
    import numpy as np
    np.testing.assert_array_equal(
        pre.scan(streams).rule_counts, plain.scan(streams).rule_counts
    )
