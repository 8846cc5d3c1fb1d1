"""Community-scale Snort front-end validation (r4 verdict item 2).

The environment is offline, so the corpus is the faithful-scale synthetic
stand-in from ``models/snort_corpus.py`` (~3,000 rules mirroring the
Snort 2.9 community ruleset's shape distribution — the scale the
reference's own ``CSR_BlockMem_snort_16.coe`` derives from).  These tests
pin what the 30-rule sample could not: parser hit rate, build cost
sanity, AC prefilter size, enforcement-coverage percentages, and
end-to-end alert recall on traffic-like payloads.
"""

import numpy as np
import pytest

from regex_fpga_tpu.api import compile_snort
from regex_fpga_tpu.models.snort import parse_snort_rules
from regex_fpga_tpu.models.snort_corpus import (
    DEFAULT_N_RULES,
    gen_community_rules,
    gen_traffic,
)


@pytest.fixture(scope="module")
def corpus_text():
    return gen_community_rules()


@pytest.fixture(scope="module")
def matcher(corpus_text):
    return compile_snort(corpus_text)


def test_parse_rate_full_corpus(corpus_text):
    rules = parse_snort_rules(corpus_text)
    assert len(rules) == DEFAULT_N_RULES  # 100% of rule lines parse
    # sids unique and in the synthetic range
    sids = [r.sid for r in rules]
    assert len(set(sids)) == len(sids)
    # shape distribution sanity: all five families present
    fams = {r.msg.split()[1] for r in rules}
    assert fams == {"http", "chain", "bin", "body", "misc"}


def test_distinct_literal_scale(corpus_text):
    rules = parse_snort_rules(corpus_text)
    lits = {c.pattern for r in rules for c in r.contents}
    assert len(lits) > 1500  # faithful distinct-literal scale, not a pool


def test_prefilter_automata_sizes(matcher):
    m = matcher
    # four automata: raw exact/fold + normalized-uri exact/fold
    assert m._exact is not None and m._fold is not None
    assert m._uri_exact is not None and m._uri_fold is not None
    total_states = (m._exact.num_states + m._fold.num_states
                    + m._uri_exact.num_states + m._uri_fold.num_states)
    # community scale: thousands of trie states (the reference's own
    # snort image is 9,514 states, SURVEY.md SS2.1 #14)
    assert total_states > 8000
    # every automaton stays well within the dense-table budget
    assert total_states < 200_000


def test_enforcement_coverage_at_scale(matcher):
    s = matcher.enforcement_report()["summary"]
    assert s["total"] == DEFAULT_N_RULES
    # >85% of rules fully payload-enforced; the partial remainder is
    # dominated by community-style pcre buffer flags (/U) and stateful
    # options (flowbits/threshold), exactly as a real ruleset would land
    assert s["enforced"] / s["total"] > 0.85
    assert s["partial"] == s["total"] - s["enforced"]
    # flow appears on ~half the corpus and is scope-classified, not
    # silently dropped
    assert s["with_scope_options"] > s["total"] * 0.3
    assert s["pcre_outside_subset"] > 0  # realistic: /U pcres exist


def test_traffic_recall_and_alert_sanity(matcher):
    payloads, planted = gen_traffic()
    rep = matcher.scan(payloads)
    # every planted attack fires its sid
    for idx, sid in planted.items():
        assert sid in [a.sid for a in rep.alerts[idx]], (idx, sid)
    # benign payloads stay quiet: alerts ~= planted, not a flood
    total_alerts = sum(len(a) for a in rep.alerts)
    assert total_alerts <= 3 * len(planted)


def test_encoded_attack_recall_through_normalization(matcher):
    """A planted http_uri attack still fires when the URI is
    percent-encoded (the normalized-buffer prefilter + verify path)."""
    payloads, planted = gen_traffic()
    idx, sid = next(iter(planted.items()))
    raw = payloads[idx]
    # percent-encode every letter of the URI path
    head, _, rest = raw.partition(b" ")
    uri, _, tail = rest.partition(b" ")
    enc = b"".join(b"%%%02X" % b if 65 <= b <= 122 else bytes([b])
                   for b in uri)
    enc_payload = head + b" " + enc + b" " + tail
    rep = matcher.scan([enc_payload])
    assert sid in [a.sid for a in rep.alerts[0]]


def test_scan_cost_scales(matcher):
    """Per-payload scan cost stays bounded at ruleset scale (the
    unbatched/ungated r5 starting point measured 22 ms/payload; the
    batched prefilter + vectorized gate run at ~0.7 ms)."""
    import time

    payloads, _ = gen_traffic(n_payloads=200)
    matcher.scan(payloads[:4])  # warm compile/caches
    t0 = time.perf_counter()
    matcher.scan(payloads)
    dt = time.perf_counter() - t0
    assert dt / len(payloads) < 0.01, f"{dt/len(payloads)*1e3:.2f} ms/payload"


def test_ruleset_roundtrip_through_file(tmp_path, corpus_text):
    p = tmp_path / "community.rules"
    p.write_text(corpus_text)
    m = compile_snort(str(p))
    assert m.num_rules == DEFAULT_N_RULES
