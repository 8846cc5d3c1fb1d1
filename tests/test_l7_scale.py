"""l7-filter-scale ruleset validation (the reference's FIRST image's
source side, mirroring tests/test_snort_scale.py for the second).

``CSR_BlockMem.coe`` (2,794 states) derives from ~120 l7-filter protocol
patterns; this exercises the same pipeline at that scale with the
offline stand-in corpus (``models/l7_corpus.py``): .pat round-trip,
compile_l7, per-protocol attribution recall on planted traffic, the
prefiltered variant's count equality, and reference-format CSR export at
a comparable automaton size.
"""

import numpy as np
import pytest

from regex_fpga_tpu import api
from regex_fpga_tpu.models.l7_corpus import (
    DEFAULT_N_PROTOCOLS,
    gen_l7_patterns,
    gen_l7_traffic,
    write_pat_dir,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("l7pats")
    pats = write_pat_dir(str(d))
    m = api.compile_l7(str(d))
    return d, pats, m


def test_pat_roundtrip_and_compile(corpus):
    _, pats, m = corpus
    assert len(pats) == DEFAULT_N_PROTOCOLS
    assert sorted(m.rule_names) == sorted(p[0] for p in pats)


def test_planted_traffic_attribution(corpus):
    _, pats, m = corpus
    payloads, planted = gen_l7_traffic()
    rep = m.scan(payloads)
    rc = np.asarray(rep.rule_counts)
    name_to_rule = {n: j for j, n in enumerate(m.rule_names)}
    for idx, ridx in planted.items():
        j = name_to_rule[pats[ridx][0]]
        assert rc[idx][j] > 0, (idx, pats[ridx][0])
    # protocol noise floor: random payloads fire (almost) nothing
    noise = sum(int(rc[i].sum()) for i in range(len(payloads))
                if i not in planted)
    assert noise <= 2


def test_prefiltered_counts_equal(corpus):
    d, pats, m = corpus
    mp = api.compile_l7(str(d), prefilter=True)
    payloads, _ = gen_l7_traffic(n_payloads=60)
    a = np.asarray(m.scan(payloads).rule_counts)
    order = [mp.rule_names.index(n) for n in m.rule_names] \
        if hasattr(mp, "rule_names") else None
    b = np.asarray(mp.scan(payloads).rule_counts)
    if order is not None:
        b = b[:, order]
    np.testing.assert_array_equal(a, b)


def test_csr_export_at_reference_scale():
    """The unanchored protocols compile to one reference-convention CSR
    NFA whose size lands in the shipped image's ballpark (the l-7_filter
    .coe is 2,794 states from ~the same pattern count/shape mix)."""
    from regex_fpga_tpu.models.export_csr import regexes_to_csr

    pats = gen_l7_patterns()
    unanchored = [("(?i)" if icase else "") + p
                  for _, p, icase, _ in pats if not p.startswith("^")]
    assert len(unanchored) >= 30
    aut, owner = regexes_to_csr(unanchored)
    assert 500 <= aut.num_states <= 20_000
    # accept = out-degree 0 and everything reachable-by-construction
    assert aut.accept_mask.sum() >= len(unanchored)
    # anchored subset exports too (separate ruleset, no hub)
    anchored = [("(?i)" if icase else "") + p
                for _, p, icase, _ in pats if p.startswith("^")]
    aut2, _ = regexes_to_csr(anchored)
    assert aut2.num_states > 200


def test_oracle_agreement_on_export(tmp_path):
    """Exported .coe reloads and the golden oracle agrees with the
    matcher on planted samples (end-to-end source→image→scan loop)."""
    from regex_fpga_tpu.models import load_coe, nfa_scan
    from regex_fpga_tpu.models.coe import write_coe
    from regex_fpga_tpu.models.export_csr import regexes_to_csr

    pats = [p for p in gen_l7_patterns() if not p[1].startswith("^")][:12]
    aut, owner = regexes_to_csr(
        [("(?i)" if ic else "") + pat for _, pat, ic, _ in pats])
    path = tmp_path / "l7.coe"
    write_coe(str(path), aut.to_words())
    re_aut = load_coe(str(path))
    for ridx, (_, _, _, sample) in enumerate(pats):
        counts = nfa_scan(re_aut, np.frombuffer(sample, np.uint8))
        hit_rules = {int(owner[s]) for s, c in enumerate(counts)
                     if c and owner[s] >= 0}
        assert ridx in hit_rules, (ridx, pats[ridx][:2])
