"""Layer-0 tests: COE parse round-trip, CSR split, decoded-ruleset facts."""

import numpy as np
import pytest

from regex_fpga_tpu.models import (
    CsrAutomaton,
    byte_classes,
    from_words,
    load_coe,
    read_coe,
    split_words,
    write_coe,
)
from regex_fpga_tpu.utils import RULESETS, load_ruleset, reference_root


def test_coe_roundtrip(tmp_path):
    words = np.arange(17, dtype=np.uint32) * 0x01010101
    path = str(tmp_path / "x.coe")
    write_coe(path, words)
    np.testing.assert_array_equal(read_coe(path), words)


def test_split_words_synthetic():
    # 3 states: 0 -> {1 on 'a'}, 1 -> {2 on 'b'}, 2 accepting (outdeg 0)
    offsets = [0, 1, 2, 2]
    trans = [(ord("a") << 24) | 1, (ord("b") << 24) | 2]
    words = np.array(offsets + trans, dtype=np.uint32)
    assert split_words(words) == 3
    aut = from_words(words)
    assert aut.num_states == 3
    assert aut.num_transitions == 2
    np.testing.assert_array_equal(aut.accept_mask, [False, False, True])
    chars, targets = aut.edges(0)
    assert chars.tolist() == [ord("a")] and targets.tolist() == [1]


def test_csr_words_roundtrip():
    words = np.array([0, 1, 2, 2, (5 << 24) | 1, (6 << 24) | 2, 0], dtype=np.uint32)
    aut = from_words(words)
    np.testing.assert_array_equal(aut.to_words(), words[:-1])  # pad dropped


@pytest.mark.parametrize(
    "name,states,trans,fanout",
    [("l-7_filter", 2794, 124977, 3), ("snort_16", 9514, 79856, 3)],
)
def test_reference_rulesets_decode(reference_available, name, states, trans, fanout):
    aut = load_ruleset(name)
    assert aut.num_states == states == RULESETS[name][2]
    assert aut.num_transitions == trans
    assert not aut.is_dfa()  # shipped rulesets are true NFAs (SURVEY.md SS0)
    assert aut.max_fanout() == fanout
    # state 0 is the start hub: its out-edges cover all 256 byte values
    chars, _ = aut.edges(0)
    assert len(np.unique(chars)) == 256


@pytest.mark.parametrize("name,classes", [("l-7_filter", 164), ("snort_16", 74)])
def test_byte_classes(reference_available, name, classes):
    aut = load_ruleset(name)
    cls, c = byte_classes(aut)
    assert c == classes
    assert cls.shape == (256,) and cls.max() == c - 1


def test_prefix_automaton(reference_available):
    from regex_fpga_tpu.models import load_coe, nfa_scan, prefix_automaton

    import os

    aut = load_coe(os.path.join(reference_available,
                                "Block_Mem/CSR_BlockMem.coe"))
    sub = prefix_automaton(aut, 600)
    assert sub.num_states == 600
    assert sub.trans_target.max(initial=0) < 600
    # offsets consistent + scannable through the oracle
    assert sub.offsets[-1] == len(sub.trans_target)
    import numpy as np

    counts = nfa_scan(sub, (np.arange(2048) % 256).astype(np.uint8))
    assert counts.shape == (600,)
