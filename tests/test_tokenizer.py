"""Tokenizer pre-split DFA vs re.finditer, including through the fast engine."""

import re

import numpy as np
import jax.numpy as jnp
import pytest

from regex_fpga_tpu.models.tokenizer_dfa import (
    GPT2_PRESPLIT,
    boundaries_from_flags,
    build_tokenizer_dfa,
)
from regex_fpga_tpu.ops import build_dfa_tables
from regex_fpga_tpu.ops.dfa_fast import dfa_scan_fast

GPT2_RE = re.compile(
    rb"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z\x80-\xff]+| ?[0-9]+"
    rb"| ?[^\x00-\x20A-Za-z0-9\x80-\xff]+|[\x00-\x20]+"
)

TEXTS = [
    b"Hello world, it's 2026! GPT-2  pre-split   test... \xc3\xa9t\xc3\xa9 42x",
    b"a",
    b"   leading spaces",
    b"trailing!",
    b"1a2b3c",
    b"don't can't won't",
]


def host_scan(tok, data):
    s, mask = tok.start, []
    for b in data:
        mask.append(bool(tok.accept[s]))
        s = int(tok.table[b, s])
    return np.array(mask, dtype=bool), bool(tok.accept[s])


def pieces_from_starts(data, starts):
    starts = list(starts)
    return [data[a:b] for a, b in zip(starts, starts[1:] + [len(data)])]


@pytest.mark.parametrize("text", TEXTS)
def test_presplit_matches_re(text):
    tok = build_tokenizer_dfa()
    mask, ff = host_scan(tok, text)
    starts = boundaries_from_flags(mask, ff)
    assert pieces_from_starts(text, starts) == [m.group(0) for m in GPT2_RE.finditer(text)]


def test_presplit_through_fast_engine():
    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)
    text = (b"The quick brown fox, it's 1234 times faster!   " * 32)[:1024]
    classes = np.asarray(dt.class_of)[np.frombuffer(text, dtype=np.uint8)]
    res = dfa_scan_fast(dt, jnp.asarray(classes), num_blocks=8, start=tok.start)
    assert bool(res.converged)
    mask_ref, ff = host_scan(tok, text)
    np.testing.assert_array_equal(np.asarray(res.match_mask), mask_ref)
    starts = boundaries_from_flags(
        np.asarray(res.match_mask), bool(tok.accept[int(res.final_state)])
    )
    assert pieces_from_starts(text, list(starts)) == [
        m.group(0) for m in GPT2_RE.finditer(text)
    ]


def test_fallback_unknown_byte():
    # a pattern that cannot start with 'z': z becomes a standalone fallback token
    tok = build_tokenizer_dfa(r"a+|b+")
    mask, ff = host_scan(tok, b"aazbb")
    starts = boundaries_from_flags(mask, ff)
    assert pieces_from_starts(b"aazbb", list(starts)) == [b"aa", b"z", b"bb"]
