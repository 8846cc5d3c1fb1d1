"""Public API: matchers, streaming checkpoint/resume, engine selection."""

import numpy as np
import pytest

from regex_fpga_tpu import api
from regex_fpga_tpu.models import nfa_scan
from regex_fpga_tpu.utils import load_ruleset, load_trace_pair, reference_root
from regex_fpga_tpu.utils.config import EngineConfig


def test_ruleset_matcher_histogram(reference_available):
    import os

    m = api.compile_ruleset(
        os.path.join(reference_root(), "Block_Mem/CSR_BlockMem.coe")
    )
    lo, hi = load_trace_pair("l-7_filter", limit=30_000)
    rep = m.scan([lo, hi])
    aut = load_ruleset("l-7_filter")
    np.testing.assert_array_equal(rep.counts[0], nfa_scan(aut, lo))
    np.testing.assert_array_equal(rep.counts[1], nfa_scan(aut, hi))
    assert rep.histogram(0) == {443: 1, 1386: 1}
    assert rep.metrics.bytes_scanned == 60_000


def test_stream_scanner_checkpoint_resume(reference_available):
    import os

    m = api.compile_ruleset(
        os.path.join(reference_root(), "Block_Mem/CSR_BlockMem.coe"),
        config=EngineConfig(chunk_bytes=4096),
    )
    lo, _ = load_trace_pair("l-7_filter", limit=12_000)

    sc = m.stream_scanner()
    sc.feed(lo[:5_000])
    ckpt = sc.checkpoint()  # serialize mid-stream
    sc2 = m.stream_scanner(resume=ckpt)
    sc2.feed(lo[5_000:])

    aut = load_ruleset("l-7_filter")
    np.testing.assert_array_equal(sc2.state_counts, nfa_scan(aut, lo))
    assert sc2.offset == 12_000


def test_regex_matcher_end_positions():
    m = api.compile_regex(r"ab+c")
    data = b"zabcz abbbc xx abc"
    ends = m.findall_ends(data)
    # one-char-late timing: match ends at byte AFTER the final matched char
    import re

    expect = [mm.end() for mm in re.finditer(rb"ab+c", data)]
    assert ends.tolist() == expect


def test_regex_matcher_counts_and_chunking():
    m = api.compile_regex(r"xy", config=EngineConfig(chunk_bytes=256, num_blocks=8))
    data = b"ab" * 100 + b"xy" + b"cd" * 200 + b"xy" + b"e" * 77
    rep = m.scan(data)
    assert rep.total == 2
    assert rep.metrics.engine == "dfa-fast"


def test_adversarial_fallback_exact():
    # parity-flavored pattern: (aa)* anchored — Jacobi may not converge on
    # long odd blocks; matcher must still return exact results via fallback
    m = api.compile_regex(r"a(aa)*", anchored=True,
                          config=EngineConfig(num_blocks=64, max_iters=2,
                                              min_block_bytes=1))
    data = b"a" * 4096
    rep = m.scan(data)
    import re

    expect = sum(1 for i in range(1, 4097) if re.fullmatch(rb"a(aa)*", data[:i]))
    # one-char-late: accepts entered by final byte are dropped
    got = rep.total
    assert got in (expect, expect - 1)


def test_tokenizer_matcher_pieces():
    tok = api.compile_tokenizer()
    text = b"Age: 42, it's fine..."
    import re

    expect = [
        m.group(0)
        for m in re.finditer(
            rb"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z\x80-\xff]+| ?[0-9]+"
            rb"| ?[^\x00-\x20A-Za-z0-9\x80-\xff]+|[\x00-\x20]+",
            text,
        )
    ]
    assert tok.pieces(text) == expect


def test_empty_inputs():
    m = api.compile_regex(r"a")
    rep = m.scan(b"")
    assert rep.total == 0
    tok = api.compile_tokenizer()
    assert tok.presplit(b"").tolist() == []


def ref_leftmost_longest(pat, data):
    """O(n^2) POSIX leftmost-longest reference via re.fullmatch."""
    import re

    cre = re.compile(b"(?s)" + pat)
    spans, p, L = [], 0, len(data)
    while p <= L:
        found = False
        for s in range(p, L + 1):
            best = -1
            for e in range(L, s - 1, -1):
                if cre.fullmatch(data, s, e):
                    best = e
                    break
            if best >= 0:
                spans.append((s, best))
                p = max(best, s + 1)
                found = True
                break
        if not found:
            break
    return spans


@pytest.mark.parametrize(
    "pat,data",
    [
        (rb"ab+c", b"zabcz abbbc xx abc"),
        (rb"\d+", b"a1b22c333"),
        (rb"ab|abc", b"xabcx"),  # POSIX longest, not PCRE first-alternative
        (rb"a*", b"baa b"),
        (rb"(xy)+", b"xyxy xy x"),
    ],
)
def test_finditer_leftmost_longest(pat, data):
    m = api.compile_regex(pat, config=EngineConfig(num_blocks=8))
    assert m.finditer(data) == ref_leftmost_longest(pat, data)


def test_finditer_fuzz():
    rng = np.random.default_rng(7)
    for pat in [rb"ab+", rb"a|bc", rb"[ab]{2,3}"]:
        m = api.compile_regex(pat, config=EngineConfig(num_blocks=8))
        for _ in range(40):
            data = bytes(rng.choice(list(b"abcx"), size=int(rng.integers(0, 12))))
            assert m.finditer(data) == ref_leftmost_longest(pat, data), (pat, data)


def test_findall():
    m = api.compile_regex(rb"\d+", config=EngineConfig(num_blocks=8))
    assert m.findall(b"a1b22c333") == [b"1", b"22", b"333"]


def test_count_equals_scan_total(rng):
    """DfaMatcher.count (k-gram fast path + serial tail) == scan().total on
    assorted stream lengths, including non-divisible tails and tiny inputs."""
    from regex_fpga_tpu import api

    m = api.compile_regex(rb"[a-z]+[0-9]|foo|\s\s")
    base = (b"foo bar12 baz9  qux q7 " * 300)
    for n in (0, 1, 5, 63, 1024, len(base), len(base) - 3):
        data = np.frombuffer(base[:n], dtype=np.uint8)
        want = int(m.scan([data]).counts.sum()) if n else 0
        assert m.count([data]) == want, n


def test_count_random_dfa(rng):
    from regex_fpga_tpu import api

    m = api.compile_regex(rb"ab*c|d")
    data = rng.integers(0, 256, size=10_007).astype(np.uint8)
    assert m.count(data) == int(m.scan(data).counts.sum())


def test_count_chunked_carry(rng):
    """count() with a tiny chunk size (forces multi-chunk carries) must
    equal the single-shot scan total."""
    from regex_fpga_tpu import api
    from regex_fpga_tpu.utils.config import EngineConfig

    cfg = EngineConfig(chunk_bytes=512)
    m = api.compile_regex(rb"[a-z]+[0-9]", config=cfg)
    base = (b"foo bar12 baz9 quux7 " * 200)
    data = np.frombuffer(base, dtype=np.uint8)
    assert m.count([data]) == int(m.scan([data]).counts.sum())


def test_dfa_stream_scanner_chunk_exactness():
    import numpy as np

    from regex_fpga_tpu import api

    m = api.compile_regex(rb"ab+c|\d{2}")
    rng = np.random.default_rng(7)
    data = bytes(rng.choice(list(b"abc123 x"), size=5000))
    want = m.scan(data)
    ref_counts = want.counts[0]

    for chunks in ([5000], [1, 4999], [1000] * 5, [7, 293, 4700]):
        sc = m.stream_scanner()
        off = 0
        for n in chunks:
            sc.feed(data[off:off + n])
            off += n
        assert sc.offset == 5000
        np.testing.assert_array_equal(sc.state_counts, ref_counts)
        assert sc.total == want.total


def test_dfa_stream_scanner_checkpoint_resume():
    import numpy as np

    from regex_fpga_tpu import api

    m = api.compile_regex(rb"[a-z]+@[a-z]+")
    data = b"mail me a@b or c@d thanks " * 40
    sc = m.stream_scanner()
    sc.feed(data[:333])
    ck = sc.checkpoint()
    # resume in a FRESH matcher instance (cross-process contract)
    m2 = api.compile_regex(rb"[a-z]+@[a-z]+")
    sc2 = m2.stream_scanner(resume=ck)
    sc2.feed(data[333:])
    np.testing.assert_array_equal(
        sc2.state_counts, m.scan(data).counts[0]
    )


def test_dfa_stream_scanner_eof_accept_nonmutating():
    from regex_fpga_tpu import api

    m = api.compile_regex(rb"ab")
    sc = m.stream_scanner()
    sc.feed(b"zab")          # match ends exactly at stream end
    assert sc.total == 1     # eof accept applied...
    sc.feed(b"ab")           # ...but feeding continues from the raw carry
    assert sc.total == 2


def test_scan_mask_equals_scan_stream_mask(rng):
    """_scan_mask (mask-only readback) == _scan_stream's mask, incl. the
    chunking path and _last_final."""
    from regex_fpga_tpu.api import compile_regex

    m = compile_regex(rb"[0-9]+x?")
    stream = np.frombuffer(
        bytes(rng.integers(32, 127, size=20000, dtype=np.int64)), np.uint8
    )
    _, mask_ref, _, _ = m._scan_stream(stream)
    final_ref = m._last_final
    mask = m._scan_mask(stream)
    np.testing.assert_array_equal(mask, mask_ref)
    assert m._last_final == final_ref


def test_scan_match_positions_equals_mask_nonzero(rng):
    """Device-compacted positions == nonzero of the per-position mask, for
    sparse, dense (cap-overflow mask fallback), and empty streams, across
    the geometric download buckets."""
    from regex_fpga_tpu.api import compile_regex
    from regex_fpga_tpu.utils.config import EngineConfig

    cfg = EngineConfig(chunk_bytes=8192)
    m = compile_regex(rb"ab", config=cfg)
    # sparse: a handful of matches, count < first bucket
    sparse = bytearray(rng.integers(99, 122, size=20000, dtype=np.int64)
                       .astype(np.uint8).tobytes())
    for i in (5, 700, 9000, 19990):
        sparse[i:i + 2] = b"ab"
    sparse = np.frombuffer(bytes(sparse), np.uint8)
    _, mask_ref, _, _ = m._scan_stream(sparse)
    np.testing.assert_array_equal(
        m._scan_match_positions(sparse), np.nonzero(mask_ref)[0]
    )
    # bucket boundary: count > 1024 forces the next 4x bucket
    mid = np.frombuffer(b"ab" * 3000 + b"x" * 14000, np.uint8)
    _, mask_ref, _, _ = m._scan_stream(mid)
    np.testing.assert_array_equal(
        m._scan_match_positions(mid), np.nonzero(mask_ref)[0]
    )
    # dense: every other byte matches -> count > cap, mask fallback
    dense = np.frombuffer(b"ab" * 10000, np.uint8)
    _, mask_ref, _, _ = m._scan_stream(dense)
    np.testing.assert_array_equal(
        m._scan_match_positions(dense), np.nonzero(mask_ref)[0]
    )
    # empty mask
    clean = np.frombuffer(b"x" * 4096, np.uint8)
    assert len(m._scan_match_positions(clean)) == 0


def test_finditer_arrays_equals_finditer(rng):
    from regex_fpga_tpu.api import compile_regex

    for pat in (rb"[a-z]+", rb"\d+x?", rb"a*"):
        m = compile_regex(pat)
        data = bytes(rng.integers(32, 127, size=3000, dtype=np.int64))
        arr = m.finditer_arrays(data)
        assert arr.dtype == np.int64 and arr.ndim == 2 and arr.shape[1] == 2
        assert [tuple(x) for x in arr.tolist()] == m.finditer(data), pat
    m = compile_regex(rb"zz")
    assert m.finditer_arrays(b"no hits").shape == (0, 2)


def test_scan_match_positions_chunked_odd_tail(rng):
    """Chunked position scan with an odd tail chunk: exact across chunk
    boundaries.  (Formerly also exercised the pair-composed mask2 engine,
    pruned in r5 after losing its on-chip A/B at every size —
    docs/ENGINE_GRAVEYARD.md.)"""
    from regex_fpga_tpu.api import compile_regex
    from regex_fpga_tpu.utils.config import EngineConfig

    cfg = EngineConfig(chunk_bytes=4096)
    m = compile_regex(rb"ab+", config=cfg)
    raw = bytearray(rng.integers(99, 122, size=3 * 4096 + 123, dtype=np.int64)
                    .astype(np.uint8).tobytes())
    for i in (10, 4090, 4096, 8191, 12280):  # straddle chunk seams
        raw[i:i + 2] = b"ab"
    stream = np.frombuffer(bytes(raw), np.uint8)
    _, mask_ref, _, _ = m._scan_stream(stream)
    final_ref = m._last_final
    np.testing.assert_array_equal(
        m._scan_match_positions(stream), np.nonzero(mask_ref)[0]
    )
    assert m._last_final == final_ref
