"""Ingest/checkpoint utilities and the CLI."""

import numpy as np
import pytest

from regex_fpga_tpu.parallel.ingest import (
    CheckpointStore,
    iter_file_chunks,
    resilient_scan,
    shard_files,
)


def test_iter_file_chunks(tmp_path):
    path = tmp_path / "data.bin"
    data = np.arange(1000, dtype=np.uint8)
    data.tofile(path)
    chunks = list(iter_file_chunks(str(path), 256))
    assert [off for off, _ in chunks] == [0, 256, 512, 768]
    np.testing.assert_array_equal(np.concatenate([c for _, c in chunks]), data)


def test_shard_files(tmp_path):
    paths = []
    for i, size in enumerate([10, 500, 300, 50]):
        p = tmp_path / f"f{i}.bin"
        p.write_bytes(b"x" * size)
        paths.append(str(p))
    s0 = shard_files(paths, 0, 2)
    s1 = shard_files(paths, 1, 2)
    assert sorted(s0 + s1) == sorted(paths)
    assert not set(s0) & set(s1)


def test_resilient_scan_retries_and_checkpoints(tmp_path):
    store = CheckpointStore(str(tmp_path / "ckpt.npz"))
    failures = {"left": 2}

    def scan_chunk(chunk, carry):
        if failures["left"] > 0 and chunk[0] == 100:
            failures["left"] -= 1
            raise RuntimeError("injected fault")
        total = (carry["total"] if carry else 0) + int(chunk.sum())
        return {"total": np.int64(total)}

    data = np.arange(200, dtype=np.uint8)
    chunks = [(0, data[:100]), (100, data[100:])]
    carry = resilient_scan(scan_chunk, chunks, store=store, retry_delay=0.0)
    assert int(carry["total"]) == int(data.sum())
    # resume from checkpoint skips completed chunks
    carry2 = resilient_scan(scan_chunk, chunks, store=store, retry_delay=0.0)
    assert int(carry2["total"]) == int(data.sum())


def test_resilient_scan_persistent_failure():
    def scan_chunk(chunk, carry):
        raise RuntimeError("always fails")

    with pytest.raises(RuntimeError, match="always fails"):
        resilient_scan(
            scan_chunk, [(0, np.zeros(10, np.uint8))], max_retries=1, retry_delay=0.0
        )


def test_cli_grep_and_presplit(tmp_path, capsys):
    from regex_fpga_tpu.__main__ import main

    f = tmp_path / "input.txt"
    f.write_bytes(b"alpha 42 beta 7 gamma")
    assert main(["grep", r"\d+", str(f)]) == 0
    out = capsys.readouterr().out
    assert f"{f}:" in out

    assert main(["presplit", str(f)]) == 0
    out = capsys.readouterr().out
    assert "alpha" in out


def test_cli_scan_mem_trace(tmp_path, capsys, reference_available):
    import os

    from regex_fpga_tpu.__main__ import main
    from regex_fpga_tpu.utils import reference_root

    coe = os.path.join(reference_root(), "Block_Mem/CSR_BlockMem.coe")
    trace = os.path.join(
        reference_root(), "Simulation/input_trace_lo_l-7_filter.mem"
    )
    assert main(["scan", "--coe", coe, trace]) == 0
    out = capsys.readouterr().out
    assert "state 443: 1" in out


def test_cli_compile_rules(tmp_path):
    import subprocess
    import sys

    rules = tmp_path / "rules.txt"
    rules.write_bytes(b"# c\nfoo+\nba[rz]\n")
    corpus = tmp_path / "c.bin"
    corpus.write_bytes(b"foo bar foooo baz")
    out = tmp_path / "r.coe"
    r = subprocess.run(
        [sys.executable, "-m", "regex_fpga_tpu", "compile-rules",
         str(rules), "-o", str(out), "--scan", str(corpus)],
        capture_output=True, text=True, timeout=560,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert out.exists()
    assert "rule 0" in r.stdout and "rule 1" in r.stdout


def test_cli_acgrep(tmp_path, capsys):
    from regex_fpga_tpu.__main__ import main

    f = tmp_path / "input.bin"
    f.write_bytes(b"GET /scripts/CMD.EXE?/c dir HTTP/1.0 admin")
    pf = tmp_path / "pats.txt"
    pf.write_bytes(b"# pats\nadmin\nHTTP\n")
    assert main(["acgrep", "-e", "GET ", "-f", str(pf), str(f)]) == 0
    out = capsys.readouterr().out
    assert f"{f}:GET :1" in out and f"{f}:admin:1" in out
    assert main(["acgrep", "-e", "zzz", str(f)]) == 1


def test_cli_snort(tmp_path, capsys):
    from regex_fpga_tpu.__main__ import main

    rules = tmp_path / "t.rules"
    rules.write_text(
        'alert tcp any any -> any 80 (msg:"cmd.exe access"; '
        'content:"cmd.exe"; nocase; sid:1002;)\n'
        'alert tcp any any -> any 80 (msg:"with pcre"; content:"user="; '
        'pcre:"/user=[0-9]+/"; sid:6000;)\n'
    )
    f = tmp_path / "traffic.bin"
    f.write_bytes(b"GET /scripts/CMD.EXE?/c dir HTTP/1.0 user=99")
    assert main(["snort", str(rules), str(f)]) == 0
    out = capsys.readouterr().out
    assert "sid=1002" in out and "sid=6000" in out
    clean = tmp_path / "clean.bin"
    clean.write_bytes(b"nothing to see")
    assert main(["snort", str(rules), str(clean)]) == 1


def test_prefetch_chunks_preserves_order_and_values(tmp_path):
    from regex_fpga_tpu.parallel.ingest import prefetch_chunks

    path = tmp_path / "data.bin"
    data = np.arange(4096, dtype=np.int64).astype(np.uint8)
    data.tofile(path)
    plain = list(iter_file_chunks(str(path), 512))
    pre = list(prefetch_chunks(iter_file_chunks(str(path), 512),
                               prepare=lambda c: c * 2))
    assert [o for o, _ in pre] == [o for o, _ in plain]
    for (_, a), (_, b) in zip(pre, plain):
        np.testing.assert_array_equal(a, b * 2)


def test_prefetch_chunks_propagates_worker_error():
    from regex_fpga_tpu.parallel.ingest import prefetch_chunks

    def bad_iter():
        yield 0, np.zeros(4, np.uint8)
        raise RuntimeError("ingest failed")

    it = prefetch_chunks(bad_iter())
    next(it)
    with pytest.raises(RuntimeError, match="ingest failed"):
        list(it)


def test_prefetch_overlaps_prepare_with_scan():
    """Ingest/compute overlap: with prepare and scan each sleeping T, the
    prefetched pipeline finishes in ~max-path time, not the serial sum."""
    import time

    from regex_fpga_tpu.parallel.ingest import prefetch_chunks

    n, t = 6, 0.05

    def chunks():
        for i in range(n):
            yield i, np.full(8, i, np.uint8)

    def prepare(c):
        time.sleep(t)
        return c

    def scan_chunk(chunk, carry):
        time.sleep(t)
        s = (carry or {}).get("sum", 0)
        return {"sum": s + int(chunk.sum())}

    t0 = time.perf_counter()
    serial = resilient_scan(scan_chunk,
                            ((o, prepare(c)) for o, c in chunks()))
    t_serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    overlapped = resilient_scan(scan_chunk,
                                prefetch_chunks(chunks(), prepare=prepare))
    t_overlap = time.perf_counter() - t0

    assert overlapped["sum"] == serial["sum"]
    # serial ~ 2nT = 0.6 s; overlapped ~ (n+1)T = 0.35 s; generous margin
    assert t_overlap < t_serial * 0.8, (t_overlap, t_serial)


def test_cli_rgrep(tmp_path, capsys):
    from regex_fpga_tpu.__main__ import main

    hit = tmp_path / "hit.txt"
    hit.write_bytes(b"hello error42 world\nGET /abc HTTP here\n")
    clean = tmp_path / "clean.txt"
    clean.write_bytes(b"totally pristine\n")
    rc = main(["rgrep", "-e", r"error[0-9]+", "-e", r"GET /[a-z]+ HTTP",
               str(hit), str(clean)])
    out = capsys.readouterr().out
    assert rc == 0
    assert f"{hit}:error[0-9]+:1" in out
    assert str(clean) not in out  # prefilter rejected it entirely
    rc = main(["rgrep", "--no-prefilter", "-e", r"zzz[0-9]", str(clean)])
    assert rc == 1  # no matches anywhere


def test_cli_corpus_exact(tmp_path, capsys):
    """CLI `corpus`: chunked dist scan of a file == serial count, incl. the
    non-aligned tail finished by the serial engine, and checkpoint resume."""
    import json

    import jax.numpy as jnp

    from regex_fpga_tpu.__main__ import main as cli_main
    from regex_fpga_tpu import api
    from regex_fpga_tpu.ops import dfa_scan_serial

    data = (b"GET /a.php HTTP/1.1 stuff 12.5 more " * 40000)[: (1 << 20) + 12345]
    f = tmp_path / "corpus.bin"
    f.write_bytes(data)
    rc = cli_main([
        "corpus", r"[0-9]+\.[0-9]+", str(f), "--chunk-mb", "1",
        "--blocks-per-shard", "8",
        "--checkpoint", str(tmp_path / "carry.npz"),
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    # the distributed path actually engaged (main region > 0) and the
    # checkpoint recorded its end; only the tail ran serial
    assert out["final_offset"] >= (1 << 20)
    m = api.compile_regex(rb"[0-9]+\.[0-9]+")
    ser = dfa_scan_serial(
        m.tables, jnp.asarray(np.frombuffer(data, np.uint8)), start=m.start
    )
    assert out["matches"] == int(np.asarray(ser.counts).sum())
    assert out["bytes"] == len(data)


def test_cli_corpus_host_pattern_refused(capsys, tmp_path):
    from regex_fpga_tpu.__main__ import main as cli_main

    f = tmp_path / "x.bin"
    f.write_bytes(b"data")
    assert cli_main(["corpus", r"\bword\b", str(f)]) == 2


def test_cli_corpus_counts_eof_match(tmp_path, capsys):
    """A match completed by the file's last byte must be counted (same
    include_final_match rule as grep -c; review r3-2 found corpus dropped
    it on both the dist path and the serial tail)."""
    import json

    from regex_fpga_tpu.__main__ import main as cli_main
    from regex_fpga_tpu import api

    data = b"x" * 4099 + b"price 12.5"
    f = tmp_path / "eof.bin"
    f.write_bytes(data)
    rc = cli_main(["corpus", r"[0-9]+\.[0-9]+", str(f), "--chunk-mb", "1"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    m = api.compile_regex(rb"[0-9]+\.[0-9]+")
    n = m.count(data)
    assert n > 0  # only visible via the EOF accept of the final state
    assert out["matches"] == n


def test_cli_gen_corpus(tmp_path, capsys):
    from regex_fpga_tpu.__main__ import main

    rules = tmp_path / "c.rules"
    assert main(["gen-corpus", "snort", str(rules), "-n", "50"]) == 0
    from regex_fpga_tpu.models.snort import parse_snort_rules

    assert len(parse_snort_rules(rules.read_text())) == 50
    d = tmp_path / "pats"
    assert main(["gen-corpus", "l7", str(d), "-n", "12"]) == 0
    from regex_fpga_tpu.models.l7 import load_l7_dir

    assert len(load_l7_dir(str(d))) == 12
