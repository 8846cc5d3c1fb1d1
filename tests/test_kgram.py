"""k-gram precomposed throughput-mode scanning."""

import numpy as np
import jax.numpy as jnp
import pytest

from regex_fpga_tpu.models import build_tokenizer_dfa
from regex_fpga_tpu.ops import build_dfa_tables, dfa_scan_serial
from regex_fpga_tpu.ops.kgram import build_kgram, dfa_scan_kgram, map_kgram_classes

from conftest import random_dfa_table


@pytest.mark.parametrize("levels", [1, 2, 3])
def test_kgram_tokenizer_totals_exact(levels):
    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)
    kg = build_kgram(dt, levels=levels)
    assert kg is not None and kg.k == 1 << levels
    text = (b"Hello world, it's 2026! k-gram test 12.5% ... " * 200)[:8192]
    data = np.frombuffer(text, np.uint8)
    ck = map_kgram_classes(kg, data)
    assert len(ck) == len(data) // kg.k
    res = dfa_scan_kgram(
        jnp.asarray(kg.table), jnp.asarray(kg.acc_table), jnp.asarray(ck),
        num_blocks=32, start=tok.start,
    )
    ser = dfa_scan_serial(dt, jnp.asarray(data), start=tok.start)
    assert bool(res.converged)
    assert int(res.total) == int(np.asarray(ser.counts).sum())
    assert int(res.final_state) == int(ser.final_state)


def test_kgram_random_dfa(rng):
    table, accept = random_dfa_table(rng, 12, 3)
    dt = build_dfa_tables(table, accept)
    kg = build_kgram(dt, levels=1, max_classes=200_000)
    stream = rng.integers(0, 256, size=2048).astype(np.uint8)
    ck = map_kgram_classes(kg, stream)
    res = dfa_scan_kgram(
        jnp.asarray(kg.table), jnp.asarray(kg.acc_table), jnp.asarray(ck),
        num_blocks=16,
    )
    ser = dfa_scan_serial(dt, jnp.asarray(stream))
    assert int(res.total) == int(np.asarray(ser.counts).sum())
    assert int(res.final_state) == int(ser.final_state)


def test_kgram_blowup_guard(rng):
    table, accept = random_dfa_table(rng, 64, 4)
    dt = build_dfa_tables(table, accept)
    assert build_kgram(dt, levels=2, max_classes=512) is None


def test_kgram_speculation_fallback_mod3():
    """Mod-3 counter (never synchronizes) with block length not divisible
    by 3: speculation must fail and the Jacobi fallback must still produce
    the exact total."""
    import jax.numpy as jnp

    ptable = np.zeros((256, 3), dtype=np.int32)
    for s in range(3):
        ptable[:, s] = (s + 1) % 3
    pt = build_dfa_tables(ptable, np.array([False, True, False]))
    kg = build_kgram(pt, levels=1)
    stream = np.zeros(4 * 26, np.uint8)  # 26 bytes/block, 26 % 3 != 0
    ck = map_kgram_classes(kg, stream)
    res = dfa_scan_kgram(
        jnp.asarray(kg.table), jnp.asarray(kg.acc_table), jnp.asarray(ck),
        num_blocks=4, max_iters=16,
    )
    assert bool(res.converged)
    assert int(res.iterations) > 1  # speculation could not verify
    from regex_fpga_tpu.ops import dfa_scan_serial
    ser = dfa_scan_serial(pt, jnp.asarray(stream))
    assert int(res.total) == int(np.asarray(ser.counts).sum())


def test_kgram_pallas_matches_jnp(rng):
    """Pallas k-gram chain (interpret mode off-TPU) == jnp engine."""
    import jax.numpy as jnp
    from regex_fpga_tpu.models import build_tokenizer_dfa
    from regex_fpga_tpu.ops import build_dfa_tables

    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)
    kg = build_kgram(dt, levels=1)
    stream = rng.integers(0, 256, size=512 * 128 * 2).astype(np.uint8)
    ck = jnp.asarray(map_kgram_classes(kg, stream))
    tj, aj = jnp.asarray(kg.table), jnp.asarray(kg.acc_table)
    ref = dfa_scan_kgram(tj, aj, ck, num_blocks=512, start=tok.start)
    got = dfa_scan_kgram(tj, aj, ck, num_blocks=512, start=tok.start,
                         use_pallas=True)
    assert int(got.total) == int(ref.total)
    assert int(got.final_state) == int(ref.final_state)
    assert bool(got.converged)


def test_kgram_packed_equals_split(rng):
    """acc_bound packed path (one select, T*mult+A) == split tables."""
    import jax.numpy as jnp

    table, accept = random_dfa_table(rng, 48, 6)
    dt = build_dfa_tables(table, accept)
    kg = build_kgram(dt, levels=1, max_classes=100_000)
    stream = rng.integers(0, 256, size=8 * 64 * 4).astype(np.uint8)
    ck = jnp.asarray(map_kgram_classes(kg, stream))
    tj, aj = jnp.asarray(kg.table), jnp.asarray(kg.acc_table)
    split = dfa_scan_kgram(tj, aj, ck, num_blocks=8)
    packed = dfa_scan_kgram(tj, aj, ck, num_blocks=8, acc_bound=kg.k)
    assert int(packed.total) == int(split.total)
    assert int(packed.final_state) == int(split.final_state)
