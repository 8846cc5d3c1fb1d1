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


def test_mask2_matches_full_mask(rng):
    """2-byte mask engine == k=1 full scan's per-position mask, exactly."""
    from regex_fpga_tpu.ops.dfa_fast import dfa_scan_fast
    from regex_fpga_tpu.ops.kgram import build_mask2, dfa_scan_mask2

    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)
    m2 = build_mask2(dt)
    assert m2 is not None and m2.k == 2
    text = (b"Hello world, it's 2026! mask2 test 12.5% ... " * 400)[:8192]
    data = np.frombuffer(text, np.uint8)
    ck = map_kgram_classes(m2, data)
    res = dfa_scan_mask2(
        jnp.asarray(m2.table), jnp.asarray(m2.acc_table), jnp.asarray(ck),
        num_blocks=16, start=tok.start,
    )
    ref = dfa_scan_fast(
        dt, jnp.asarray(np.asarray(dt.class_of)[data]), num_blocks=16,
        start=tok.start,
    )
    assert bool(res.converged)
    np.testing.assert_array_equal(
        np.asarray(res.match_mask), np.asarray(ref.match_mask)
    )
    assert int(res.final_state) == int(ref.final_state)


def test_mask2_random_dfa_and_jacobi_fallback(rng):
    from regex_fpga_tpu.ops import dfa_scan_serial
    from regex_fpga_tpu.ops.kgram import build_mask2, dfa_scan_mask2

    table, accept = random_dfa_table(rng, 12, 3)
    dt = build_dfa_tables(table, accept)
    m2 = build_mask2(dt, max_classes=200_000)
    stream = rng.integers(0, 256, size=4096).astype(np.uint8)
    ck = map_kgram_classes(m2, stream)
    res = dfa_scan_mask2(
        jnp.asarray(m2.table), jnp.asarray(m2.acc_table), jnp.asarray(ck),
        num_blocks=8,
    )
    ser = dfa_scan_serial(dt, jnp.asarray(stream))
    np.testing.assert_array_equal(
        np.asarray(res.match_mask), np.asarray(ser.match_mask)
    )
    # mod-3 counter: speculation fails (odd-by-pairs block length), Jacobi
    # fallback must still be exact
    ptable = np.zeros((256, 3), dtype=np.int32)
    for s in range(3):
        ptable[:, s] = (s + 1) % 3
    pt = build_dfa_tables(ptable, np.array([False, True, False]))
    pm2 = build_mask2(pt)
    pstream = np.zeros(4 * 2 * 13, np.uint8)  # 13 pairs/block, 26 % 3 != 0
    pck = map_kgram_classes(pm2, pstream)
    pres = dfa_scan_mask2(
        jnp.asarray(pm2.table), jnp.asarray(pm2.acc_table),
        jnp.asarray(pck), num_blocks=4, max_iters=16,
    )
    assert bool(pres.converged) and int(pres.iterations) > 1
    pser = dfa_scan_serial(pt, jnp.asarray(pstream))
    np.testing.assert_array_equal(
        np.asarray(pres.match_mask), np.asarray(pser.match_mask)
    )
