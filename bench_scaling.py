"""Scaling-efficiency harness (BASELINE config 5).

Measures distributed fast-DFA scan throughput at 1 / 2 / 4 / 8 devices on
whatever mesh is available.  On this rig only virtual CPU devices exist, so
the numbers characterize the harness, not TPU ICI — run on a pod slice for
real scaling (multi-chip hardware is not available here; the sharding paths
are validated on the virtual mesh and dry-run-compiled by the driver).

Prints one JSON line per device count.
"""

import json
import os
import sys
import time

# force the virtual CPU mesh BEFORE any backend initialization unless the
# caller explicitly asked for real devices (REGEX_FPGA_SCALING_REAL=1)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402
import jax  # noqa: E402

if os.environ.get("REGEX_FPGA_SCALING_REAL") != "1":
    # the axon sitecustomize pins jax_platforms; override before first use
    jax.config.update("jax_platforms", "cpu")


def main():
    import jax.numpy as jnp

    from regex_fpga_tpu.models import build_tokenizer_dfa
    from regex_fpga_tpu.ops import build_dfa_tables
    from regex_fpga_tpu.parallel import dfa_scan_fast_dist, make_mesh

    ndev_all = len(jax.devices())
    tok = build_tokenizer_dfa()
    dt = build_dfa_tables(tok.table, tok.accept)
    rng = np.random.default_rng(0)

    results = {}
    for ndev in (1, 2, 4, 8):
        if ndev > ndev_all:
            break
        mesh = make_mesh(1, ndev, devices=jax.devices()[:ndev])
        if jax.devices()[0].platform == "cpu":
            batch, bps_shard, blk = 4, 512, 128
        else:
            # real-chip sizes: small workloads are dispatch/tunnel-latency
            # bound (measured 28 MB/s at 256 KB vs 2+ GB/s at 64 MiB)
            batch, bps_shard, blk = 8, 8192, 1024
        l = ndev * bps_shard * blk  # scale work with devices (weak scaling)
        classes = jnp.asarray(
            rng.integers(0, dt.num_classes, size=(batch, l), dtype=np.int32)
        )
        f = lambda: dfa_scan_fast_dist(
            mesh, dt, classes, blocks_per_shard=bps_shard, start=tok.start
        )
        r = f()
        np.asarray(r[0])
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            r = f()
        np.asarray(r[0])
        dt_s = (time.perf_counter() - t0) / n
        total = batch * l
        results[ndev] = total / dt_s
        eff = results[ndev] / (results[1] * ndev) if 1 in results else 1.0
        print(json.dumps({
            "metric": "dist_scan_bytes_per_sec",
            "devices": ndev,
            "value": round(total / dt_s, 1),
            "unit": "B/s",
            "weak_scaling_efficiency": round(eff, 3),
            "platform": jax.devices()[0].platform,
        }))

    # k-gram counting engine on the same meshes (the headline engine's
    # multi-chip path, parallel/dist_scan.py::dfa_scan_kgram_dist)
    from regex_fpga_tpu.ops.kgram import build_kgram, map_kgram_classes
    from regex_fpga_tpu.parallel import dfa_scan_kgram_dist

    kg = build_kgram(dt, levels=2)
    tj, aj = jnp.asarray(kg.table), jnp.asarray(kg.acc_table)
    kres = {}
    for ndev in (1, 2, 4, 8):
        if ndev > ndev_all:
            break
        mesh = make_mesh(1, ndev, devices=jax.devices()[:ndev])
        if jax.devices()[0].platform == "cpu":
            batch, bps_shard, blk = 4, 128, 128
        else:
            batch, bps_shard, blk = 8, 4096, 1024
        lk = ndev * bps_shard * blk
        raw = rng.integers(0, 256, size=(batch, lk * kg.k), dtype=np.int64)
        ck = jnp.asarray(np.stack([
            map_kgram_classes(kg, r.astype(np.uint8)) for r in raw
        ]))
        f = lambda: dfa_scan_kgram_dist(
            mesh, tj, aj, ck, blocks_per_shard=bps_shard, start=tok.start,
            acc_bound=kg.k,
        )
        np.asarray(f()[0])
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            r = f()
        np.asarray(r[0])
        dt_s = (time.perf_counter() - t0) / n
        total = batch * lk * kg.k
        kres[ndev] = total / dt_s
        eff = kres[ndev] / (kres[1] * ndev) if 1 in kres else 1.0
        print(json.dumps({
            "metric": "dist_kgram_bytes_per_sec",
            "devices": ndev,
            "value": round(total / dt_s, 1),
            "unit": "B/s",
            "weak_scaling_efficiency": round(eff, 3),
            "platform": jax.devices()[0].platform,
        }))


if __name__ == "__main__":
    sys.exit(main())
