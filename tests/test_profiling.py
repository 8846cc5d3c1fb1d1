"""Profiling/metrics helpers (SURVEY.md SS5.1/SS5.5)."""

import json

import numpy as np

from regex_fpga_tpu.utils.metrics import RunMetrics, Timer
from regex_fpga_tpu.utils.profiling import profile_to, throughput_probe, trace


def test_throughput_probe():
    with throughput_probe(1000) as p:
        x = np.arange(10)
    bps = p.stop(force_result=x)
    assert bps > 0 and p.bytes_per_second == bps


def test_trace_and_profile_to(tmp_path):
    import jax.numpy as jnp

    with profile_to(str(tmp_path / "prof")):
        with trace("scan-step"):
            np.asarray(jnp.arange(8) * 2)
    # a trace directory with at least one artifact was produced
    files = list((tmp_path / "prof").rglob("*"))
    assert files, "profiler produced no artifacts"


def test_run_metrics_json():
    m = RunMetrics(engine="x", bytes_scanned=10, streams=1, matches=2,
                   wall_seconds=0.5)
    d = json.loads(m.to_json()) if hasattr(m, "to_json") else m.__dict__
    assert d["engine"] == "x" and d["matches"] == 2


def test_timer():
    with Timer() as t:
        sum(range(1000))
    assert t.seconds >= 0
