"""Host-vs-device engine router (ops/router.py + DfaMatcher wiring):
decision model at the measured calibration points, and bit-exactness of
the host path against the device path."""

import dataclasses

import numpy as np
import pytest

from regex_fpga_tpu import api
from regex_fpga_tpu.ops.router import (
    DEVICE_TILE_BPS,
    HOST_MULTI_BPS,
    HOST_SINGLE_BPS,
    choose_scan_backend,
    device_count_bps,
    host_count_bps,
)
from regex_fpga_tpu.utils.native import native_available


def test_decision_at_measured_points():
    # S=213/C=31 (3 tiles): device wins everywhere
    assert choose_scan_backend(213, 31, 1) == "device"
    assert choose_scan_backend(213, 31, 64) == "device"
    # S=836/C=36 (15 tiles, modeled 0.21 GB/s): host wins everywhere
    assert choose_scan_backend(836, 36, 1) == "host"
    assert choose_scan_backend(836, 36, 64) == "host"
    # S=440/C=34 (8 tiles, modeled 0.40): single-stream device,
    # multi-stream host — the measured overlap region
    assert choose_scan_backend(440, 34, 1) == "device"
    assert choose_scan_backend(440, 34, 8) == "host"
    # small-S (kgram territory) is never host
    assert choose_scan_backend(23, 221, 64) == "device"
    # forcing overrides the model
    assert choose_scan_backend(836, 36, 64, mode="device") == "device"
    assert choose_scan_backend(23, 221, 1, mode="host") == "host"


def test_model_reproduces_calibration():
    # the model's device rates must reproduce the measured sweep shape
    assert device_count_bps(213, 31) == DEVICE_TILE_BPS / 3
    assert device_count_bps(440, 34) == DEVICE_TILE_BPS / 8
    assert device_count_bps(836, 36) == DEVICE_TILE_BPS / 15
    assert host_count_bps(1) == HOST_SINGLE_BPS
    assert host_count_bps(4) == HOST_MULTI_BPS


@pytest.fixture(scope="module")
def big_matcher():
    # the S=836 AC automaton from the bench sweep — above every gate
    words = [w % i for i in range(300)
             for w in (b"error%04d", b"warning%03d", b"GET /path%d HTTP",
                       b"user-agent: bot%d", b"fail%dure")]
    m = api.compile_literals(words[:300])
    assert m.num_states == 836
    return m


def _force(m, backend: str):
    cfg = dataclasses.replace(m.config, scan_backend=backend)
    import copy

    m2 = copy.copy(m)
    m2.config = cfg
    return m2


@pytest.mark.skipif(not native_available(), reason="native lib required")
def test_host_path_bit_exact_vs_device(big_matcher):
    rng = np.random.default_rng(3)
    frag = (b"xxerror0031yy warning099 GET /path7 HTTP fail3ure "
            b"user-agent: bot5 ")
    streams = [
        np.frombuffer((frag * 40)[:n], np.uint8).copy()
        for n in (0, 1, 977, 1024, 1999)
    ] + [rng.integers(0, 256, 4096, dtype=np.uint8).view(np.uint8)]
    host = _force(big_matcher, "host")
    dev = _force(big_matcher, "device")
    rh = host.scan(streams)
    rd = dev.scan(streams)
    assert rh.metrics.engine == "dfa-host-native"
    assert rd.metrics.engine != "dfa-host-native"
    np.testing.assert_array_equal(rh.counts, rd.counts)
    assert rh.total == rd.total
    assert host.count(streams) == dev.count(streams) == rd.total


@pytest.mark.skipif(not native_available(), reason="native lib required")
def test_auto_routes_big_automaton_to_host(big_matcher):
    data = b"..error0031.." * 50
    r = big_matcher.scan(data)
    assert r.metrics.engine == "dfa-host-native"  # S=836: host everywhere
    # positions path routes host too and matches the device mask scan
    rp = big_matcher.scan(data, collect_positions=True)
    rd = _force(big_matcher, "device").scan(data, collect_positions=True)
    np.testing.assert_array_equal(rp.counts, rd.counts)
    np.testing.assert_array_equal(
        rp.match_positions[0], rd.match_positions[0]
    )


def test_small_automata_stay_on_device():
    m = api.compile_regex(rb"[0-9]+\.[0-9]+")
    assert not m._host_backend(1)
    r = m.scan(b"pi=3.14")
    assert r.metrics.engine in ("dfa-fast", "dfa-fast-batch")
