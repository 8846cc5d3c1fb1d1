"""Host-vs-device engine router for counting/histogram scans.

The framework has TWO viable engines for a plain count/histogram pass over
a dense DFA (reference behavior: ``Design/FPGA.v`` per-state hit counting):

* **device** (``ops.dfa_fast``): block-parallel Jacobi + one-hot MXU GEMMs.
  Per-step cost is padded 128x128 MXU tiles — ``ceil(C/128) *
  ceil(W/128) + 1`` with table width ``W = S`` (<= 256) or ``2S``
  (byte-split) — so the per-byte rate FALLS as S grows (measured cliff in
  ``ops/kgram.py``/PARITY.md).
* **host** (``native/golden_scan.cpp::dfa_scan_multi``): interleaved
  multi-cursor table walk, both cores via a GIL-released thread split.
  Rate is independent of S while the table stays cache-resident, and
  RIG-STABLE (the 2.6x day swing is the tunneled chip, not the host).

This module extends the measured-crossover discipline that already routes
k-gram vs k=1 (``ops.kgram.choose_scan_level``, gate
``KGRAM_MAX_STATES``) one level up: k=1 device vs native host (r3 verdict
item 3).

Measured calibration (2026-08-20, shared v5e + 2-core host; device rates
are the STATE-CONTRACTED orientation that ``ops.dfa_fast.transposed_step``
picks for realistic sizes — the r4 probe, docs/probe_transposed_r04.json):

=========  ==========  ===================  ==============  ================
point      gemm+sel     device GB/s          device          host GB/s
           tiles        (two r4 sessions)    tile*GB/s       (this host)
=========  ==========  ===================  ==============  ================
S=440 C=36   4+1=5       0.411 - 0.609        2.13-3.05      0.43-0.89 multi
S=836 C=36   7+1=8       0.327 - 0.440        2.66-3.52      0.60-0.85 multi
(single-stream host: 0.82 via the speculative segmented walk — the
device seam trick mirrored host-side; plain single-cursor 0.30-0.39)
=========  ==========  ===================  ==============  ================

Device rates drift 25-30% WITHIN a day and 2.6x across days (CLAUDE.md);
host rates are rig-stable.  ``DEVICE_TILE_BPS`` uses the geometric
day-mean (slow band ~2.7, good-day ~7.0 -> 4.3e9): a router that
calibrates to either extreme systematically mis-routes on the other kind
of day, and in the overlap band (S~400-900 multi-stream) the two engines
are genuinely within the day swing of each other — the bench's
``router_ok`` therefore asserts the choice is never a 2x loser rather
than always the winner (host-load variance adds to the chip day swing:
host_multi measured 0.43-0.89 GB/s across four r4 sessions).  At these constants scans route to the host from
S~830 upward (both single- and multi-stream, now that the speculative
segmented walk lifts single streams to multi-cursor rate); the truly
big DFAs (the reference's own S=2794/9514 rulesets when densified) go
host everywhere.  NOTE the model compares COMPUTE rates
(production TPU hosts feed the chip at DMA speed); on this rig's tunnel
(~6 MB/s upload) API-level device scans are transfer-bound and the host
engine wins end-to-end almost everywhere, which is measured and reported
separately in the bench (``router`` section).
"""

from __future__ import annotations

__all__ = [
    "DEVICE_TILE_BPS",
    "HOST_SINGLE_BPS",
    "HOST_MULTI_BPS",
    "device_count_bps",
    "host_count_bps",
    "choose_scan_backend",
]

#: device per-step cost normalization: measured bytes/s * padded MXU tiles
#: per step (2.1-3.5e9 slow-day band on the transposed route, x2.6
#: good-day); geometric day-mean — see module docstring for why
DEVICE_TILE_BPS = 4.3e9
#: native single-stream walk — now the SPECULATIVE segmented variant
#: (dfa_scan_speculative_native: the device seam trick on the host;
#: measured 0.82 GB/s idle-host vs 0.42 single-cursor at S=836/C=36) —
#: calibrated conservatively for shared-host variance
HOST_SINGLE_BPS = 0.60e9
#: native multi-cursor walk, >= 4 streams, both cores (measured 0.43-0.81
#: GB/s aggregate across sizes; small tables run hotter from L1)
HOST_MULTI_BPS = 0.55e9


def device_count_bps(num_states: int, num_classes: int) -> float:
    """Modeled k=1 counting rate of the fast device engine: padded-tile
    cost per step (GEMM + one select) at the BEST orientation.  The tile
    arithmetic is the engine's own (``dfa_fast.step_orientation_costs``,
    shared with ``transposed_step``), so the router's model cannot drift
    from what the engine emits."""
    from .dfa_fast import step_orientation_costs

    cur, tr, _, _ = step_orientation_costs(num_classes, num_states)
    return DEVICE_TILE_BPS / (min(cur, tr) + 1)


def host_count_bps(n_streams: int) -> float:
    """Modeled native-walker rate: multi-cursor aggregate when streams
    fill the interleave width, else the speculative segmented
    single-stream walk (api._host_scan_counts routes accordingly)."""
    return HOST_MULTI_BPS if n_streams >= 4 else HOST_SINGLE_BPS


def choose_scan_backend(num_states: int, num_classes: int,
                        n_streams: int = 1, mode: str = "auto") -> str:
    """``"device"`` or ``"host"`` for a counting/histogram scan.

    ``mode`` is ``EngineConfig.scan_backend``: "auto" applies the
    measured-crossover model above; "device"/"host" force.  The host
    side additionally requires the native library (the caller falls back
    to device when it is unavailable)."""
    if mode in ("device", "host"):
        return mode
    if device_count_bps(num_states, num_classes) >= host_count_bps(n_streams):
        return "device"
    return "host"
