"""Engine configuration (SURVEY.md SS5.6 — the reference hard-codes its
parameters in Verilog: ``size_range`` at top.v:8, ``parallel_lane=4`` at
FPGA.v:47, run length at testbench_BLK_Mem.sv:71; here they are one
dataclass)."""

from __future__ import annotations

import dataclasses

__all__ = ["EngineConfig", "DEFAULT_CONFIG"]


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    # NFA engine
    active_bound: int = 128          # max simultaneous NFA states (flags overflow)
    # fast DFA engine
    num_blocks: int = 65536          # parallel chains per chunk
    max_iters: int = 16              # Jacobi fixpoint budget
    min_block_bytes: int = 64        # below NB*this, shrink NB
    # streaming
    chunk_bytes: int = 1 << 26       # 64 MiB device chunks
    # distribution
    blocks_per_shard: int = 8192
    #: host-vs-device engine routing for counting/histogram scans
    #: (``ops/router.py``): "auto" = measured-crossover cost model,
    #: "device"/"host" force one side (tests, rigs without the native lib)
    scan_backend: str = "auto"


DEFAULT_CONFIG = EngineConfig()
