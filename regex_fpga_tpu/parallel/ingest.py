"""Chunked corpus ingest with checkpointed, fault-tolerant scanning.

SURVEY.md SS5.3-5.4: the reference's only recovery primitive is the reset
wire (``Design/FPGA.v:118-153``); here the matcher state between chunks is a
tiny serializable carry (DFA: one state int + counts; NFA: the active list +
counts), so recovery is "reload last carry, rescan from that chunk".  Chunk
scans that raise (device preemption, OOM) are retried; a persistent failure
surfaces after ``max_retries``.

For multi-host runs each host ingests its own file shard (DCN does not see
byte streams, only the small seam/count collectives ride the network —
SURVEY.md SS5.8).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Iterable, Iterator

import numpy as np

__all__ = [
    "iter_file_chunks",
    "shard_files",
    "CheckpointStore",
    "resilient_scan",
    "prefetch_chunks",
]


def prefetch_chunks(
    chunks: Iterable[tuple[int, np.ndarray]],
    prepare: Callable[[np.ndarray], object] | None = None,
    depth: int = 2,
) -> Iterator[tuple[int, object]]:
    """Overlap ingest with compute: a worker thread reads (and ``prepare``s)
    up to ``depth`` chunks ahead while the caller scans the current one —
    the tpu-native analogue of the reference's fetch/compare overlap
    (``Design/FPGA.v:229-242``), applied at the chunk level.

    ``prepare`` runs on the worker thread; the intended use is host-side
    byte-class mapping + ``jnp.asarray`` so the host→device upload of chunk
    k+1 is in flight during the device scan of chunk k (JAX dispatch is
    async, so the caller's scan does not block the worker).  Order is
    preserved; a worker exception re-raises at the consumption point.
    Composes with ``resilient_scan``:

        resilient_scan(scan_chunk, prefetch_chunks(iter_file_chunks(p, n),
                                                   prepare=cls_map))
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    sentinel = object()
    failure: list[BaseException] = []

    def worker():
        try:
            for off, chunk in chunks:
                q.put((off, prepare(chunk) if prepare else chunk))
        except BaseException as e:  # surfaced to the consumer below
            failure.append(e)
        finally:
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            if failure:
                raise failure[0]
            return
        yield item


def iter_file_chunks(
    path: str, chunk_bytes: int, offset: int = 0
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield (offset, uint8 chunk) via mmap — no double buffering in RAM."""
    data = np.memmap(path, dtype=np.uint8, mode="r")
    for off in range(offset, len(data), chunk_bytes):
        yield off, np.asarray(data[off : off + chunk_bytes])


def shard_files(paths: list[str], host_index: int, host_count: int) -> list[str]:
    """Static per-host file sharding (round-robin by size rank)."""
    ranked = sorted(paths, key=lambda p: -os.path.getsize(p))
    return [p for i, p in enumerate(ranked) if i % host_count == host_index]


@dataclasses.dataclass
class CheckpointStore:
    """npz-on-disk checkpoint of a streaming scan carry."""

    path: str

    def save(self, carry: dict) -> None:
        tmp = self.path + ".tmp.npz"  # np.savez keeps names ending in .npz
        np.savez(tmp, **{k: v for k, v in carry.items() if v is not None})
        os.replace(tmp, self.path)

    def load(self) -> dict | None:
        if not os.path.exists(self.path):
            return None
        with np.load(self.path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}


def resilient_scan(
    scan_chunk: Callable[[np.ndarray, dict | None], dict],
    chunks: Iterable[tuple[int, np.ndarray]],
    store: CheckpointStore | None = None,
    max_retries: int = 3,
    retry_delay: float = 1.0,
) -> dict:
    """Run ``scan_chunk(chunk, carry) -> carry`` over chunks with retry +
    checkpointing.  ``carry`` must be a dict of numpy arrays / scalars and
    must fully determine resumption (the SS5.4 property: matcher state is
    O(S))."""
    carry: dict | None = store.load() if store else None
    start_off = int(carry["offset"]) if carry and "offset" in carry else 0
    for off, chunk in chunks:
        if off < start_off:
            continue
        attempt = 0
        while True:
            try:
                carry = scan_chunk(chunk, carry)
                break
            except Exception:
                attempt += 1
                if attempt > max_retries:
                    raise
                time.sleep(retry_delay * attempt)
        carry["offset"] = np.int64(off + len(chunk))
        if store:
            store.save(carry)
    return carry if carry is not None else {}
