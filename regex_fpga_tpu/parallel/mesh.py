"""Mesh construction helpers.

The reference is single-device (its only interconnect is the BRAM read bus,
SURVEY.md SS1); the TPU design scales over a device mesh with two logical
axes:

- ``data``: independent byte streams (the generalization of the reference's
  dual-stream mode) / corpus shards,
- ``seq``: sequence parallelism — blocks of one stream spread over chips,
  with seam composition over ICI (SURVEY.md SS5.7-5.8).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "DATA_AXIS", "SEQ_AXIS"]

DATA_AXIS = "data"
SEQ_AXIS = "seq"


def make_mesh(
    n_data: int | None = None,
    n_seq: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a (data, seq) mesh.  Default: all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_seq
    if n_data * n_seq != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_seq} does not cover {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_seq)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))
