"""Device-mesh helpers.

The framework's two parallel axes (SURVEY.md §2 parallelism inventory):
  "data"  — reads are embarrassingly parallel (every reference per-read
            loop: sparse_chain body, E-step body, assignment body);
  "index" — the k-mer -> postings index is hash-range sharded for large
            transcriptomes (BASELINE config 4); match events are gathered
            across this axis before grouping.

The reference has neither (single thread); these are new, TPU-native
structure.  Collectives ride ICI inside a slice; with
jax.distributed.initialize() the same code spans hosts over DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_factor(n_devices: int, max_index_shards: int = 2) -> Tuple[int, int]:
    """Split n devices into (data, index) axis sizes.

    Data parallelism dominates (reads are the big dimension); the index
    axis doubles only while it stays <= max_index_shards, divides the
    device count, and leaves the data axis at least as large — so e.g.
    16 devices with max_index_shards=4 give (4, 4), and small meshes
    stay data-only.  Pass an explicit mesh (make_mesh) for other
    splits; any (dp, ip) factorization works (tested through (2, 4))."""
    index = 1
    while (
        index * 2 <= max_index_shards
        and n_devices % (index * 2) == 0
        and n_devices // (index * 2) >= index * 2
    ):
        index *= 2
    return n_devices // index, index


def make_mesh(
    n_data: int,
    n_index: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_index
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_data, n_index)
    return Mesh(arr, ("data", "index"))
