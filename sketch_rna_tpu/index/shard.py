"""Hash-range sharding of the inverted index across the "index" mesh axis.

Each shard owns a contiguous range of the sorted key space, split at
near-equal posting mass so lookup + expansion work balances.  Shard
arrays are padded to a common width with never-matching sentinel keys
(0xFFFFFFFF exceeds every FracMinHash-kept hash for any fraction < 1),
so a stacked [n_shards, U_pad] layout shards cleanly over the mesh with
PartitionSpec("index", None).

This is the TP/EP analogue of SURVEY.md §2: postings sharded by content
range, reads broadcast their probes, partial match events merge across
shards (the all_gather in dist/quant_sharded.py).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

from sketch_rna_tpu.index.artifact import IndexArtifact

_SENTINEL = np.uint32(0xFFFFFFFF)


def shard_k_index(
    keys: np.ndarray, row_ptr: np.ndarray, postings: np.ndarray, n_shards: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split one k's CSR arrays into [n_shards, *] stacked padded arrays."""
    U = keys.shape[0]
    total = int(row_ptr[-1]) if U else 0
    # Split points at equal posting mass.
    targets = [(total * s) // n_shards for s in range(n_shards + 1)]
    cuts = [int(np.searchsorted(row_ptr, t, side="left")) for t in targets]
    cuts[0], cuts[-1] = 0, U
    cuts = sorted(min(c, U) for c in cuts)

    u_pad = max(max((cuts[s + 1] - cuts[s]) for s in range(n_shards)), 1)
    p_pad = max(
        max((int(row_ptr[cuts[s + 1]] - row_ptr[cuts[s]])) for s in range(n_shards)), 1
    )
    out_keys = np.full((n_shards, u_pad), _SENTINEL, dtype=np.uint32)
    out_rp = np.zeros((n_shards, u_pad + 1), dtype=np.int32)
    out_post = np.zeros((n_shards, p_pad), dtype=np.int32)
    for s in range(n_shards):
        a, b = cuts[s], cuts[s + 1]
        nk = b - a
        p0, p1 = int(row_ptr[a]), int(row_ptr[b])
        out_keys[s, :nk] = keys[a:b]
        out_rp[s, : nk + 1] = row_ptr[a : b + 1] - p0
        out_rp[s, nk + 1 :] = out_rp[s, nk]
        out_post[s, : p1 - p0] = postings[p0:p1]
    return out_keys, out_rp, out_post


def shard_index_arrays(
    idx: IndexArtifact, n_shards: int
) -> Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Per-k stacked shard arrays for the whole artifact."""
    out = {}
    for k in idx.kmer_lengths:
        ki = idx.per_k[k]
        if ki.num_keys == 0:
            out[k] = (
                np.full((n_shards, 1), _SENTINEL, dtype=np.uint32),
                np.zeros((n_shards, 2), dtype=np.int32),
                np.zeros((n_shards, 1), dtype=np.int32),
            )
        else:
            out[k] = shard_k_index(ki.keys, ki.row_ptr, ki.postings, n_shards)
    return out
