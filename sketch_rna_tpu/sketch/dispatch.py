"""Sketch-stage dispatch: one helper every pipeline call site uses.

Chooses between the jnp path (hash fused by XLA + two dedup row sorts),
the fused Pallas kernel, and — for multi-k with short-read capacities —
the multi-k fused kernel that loads the codes tile once and emits every
k's sketch from a single launch.  All paths are bit-identical on sketch
values/masks (tests/test_pallas_hash.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

# Module-scope imports ONLY: this function runs inside jitted bodies, and
# a lazy import during tracing initializes the target module's jnp-level
# constants mid-trace, corrupting jit dispatch (see pipeline.py's import
# invariant note).
from sketch_rna_tpu.hash.pallas_hash import (
    _FUSED_MAX_CAPACITY,
    sketch_batch_pallas,
    sketch_batch_pallas_multik,
)
from sketch_rna_tpu.sketch.fracminhash import sketch_batch


def sketch_all_k(
    codes: jnp.ndarray,
    lengths: jnp.ndarray,
    kmer_lengths: Sequence[int],
    fraction: float,
    caps: Sequence[int],
    use_pallas: bool = False,
) -> Tuple:
    """[(hashes, mask, n_overflow)] per k."""
    if use_pallas:
        if len(kmer_lengths) > 1 and max(caps) <= _FUSED_MAX_CAPACITY:
            return sketch_batch_pallas_multik(
                codes, lengths, tuple(kmer_lengths), fraction, tuple(caps)
            )
        return tuple(
            sketch_batch_pallas(codes, lengths, k, fraction, cap)
            for k, cap in zip(kmer_lengths, caps)
        )
    return tuple(
        sketch_batch(codes, lengths, k, fraction, cap)
        for k, cap in zip(kmer_lengths, caps)
    )
