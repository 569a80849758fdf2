"""Equivalence-class reduction for the EM.

Reads with identical candidate profiles (same transcripts, same match
counts) receive identical E-step posteriors, so the EM can iterate over
DISTINCT profiles weighted by multiplicity instead of over reads — the
classic equivalence-class trick.  This preserves the reference's
per-read math exactly: summing m identical posterior vectors equals m
times one of them, and the per-read denominators don't change.  EM cost
then scales with the number of distinct classes (bounded by the
transcriptome's ambiguity structure), not the read count.

Grouping is exact despite using hashes: rows are sorted by a 64-bit row
hash and merged only when a FULL column-wise comparison confirms
equality — a hash collision merely leaves two distinct classes adjacent
(they fail the comparison and stay separate), and identical rows always
hash equal, so correctness never depends on hash quality.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_M1 = jnp.uint32(0x9E3779B1)  # golden-ratio mixing constants
_M2 = jnp.uint32(0x85EBCA77)
_M3 = jnp.uint32(0xC2B2AE3D)


def _mix(h: jnp.ndarray, v: jnp.ndarray, mult: jnp.ndarray) -> jnp.ndarray:
    h = (h ^ v) * mult
    return h ^ (h >> jnp.uint32(15))


@jax.jit
def group_candidate_rows(tbl_tid: jnp.ndarray, tbl_score: jnp.ndarray):
    """Group identical (tid-row, score-row) pairs.

    Args:
      tbl_tid, tbl_score: [N, W] int32 candidate tables (rank-ordered,
        zero-padded) — identical reads produce identical rows.

    Returns:
      cls_tid:   [N, W] int32 — class c's profile at row c (rows past
                 n_classes are arbitrary but weight 0).
      cls_score: [N, W] int32.
      weight:    [N] int32 multiplicities (0 past n_classes).
      n_classes: [] int32.
    """
    N, W = tbl_tid.shape
    h1 = jnp.full(N, 0x811C9DC5, jnp.uint32)
    h2 = jnp.full(N, 0x01000193, jnp.uint32)
    for c in range(W):
        tv = jax.lax.bitcast_convert_type(tbl_tid[:, c], jnp.uint32)
        sv = jax.lax.bitcast_convert_type(tbl_score[:, c], jnp.uint32)
        h1 = _mix(_mix(h1, tv, _M1), sv, _M2)
        h2 = _mix(_mix(h2, sv, _M3), tv, _M1)

    # Two-key sort: (h1, h2) lexicographic with row index payload.
    s_h1, s_h2, s_idx = jax.lax.sort(
        (h1, h2, jnp.arange(N, dtype=jnp.int32)), num_keys=2
    )
    tid_s = tbl_tid[s_idx]  # [N, W] one-time gather
    score_s = tbl_score[s_idx]

    prev_tid = jnp.concatenate([jnp.full((1, W), -1, jnp.int32), tid_s[:-1]])
    prev_score = jnp.concatenate([jnp.full((1, W), -1, jnp.int32), score_s[:-1]])
    same = jnp.all(tid_s == prev_tid, axis=1) & jnp.all(score_s == prev_score, axis=1)
    new_class = jnp.logical_not(same)
    class_id = jnp.cumsum(new_class.astype(jnp.int32)) - 1  # [N] ascending
    n_classes = class_id[-1] + 1

    weight = jax.ops.segment_sum(
        jnp.ones(N, jnp.int32), class_id, num_segments=N, indices_are_sorted=True
    )
    # Representative rows: duplicate scatter-writes carry identical rows.
    cls_tid = jnp.zeros((N, W), jnp.int32).at[class_id].set(tid_s)
    cls_score = jnp.zeros((N, W), jnp.int32).at[class_id].set(score_s)
    return cls_tid, cls_score, weight, n_classes
