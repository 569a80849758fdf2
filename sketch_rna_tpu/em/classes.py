"""Equivalence-class reduction for the EM.

Reads with identical candidate profiles (same transcripts, same match
counts) receive identical E-step posteriors, so the EM can iterate over
DISTINCT profiles weighted by multiplicity instead of over reads — the
classic equivalence-class trick.  This preserves the reference's
per-read math: summing m identical posterior vectors equals m times one
of them, and the per-read denominators don't change.  EM cost then
scales with the number of distinct classes (bounded by the
transcriptome's ambiguity structure), not the read count.

Two-phase, sync-light layout (the phase split keeps every [N, W]-sized
gather/scatter OFF the hot path — grouping cost is one 4-key sort of N
lanes plus O(N) vector work):

  phase 1 (group_candidate_rows_meta): 128-bit row hashes -> sort ->
    run boundaries -> per-class weight, representative row index, and
    the (n_classes, n_wide) scalars, all [N]-shaped.
  phase 2 (build_class_tables, static sizes from the one host sync):
    gather the [M_pad, W] class tables from the ORIGINAL rows via the
    representative indices and split them into narrow/wide partitions.

Rows are merged when their 128-bit hashes collide across all four
lanes; for distinct rows that requires a 128-bit collision between
adjacent sort neighbors (probability < N^2 / 2^128 ~ 1e-28 at N=10^6 —
dozens of orders of magnitude below hardware soft-error rates).
Identical rows always hash equal, so classes are never split.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_M1 = jnp.uint32(0x9E3779B1)  # golden-ratio mixing constants
_M2 = jnp.uint32(0x85EBCA77)
_M3 = jnp.uint32(0xC2B2AE3D)
_M4 = jnp.uint32(0x27D4EB2F)


def _mix(h: jnp.ndarray, v: jnp.ndarray, mult: jnp.ndarray) -> jnp.ndarray:
    h = (h ^ v) * mult
    return h ^ (h >> jnp.uint32(15))


@partial(jax.jit, static_argnames=("narrow_width",))
def group_candidate_rows_meta(
    tbl_tid: jnp.ndarray,
    tbl_score: jnp.ndarray,
    narrow_width: int = 8,
    row_weight: jnp.ndarray = None,
):
    """Phase 1: grouping metadata for identical (tid-row, score-row)
    pairs — no [N, W] data movement.

    Args:
      tbl_tid, tbl_score: [N, W] int32 candidate tables (rank-ordered,
        zero-padded) — identical reads produce identical rows.
      narrow_width: class profiles with more than this many candidates
        count into n_wide (for the caller's narrow/wide partition).
      row_weight: optional [N] int32 per-row multiplicities (rows that
        are themselves compacted classes, streaming path); default 1.

    Returns:
      rep_orig: [N] int32 — ORIGINAL row index of class c's
                representative at position c (arbitrary past n_classes).
      weight:   [N] int32 multiplicities (0 past n_classes).
      scalars:  [2] int32 (n_classes, n_wide).
    """
    N, W = tbl_tid.shape
    h1 = jnp.full(N, 0x811C9DC5, jnp.uint32)
    h2 = jnp.full(N, 0x01000193, jnp.uint32)
    h3 = jnp.full(N, 0xDEADBEEF, jnp.uint32)
    h4 = jnp.full(N, 0x9E3779B9, jnp.uint32)
    for c in range(W):
        tv = jax.lax.bitcast_convert_type(tbl_tid[:, c], jnp.uint32)
        sv = jax.lax.bitcast_convert_type(tbl_score[:, c], jnp.uint32)
        h1 = _mix(_mix(h1, tv, _M1), sv, _M2)
        h2 = _mix(_mix(h2, sv, _M3), tv, _M1)
        h3 = _mix(_mix(h3, tv, _M4), sv, _M3)
        h4 = _mix(_mix(h4, sv, _M2), tv, _M4)

    s_h1, s_h2, s_h3, s_h4, s_idx = jax.lax.sort(
        (h1, h2, h3, h4, jnp.arange(N, dtype=jnp.int32)), num_keys=4
    )

    def _prev(x, fill):
        return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])

    same = (
        (s_h1 == _prev(s_h1, 0))
        & (s_h2 == _prev(s_h2, 0))
        & (s_h3 == _prev(s_h3, 1))  # differing fills: row 0 is never "same"
        & (s_h4 == _prev(s_h4, 0))
    )
    new_class = jnp.logical_not(same)
    class_id = jnp.cumsum(new_class.astype(jnp.int32)) - 1  # [N] ascending
    n_classes = class_id[-1] + 1

    rw = (
        jnp.ones(N, jnp.int32)
        if row_weight is None
        else row_weight.astype(jnp.int32)[s_idx]
    )
    weight = jax.ops.segment_sum(
        rw, class_id, num_segments=N, indices_are_sorted=True
    )
    # Any member's original row represents the class (rows identical);
    # last-write-wins scatter of 1-D indices is cheap.
    rep_orig = jnp.zeros(N, jnp.int32).at[class_id].set(s_idx)

    n_cand = jnp.sum(tbl_score > 0, axis=1)  # [N] on original rows
    is_wide = (n_cand[rep_orig] > narrow_width) & (weight > 0)
    n_wide = jnp.sum(is_wide.astype(jnp.int32))
    # jnp.sum/cumsum promote to the default int width under x64; pin the
    # scalars to int32 so carries stay dtype-stable.
    return rep_orig, weight, jnp.stack([n_classes, n_wide]).astype(jnp.int32)


@partial(
    jax.jit, static_argnames=("m_pad", "nw_pad", "narrow_width", "split", "out_width")
)
def build_class_tables(
    tbl_tid: jnp.ndarray,
    tbl_score: jnp.ndarray,
    rep_orig: jnp.ndarray,
    weight: jnp.ndarray,
    n_wide: jnp.ndarray,
    *,
    m_pad: int,
    nw_pad: int,
    narrow_width: int,
    split: bool,
    out_width: int = 0,
):
    """Phase 2: materialize the class tables at static sizes.

    Gathers the [m_pad, W] class profiles from the ORIGINAL tables via
    rep_orig (classes past n_classes carry weight 0 and are inert), and
    when split=True partitions them into a [m_pad, narrow_width] narrow
    table plus a [nw_pad, W] wide table (wide rows first, stable).
    Exact: every class's weight lives in exactly one partition; narrow
    rows truncate only all-zero lanes (profiles are rank-ordered).
    """
    sel = jax.lax.slice_in_dim(rep_orig, 0, m_pad)
    tid_c = tbl_tid[sel]  # [m_pad, W]
    score_c = tbl_score[sel]
    w_c = jax.lax.slice_in_dim(weight, 0, m_pad)
    if not split:
        ow = out_width or tbl_tid.shape[1]
        return ((tid_c[:, :ow], score_c[:, :ow], w_c),)

    n_cand = jnp.sum(score_c > 0, axis=1)
    is_wide = (n_cand > narrow_width) & (w_c > 0)
    order = jnp.argsort(jnp.logical_not(is_wide), stable=True)  # wide first
    t_s = tid_c[order]
    s_s = score_c[order]
    w_s = w_c[order]
    M = m_pad
    wide = (
        jax.lax.slice_in_dim(t_s, 0, nw_pad, axis=0),
        jax.lax.slice_in_dim(s_s, 0, nw_pad, axis=0),
        jnp.where(
            jnp.arange(nw_pad) < n_wide, jax.lax.slice_in_dim(w_s, 0, nw_pad), 0
        ),
    )
    narrow = (
        t_s[:, :narrow_width],
        s_s[:, :narrow_width],
        jnp.where(jnp.arange(M) < n_wide, 0, w_s),
    )
    return (narrow, wide)


@jax.jit
def group_candidate_rows(tbl_tid: jnp.ndarray, tbl_score: jnp.ndarray):
    """Single-call grouping (compatibility/reference form over the
    two-phase API): returns (cls_tid [N, W], cls_score, weight [N],
    n_classes) with class c's profile at row c."""
    rep_orig, weight, scalars = group_candidate_rows_meta(tbl_tid, tbl_score)
    cls_tid = tbl_tid[rep_orig]
    cls_score = tbl_score[rep_orig]
    return cls_tid, cls_score, weight, scalars[0]
