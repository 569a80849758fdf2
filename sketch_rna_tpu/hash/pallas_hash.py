"""Pallas TPU kernel: fused ntHash2 + FracMinHash threshold.

The innermost quant kernel (SURVEY.md §3.3: "the kernel the TPU build
turns into a Pallas primitive: per-base rolling-hash update + predicated
emit, batched over thousands of reads").  One grid step processes a
block of reads entirely in VMEM:

  - the windowed-XOR ntHash form (hash/nthash.py) evaluated with the
    k x 4 host-precomputed rotated-seed constants embedded in the
    kernel — per window offset j: two bit-selects + one XOR on the
    [TB, nk] tile, all VPU, no gathers, no scan,
  - the FracMinHash keep-predicate and the read-length mask fused into
    the same pass: discarded positions emit the sentinel 0xFFFFFFFF, so
    downstream dedup starts directly from the kernel output.

Correctness is pinned to the jnp reference path by tests (interpret mode
on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sketch_rna_tpu.hash.nthash import window_tables_u32
from sketch_rna_tpu.sketch.fracminhash import dedup_select, fracminhash_threshold

_SENTINEL = 0xFFFFFFFF


def _hash_kernel(codes_ref, lengths_ref, out_ref, *, k: int, nk: int, threshold: int):
    tables = window_tables_u32(k)  # host numpy, baked in as constants
    codes = codes_ref[...].astype(jnp.uint32)
    TB = codes.shape[0]
    h = jnp.zeros((TB, nk), dtype=jnp.uint32)
    for j in range(k):
        c = codes[:, j : j + nk]
        b0 = (c & jnp.uint32(1)).astype(jnp.bool_)
        b1 = (c >> jnp.uint32(1)).astype(jnp.bool_)
        t0, t1, t2, t3 = (jnp.uint32(int(tables[j, b])) for b in range(4))
        lo = jnp.where(b0, t1, t0)
        hi = jnp.where(b0, t3, t2)
        h = h ^ jnp.where(b1, hi, lo)
    lengths = lengths_ref[...]  # [TB, 1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (TB, nk), dimension=1)
    keep = (pos < lengths - (k - 1)) & (h <= jnp.uint32(threshold))
    out_ref[...] = jnp.where(keep, h, jnp.uint32(_SENTINEL))


@functools.partial(
    jax.jit, static_argnames=("k", "fraction", "block_reads", "interpret")
)
def nthash_sketch_pallas(
    codes: jnp.ndarray,  # [B, L] uint8
    lengths: jnp.ndarray,  # [B] int32
    k: int,
    fraction: float,
    block_reads: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, L-k+1] uint32: kept-hash values, sentinel 0xFFFFFFFF elsewhere."""
    B, L = codes.shape
    nk = L - k + 1
    if B % block_reads != 0:
        block_reads = B  # degenerate small batches: single block
    threshold = fracminhash_threshold(fraction)
    grid = (B // block_reads,)
    kernel = functools.partial(_hash_kernel, k=k, nk=nk, threshold=threshold)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, nk), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_reads, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_reads, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_reads, nk), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(codes, lengths.astype(jnp.int32).reshape(B, 1))


def sketch_batch_pallas(
    codes: jnp.ndarray,
    lengths: jnp.ndarray,
    k: int,
    fraction: float,
    capacity: int,
    interpret: bool = False,
):
    """Drop-in replacement for sketch/fracminhash.sketch_batch with the
    hash+threshold stage as a Pallas kernel; dedup stays as the two row
    sorts (XLA's row sort is already near-optimal)."""
    hs = nthash_sketch_pallas(codes, lengths, k, fraction, interpret=interpret)
    return dedup_select(hs, capacity)
