"""Pallas TPU kernel: fused ntHash2 + FracMinHash threshold.

STATUS (round 3): VALIDATED NEGATIVE RESULT — not on the production
path.  Measured in the production quant on a real v5e chip (bench
config, 131k x 150 bp reads, k=31): jnp/XLA path 800.4k reads/s, fused
Pallas kernel 720.1k, unfused Pallas hash + sort dedup 795.8k.  The
windowed-XOR hash is bandwidth-light elementwise code XLA already fuses
into one VMEM pass, and inside the production lax.scan the pallas_call
boundary only blocks surrounding fusion.  The production dispatch branch
(QuantConfig.use_pallas_sketch) was therefore REMOVED; these kernels and
their bit-equality tests remain as the recorded measurement and as the
template for future Pallas work (e.g. an EM posterior accumulator).

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


def _fused_sketch_one_k(codes, lengths, *, k, nk, threshold, cap, cap_pad):
    """hash -> threshold -> ascending-distinct compaction for one k, all
    in registers/VMEM.  Shared by the single-k and multi-k kernels.

    Dedup + compaction run as `cap` min-extraction steps: step s takes
    the row minimum of all kept hashes STRICTLY GREATER than step s-1's
    value.  Equal hashes collapse automatically (set semantics) and the
    output is ascending with the numerically smallest values kept first
    — exactly dedup_select's semantics — with no row sorts and no HBM
    intermediates (the [TB, nk] hash tile never leaves VMEM).

    Returns (out [TB, cap_pad] uint32, drop [TB, 1] int32) where drop
    counts kept LANES past the cap-th distinct value (multiplicity
    included; 0 iff nothing was dropped)."""
    tables = window_tables_u32(k)
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
    pos = jax.lax.broadcasted_iota(jnp.int32, (TB, nk), dimension=1)
    keep = (pos < lengths - (k - 1)) & (h <= jnp.uint32(threshold))
    h = jnp.where(keep, h, jnp.uint32(_SENTINEL))

    # Mosaic has no unsigned reductions; the sign-bit XOR maps uint32
    # order onto int32 order EXACTLY (x ^ 0x80000000 viewed signed), so
    # the min-extraction runs in int32 and the final XOR restores the
    # original bits (sentinel 0xFFFFFFFF <-> INT32_MAX round-trips).
    sign = jnp.int32(-(1 << 31))
    sent_i = jnp.int32((1 << 31) - 1)
    hi = jax.lax.bitcast_convert_type(h, jnp.int32) ^ sign

    outs = []
    prev = None
    for _ in range(cap):
        if prev is None:
            m = jnp.min(hi, axis=1, keepdims=True)
        else:
            m = jnp.min(jnp.where(hi > prev, hi, sent_i), axis=1, keepdims=True)
        outs.append(m)
        prev = m
    if cap_pad > cap:
        outs.append(jnp.full((TB, cap_pad - cap), sent_i, jnp.int32))
    # prev == sentinel (ran dry) makes the drop comparison vacuously
    # false since kept lanes are <= threshold.
    drop = jnp.sum(
        ((hi != sent_i) & (hi > prev)).astype(jnp.int32),
        axis=1,
        keepdims=True,
    )
    out = jax.lax.bitcast_convert_type(
        jnp.concatenate(outs, axis=1) ^ sign, jnp.uint32
    )
    return out, drop


def _fused_sketch_kernel(
    codes_ref,
    lengths_ref,
    out_ref,
    drop_ref,
    *,
    k: int,
    nk: int,
    threshold: int,
    cap: int,
    cap_pad: int,
):
    codes = codes_ref[...].astype(jnp.uint32)
    out, drop = _fused_sketch_one_k(
        codes, lengths_ref[...], k=k, nk=nk, threshold=threshold, cap=cap,
        cap_pad=cap_pad,
    )
    out_ref[...] = out
    drop_ref[...] = drop


# Above this capacity the unrolled min-extraction loop (O(cap * nk) per
# block + cap-times-larger kernel) loses to the two-row-sort path; long-
# read configs (sketch_capacity_for grows with L) dispatch there.
_FUSED_MAX_CAPACITY = 64


def sketch_batch_pallas(
    codes: jnp.ndarray,
    lengths: jnp.ndarray,
    k: int,
    fraction: float,
    capacity: int,
    block_reads: int = 256,
    interpret: bool = False,
):
    """Drop-in replacement for sketch/fracminhash.sketch_batch: the fused
    kernel for short-read capacities, the hash-kernel + sort-dedup
    variant beyond _FUSED_MAX_CAPACITY."""
    if capacity > _FUSED_MAX_CAPACITY:
        return sketch_batch_pallas_unfused(
            codes, lengths, k, fraction, capacity, interpret=interpret
        )
    return _sketch_batch_pallas_fused(
        codes, lengths, k, fraction, capacity, block_reads, interpret
    )


@functools.partial(
    jax.jit, static_argnames=("k", "fraction", "capacity", "block_reads", "interpret")
)
def _sketch_batch_pallas_fused(
    codes: jnp.ndarray,
    lengths: jnp.ndarray,
    k: int,
    fraction: float,
    capacity: int,
    block_reads: int = 256,
    interpret: bool = False,
):
    """Fully fused: ntHash windowed XOR + FracMinHash threshold +
    set-dedup + ascending compaction in ONE Pallas kernel (the two
    full-width dedup row sorts and their [B, nk] HBM round-trips
    disappear).

    Sketch values/mask are bit-identical to sketch_batch.  The overflow
    stat counts dropped kept LANES (duplicates included) rather than
    dropped distinct values — zero in exactly the same cases.
    """
    B, L = codes.shape
    nk = L - k + 1
    if B % block_reads != 0:
        block_reads = B
    threshold = fracminhash_threshold(fraction)
    cap_pad = -(-capacity // 128) * 128  # lane-aligned kernel output
    kernel = functools.partial(
        _fused_sketch_kernel,
        k=k,
        nk=nk,
        threshold=threshold,
        cap=capacity,
        cap_pad=cap_pad,
    )
    out, drop = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, cap_pad), jnp.uint32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        grid=(B // block_reads,),
        in_specs=[
            pl.BlockSpec((block_reads, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_reads, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (block_reads, cap_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((block_reads, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(codes, lengths.astype(jnp.int32).reshape(B, 1))
    hs = jax.lax.slice_in_dim(out, 0, capacity, axis=1)
    return hs, hs != jnp.uint32(_SENTINEL), jnp.sum(drop)


def _fused_sketch_kernel_multik(
    codes_ref,
    lengths_ref,
    *out_refs,
    ks: tuple,
    nks: tuple,
    threshold: int,
    caps: tuple,
    cap_pads: tuple,
):
    """Multi-k variant of _fused_sketch_kernel: one codes load, one
    kernel launch; per k its own windowed XOR + extraction loop (the
    shared _fused_sketch_one_k body).  Output refs are
    (out_k0, drop_k0, out_k1, drop_k1, ...)."""
    codes = codes_ref[...].astype(jnp.uint32)
    lengths = lengths_ref[...]
    for ki, (k, nk, cap, cap_pad) in enumerate(zip(ks, nks, caps, cap_pads)):
        out, drop = _fused_sketch_one_k(
            codes, lengths, k=k, nk=nk, threshold=threshold, cap=cap,
            cap_pad=cap_pad,
        )
        out_refs[2 * ki][...] = out
        out_refs[2 * ki + 1][...] = drop


@functools.partial(
    jax.jit, static_argnames=("ks", "fraction", "caps", "block_reads", "interpret")
)
def sketch_batch_pallas_multik(
    codes: jnp.ndarray,
    lengths: jnp.ndarray,
    ks: tuple,
    fraction: float,
    caps: tuple,
    block_reads: int = 256,
    interpret: bool = False,
):
    """All k's sketches from ONE fused kernel invocation: the [B, L]
    codes tile is loaded into VMEM once and every k's hash + threshold +
    dedup-compaction runs over it in the same pass.  Returns a tuple of
    (hashes, mask, n_overflow) per k, each bit-identical to
    sketch_batch(codes, lengths, k, fraction, cap)."""
    B, L = codes.shape
    if B % block_reads != 0:
        block_reads = B
    threshold = fracminhash_threshold(fraction)
    nks = tuple(L - k + 1 for k in ks)
    cap_pads = tuple(-(-c // 128) * 128 for c in caps)
    kernel = functools.partial(
        _fused_sketch_kernel_multik,
        ks=ks,
        nks=nks,
        threshold=threshold,
        caps=caps,
        cap_pads=cap_pads,
    )
    out_shape = []
    out_specs = []
    for cap_pad in cap_pads:
        out_shape.append(jax.ShapeDtypeStruct((B, cap_pad), jnp.uint32))
        out_shape.append(jax.ShapeDtypeStruct((B, 1), jnp.int32))
        out_specs.append(
            pl.BlockSpec(
                (block_reads, cap_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        )
        out_specs.append(
            pl.BlockSpec((block_reads, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=(B // block_reads,),
        in_specs=[
            pl.BlockSpec((block_reads, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_reads, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(codes, lengths.astype(jnp.int32).reshape(B, 1))
    result = []
    for ki, cap in enumerate(caps):
        hs = jax.lax.slice_in_dim(outs[2 * ki], 0, cap, axis=1)
        result.append((hs, hs != jnp.uint32(_SENTINEL), jnp.sum(outs[2 * ki + 1])))
    return tuple(result)


def sketch_batch_pallas_unfused(
    codes: jnp.ndarray,
    lengths: jnp.ndarray,
    k: int,
    fraction: float,
    capacity: int,
    interpret: bool = False,
):
    """Pallas hash+threshold, sort-based dedup outside — the production
    path for capacities above _FUSED_MAX_CAPACITY (long reads), and the
    cross-check for the fused kernel."""
    hs = nthash_sketch_pallas(codes, lengths, k, fraction, interpret=interpret)
    return dedup_select(hs, capacity)
