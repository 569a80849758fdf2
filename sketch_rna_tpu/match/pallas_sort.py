"""Experimental Pallas row-sort kernel (bitonic network over lanes).

The event-grouping row sort ([B, W] packed int32 keys, W a power of
two) is one of the two remaining costs in the match step.  XLA's sort is
a generic comparator framework; a bitonic network specialized to int32
lanes can stay entirely in VMEM with roll-based partner exchange:

  for k in 1..log2(W):        # bitonic merge sizes 2^k
    for j in k-1..0:          # partner distance 2^j
      partner(i) = i XOR 2^j  -> expressed as two circular rolls + a
      lane-parity select; keep min on the "ascending" side.

Not yet wired into the pipeline (rowmatch uses jnp.sort); kept as a
validated prototype for the next optimization round.  Correctness is
pinned by tests/test_pallas_sort.py in interpret mode and, on TPU, by
direct comparison with jnp.sort.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bitonic_pass(x, j, k, W):
    """One compare-exchange pass at distance d=2^j within merge size 2^k."""
    d = 1 << j
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    # pltpu.roll requires non-negative shifts; W-d is the circular
    # equivalent of -d.
    partner_hi = pltpu.roll(x, W - d, 1)  # value at lane i+d
    partner_lo = pltpu.roll(x, d, 1)  # value at lane i-d
    # All selects as full-width bitwise masks (Mosaic-friendly: no i1
    # vector truncation).  m_* are 0 or -1 (all ones).
    m_lower = ((lane & d) == 0).astype(jnp.int32) * jnp.int32(-1)
    partner = (partner_hi & m_lower) | (partner_lo & ~m_lower)
    # Ascending iff bit k (merge size) of lane is 0 (standard bitonic).
    m_asc = ((lane & (1 << k)) == 0).astype(jnp.int32) * jnp.int32(-1)
    m_keep_min = (m_asc & m_lower) | (~m_asc & ~m_lower)
    mn = jnp.minimum(x, partner)
    mx = jnp.maximum(x, partner)
    return (mn & m_keep_min) | (mx & ~m_keep_min)


def _sort_kernel(x_ref, o_ref, *, W: int):
    x = x_ref[...]
    log_w = W.bit_length() - 1
    for k in range(1, log_w + 1):
        for j in range(k - 1, -1, -1):
            x = _bitonic_pass(x, j, k, W)
    o_ref[...] = x


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def bitonic_row_sort(x: jnp.ndarray, block_rows: int = 256, interpret: bool = False):
    """Ascending row sort of [B, W] int32, W a power of two."""
    B, W = x.shape
    assert W & (W - 1) == 0, "W must be a power of two"
    if B % block_rows != 0:
        block_rows = B
    kernel = functools.partial(_sort_kernel, W=W)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, W), x.dtype),
        grid=(B // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
