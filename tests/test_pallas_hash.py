"""Pallas sketch kernels (interpret mode on CPU) vs the jnp path:
identical sketch values/masks; overflow stats agree on zero/nonzero
(the fused kernel counts dropped lanes, dedup_select counts dropped
distinct values)."""

import numpy as np
import pytest

from sketch_rna_tpu.hash.pallas_hash import (
    sketch_batch_pallas,
    sketch_batch_pallas_unfused,
)
from sketch_rna_tpu.sketch.fracminhash import sketch_batch


@pytest.mark.parametrize("k", [21, 31])
def test_pallas_fused_sketch_matches_jnp(rng, k):
    B, L = 32, 160
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    lengths = rng.integers(k, L + 1, size=B).astype(np.int32)
    cap = 32
    a_h, a_m, a_ov = sketch_batch(codes, lengths, k, 0.05, cap)
    b_h, b_m, b_ov = sketch_batch_pallas(codes, lengths, k, 0.05, cap, interpret=True)
    np.testing.assert_array_equal(np.asarray(a_h), np.asarray(b_h))
    np.testing.assert_array_equal(np.asarray(a_m), np.asarray(b_m))
    assert int(a_ov) == int(b_ov) == 0


@pytest.mark.parametrize("k", [21, 31])
def test_pallas_unfused_sketch_matches_jnp(rng, k):
    B, L = 32, 160
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    lengths = rng.integers(k, L + 1, size=B).astype(np.int32)
    cap = 32
    a_h, a_m, a_ov = sketch_batch(codes, lengths, k, 0.05, cap)
    b_h, b_m, b_ov = sketch_batch_pallas_unfused(
        codes, lengths, k, 0.05, cap, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(a_h), np.asarray(b_h))
    np.testing.assert_array_equal(np.asarray(a_m), np.asarray(b_m))
    assert int(a_ov) == int(b_ov)


def test_pallas_multik_matches_jnp(rng):
    """One multi-k kernel launch == per-k sketch_batch, bit-identical."""
    from sketch_rna_tpu.hash.pallas_hash import sketch_batch_pallas_multik

    B, L = 32, 160
    ks, caps = (21, 31), (24, 24)
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    lengths = rng.integers(31, L + 1, size=B).astype(np.int32)
    got = sketch_batch_pallas_multik(codes, lengths, ks, 0.05, caps, interpret=True)
    for (g_h, g_m, g_ov), k, cap in zip(got, ks, caps):
        a_h, a_m, a_ov = sketch_batch(codes, lengths, k, 0.05, cap)
        np.testing.assert_array_equal(np.asarray(a_h), np.asarray(g_h))
        np.testing.assert_array_equal(np.asarray(a_m), np.asarray(g_m))
        assert int(a_ov) == int(g_ov) == 0


def test_pallas_fused_sketch_overflow(rng):
    """With a tiny capacity the fused kernel must keep the numerically
    smallest distinct hashes (exactly dedup_select) and report a nonzero
    drop count iff the reference path does."""
    k, B, L = 15, 16, 256
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    lengths = np.full(B, L, np.int32)
    # A high fraction keeps ~half of all k-mers so capacity 8 overflows.
    a_h, a_m, a_ov = sketch_batch(codes, lengths, k, 0.5, 8)
    b_h, b_m, b_ov = sketch_batch_pallas(codes, lengths, k, 0.5, 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(a_h), np.asarray(b_h))
    np.testing.assert_array_equal(np.asarray(a_m), np.asarray(b_m))
    assert int(a_ov) > 0 and int(b_ov) > 0


def test_pallas_fused_sketch_duplicates(rng):
    """Repeated k-mers (homopolymer runs + repeated blocks) must collapse
    to one sketch entry, identical to the sort-dedup path."""
    k = 15
    block = rng.integers(0, 4, size=40).astype(np.uint8)
    row = np.concatenate([block, block, block, np.zeros(8, np.uint8)])
    codes = np.tile(row, (4, 1))
    lengths = np.full(4, row.size, np.int32)
    a_h, a_m, a_ov = sketch_batch(codes, lengths, k, 0.3, 32)
    b_h, b_m, b_ov = sketch_batch_pallas(codes, lengths, k, 0.3, 32, interpret=True)
    np.testing.assert_array_equal(np.asarray(a_h), np.asarray(b_h))
    np.testing.assert_array_equal(np.asarray(a_m), np.asarray(b_m))
    assert int(a_ov) == int(b_ov) == 0
