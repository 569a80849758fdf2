"""FracMinHash sketching: batch implementation vs scalar set oracle."""

import numpy as np
import pytest

from sketch_rna_tpu.sketch.fracminhash import (
    fracminhash_threshold,
    sketch_batch,
    sketch_scalar,
)


def test_threshold_truncating_cast():
    # The reference passes `float sketch_size = 0.05f` into a double
    # parameter (src/main.cpp:43 -> src/sketch.cpp:25-26), so the
    # threshold is uint32(4294967295 * double(0.05f)) == 214748367 —
    # NOT int(4294967295 * 0.05) == 214748364.
    assert fracminhash_threshold(0.05) == 214748367
    assert fracminhash_threshold(0.05) == int(
        np.float64(4294967295) * np.float64(np.float32(0.05))
    )
    assert fracminhash_threshold(0.0) == 0
    with pytest.raises(ValueError):
        fracminhash_threshold(1.0)


@pytest.mark.parametrize("k,fraction", [(31, 0.05), (21, 0.05), (31, 0.3)])
def test_batch_matches_scalar_sets(rng, k, fraction):
    B, L = 16, 150
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    lengths = rng.integers(k, L + 1, size=B).astype(np.int32)
    cap = 64
    hs, mask, overflow = sketch_batch(codes, lengths, k, fraction, cap)
    hs = np.asarray(hs)
    mask = np.asarray(mask)
    assert int(overflow) == 0
    for b in range(B):
        expected = sketch_scalar(codes[b, : lengths[b]], k, fraction)
        got = set(hs[b][mask[b]].tolist())
        assert got == expected
        # Ascending and sentinel-padded.
        row = hs[b][mask[b]]
        assert (np.diff(row.astype(np.int64)) > 0).all()


def test_capacity_overflow_counted(rng):
    # fraction 0.9 on long reads forces far more than capacity=8 hashes.
    B, L, k = 4, 200, 21
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    lengths = np.full(B, L, np.int32)
    hs, mask, overflow = sketch_batch(codes, lengths, k, 0.9, 8)
    hs, mask = np.asarray(hs), np.asarray(mask)
    assert int(overflow) > 0
    # Kept hashes are the smallest distinct ones.
    for b in range(B):
        expected = sorted(sketch_scalar(codes[b], k, 0.9))[:8]
        assert hs[b][mask[b]].tolist() == expected


def test_short_read_no_kmers():
    # Length < k yields an empty sketch via the position mask.
    codes = np.zeros((2, 64), np.uint8)
    lengths = np.array([10, 64], np.int32)
    hs, mask, _ = sketch_batch(codes, lengths, 31, 0.5, 16)
    assert not np.asarray(mask)[0].any()
