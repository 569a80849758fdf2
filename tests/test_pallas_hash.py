"""Pallas hash+threshold kernel (interpret mode on CPU) vs the jnp path:
identical sketches."""

import numpy as np
import pytest

from sketch_rna_tpu.hash.pallas_hash import sketch_batch_pallas
from sketch_rna_tpu.sketch.fracminhash import sketch_batch


@pytest.mark.parametrize("k", [21, 31])
def test_pallas_sketch_matches_jnp(rng, k):
    B, L = 32, 160
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    lengths = rng.integers(k, L + 1, size=B).astype(np.int32)
    cap = 32
    a_h, a_m, a_ov = sketch_batch(codes, lengths, k, 0.05, cap)
    b_h, b_m, b_ov = sketch_batch_pallas(codes, lengths, k, 0.05, cap, interpret=True)
    np.testing.assert_array_equal(np.asarray(a_h), np.asarray(b_h))
    np.testing.assert_array_equal(np.asarray(a_m), np.asarray(b_m))
    assert int(a_ov) == int(b_ov)
