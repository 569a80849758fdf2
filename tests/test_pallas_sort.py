"""Experimental Pallas bitonic row sort vs jnp.sort (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from sketch_rna_tpu.match.pallas_sort import bitonic_row_sort


@pytest.mark.parametrize("W", [8, 64, 256])
def test_bitonic_matches_jnp_sort(rng, W):
    B = 16
    x = rng.integers(-(2**31), 2**31 - 1, size=(B, W)).astype(np.int32)
    got = np.asarray(bitonic_row_sort(jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, np.sort(x, axis=1))


def test_bitonic_with_duplicates(rng):
    x = rng.integers(0, 4, size=(8, 32)).astype(np.int32)
    got = np.asarray(bitonic_row_sort(jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(got, np.sort(x, axis=1))
