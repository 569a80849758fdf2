"""Bucket table with adversarially clustered keys (deep buckets)."""

import numpy as np
import jax.numpy as jnp

from sketch_rna_tpu.match.bucket_lookup import bucket_lookup, build_bucket_table
from sketch_rna_tpu.match.lookup import lookup_postings


def test_clustered_keys(rng):
    # Many keys packed into a narrow hash range -> deep buckets.
    keys = np.unique(rng.integers(1000, 3000, size=800).astype(np.uint32))
    lens = rng.integers(1, 5, size=keys.size).astype(np.int32)
    row_ptr = np.zeros(keys.size + 1, np.int32)
    np.cumsum(lens, out=row_ptr[1:])
    bt = build_bucket_table(keys, row_ptr)
    assert bt.mb >= 1

    q = np.concatenate([keys[:50], rng.integers(0, 5000, size=50).astype(np.uint32)])
    q = q.reshape(4, 25)
    mask = np.ones((4, 25), bool)
    s_a, l_a = lookup_postings(jnp.asarray(q), jnp.asarray(mask), jnp.asarray(keys), jnp.asarray(row_ptr))
    s_b, l_b = bucket_lookup(jnp.asarray(q), jnp.asarray(mask), jnp.asarray(bt.packed), shift=bt.shift, mb=bt.mb)
    np.testing.assert_array_equal(np.asarray(l_a), np.asarray(l_b))
    la = np.asarray(l_a)
    np.testing.assert_array_equal(np.asarray(s_a)[la > 0], np.asarray(s_b)[la > 0])


def test_max_key_at_threshold_boundary(rng):
    # Keys at the very top of the FracMinHash range.
    keys = np.array([214748360, 214748364], np.uint32)
    row_ptr = np.array([0, 2, 5], np.int32)
    bt = build_bucket_table(keys, row_ptr)
    q = jnp.asarray(np.array([[214748364, 214748360, 7]], np.uint32))
    m = jnp.ones((1, 3), bool)
    s, l = bucket_lookup(q, m, jnp.asarray(bt.packed), shift=bt.shift, mb=bt.mb)
    np.testing.assert_array_equal(np.asarray(l), [[3, 2, 0]])
