"""Bucketed lookup vs sorted-array lookup: identical posting runs."""

import numpy as np
import jax.numpy as jnp

from sketch_rna_tpu.match.bucket_lookup import BucketTable, bucket_lookup, build_bucket_table
from sketch_rna_tpu.match.lookup import lookup_postings


def make_index(rng, n_keys=5000, max_hash=214748364, max_run=9):
    keys = np.unique(rng.integers(0, max_hash + 1, size=n_keys).astype(np.uint32))
    lens = rng.integers(1, max_run, size=keys.size).astype(np.int32)
    row_ptr = np.zeros(keys.size + 1, dtype=np.int32)
    np.cumsum(lens, out=row_ptr[1:])
    return keys, row_ptr


def test_bucket_lookup_matches_sorted(rng):
    keys, row_ptr = make_index(rng)
    bt = build_bucket_table(keys, row_ptr)
    B, S = 64, 16
    # Half real keys, half misses.
    q = np.where(
        rng.random((B, S)) < 0.5,
        keys[rng.integers(0, keys.size, size=(B, S))],
        rng.integers(0, 214748364, size=(B, S)).astype(np.uint32),
    ).astype(np.uint32)
    mask = rng.random((B, S)) < 0.9

    s_a, l_a = lookup_postings(jnp.asarray(q), jnp.asarray(mask), jnp.asarray(keys), jnp.asarray(row_ptr))
    s_b, l_b = bucket_lookup(jnp.asarray(q), jnp.asarray(mask), jnp.asarray(bt.packed), shift=bt.shift, mb=bt.mb)
    np.testing.assert_array_equal(np.asarray(l_a), np.asarray(l_b))
    # starts only comparable where found (length > 0)
    la = np.asarray(l_a)
    np.testing.assert_array_equal(np.asarray(s_a)[la > 0], np.asarray(s_b)[la > 0])


def test_bucket_table_empty():
    keys = np.zeros(0, np.uint32)
    row_ptr = np.zeros(1, np.int32)
    bt = build_bucket_table(keys, row_ptr)
    q = jnp.asarray(np.zeros((4, 8), np.uint32))
    m = jnp.asarray(np.ones((4, 8), bool))
    s, l = bucket_lookup(q, m, jnp.asarray(bt.packed), shift=bt.shift, mb=bt.mb)
    assert int(jnp.sum(l)) == 0


def test_bucket_table_single_key():
    keys = np.array([12345], np.uint32)
    row_ptr = np.array([0, 3], np.int32)
    bt = build_bucket_table(keys, row_ptr)
    q = jnp.asarray(np.array([[12345, 999]], np.uint32))
    m = jnp.asarray(np.ones((1, 2), bool))
    s, l = bucket_lookup(q, m, jnp.asarray(bt.packed), shift=bt.shift, mb=bt.mb)
    np.testing.assert_array_equal(np.asarray(l), [[3, 0]])
    np.testing.assert_array_equal(np.asarray(s)[0, 0], 0)


def test_device_build_matches_host():
    """build_bucket_table_device must produce the exact packed table the
    host builder does (the device build ships only CSR arrays over the
    link; pipeline._device_index relies on their equality)."""
    import jax.numpy as jnp

    from sketch_rna_tpu.match.bucket_lookup import (
        bucket_table_shape,
        build_bucket_table,
        build_bucket_table_device,
    )

    rng = np.random.default_rng(5150)
    for U in (1, 7, 1000, 50000):
        keys = np.unique(rng.integers(0, 1 << 27, size=U, dtype=np.uint32))
        lens = rng.integers(1, 9, size=keys.size).astype(np.int32)
        row_ptr = np.zeros(keys.size + 1, np.int32)
        np.cumsum(lens, out=row_ptr[1:])
        host = build_bucket_table(keys, row_ptr)
        nb, mb, shift = bucket_table_shape(keys)
        assert (nb, mb, shift) == (host.packed.shape[0], host.mb, host.shift)
        dev = build_bucket_table_device(
            jnp.asarray(keys), jnp.asarray(row_ptr), nb=nb, mb=mb, shift=shift
        )
        np.testing.assert_array_equal(np.asarray(dev), host.packed)
