"""Micro-bench: posterior-sum strategies for the EM inner loop.

Compares per-iteration cost of
  a) scatter-add in read layout (current run_em_tables),
  b) scatter-add over tid-sorted pairs (precomputed permutation;
     sorted indices may hit a faster XLA scatter path),
  c) jax.ops.segment_sum with indices_are_sorted=True on sorted pairs.
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sketch_rna_tpu.utils.compilecache import enable_compilation_cache

enable_compilation_cache()

N, W, T = 204800, 16, 50000
# All data generated ON DEVICE (host numpy is too slow here).
key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
# Skewed popularity: square a uniform to concentrate mass.
u = jax.random.uniform(k1, (N, W))
tid = (u * u * T).astype(jnp.int32)
post = jax.random.uniform(k2, (N, W), dtype=jnp.float32)

flat = tid.reshape(-1)
tid_sorted, perm = jax.lax.sort((flat, jnp.arange(N * W, dtype=jnp.int32)), num_keys=1)
jax.block_until_ready((tid, post, tid_sorted, perm))


def timeit(name, fn, *args, n=10):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)


@jax.jit
def f_scatter(post):
    return jnp.zeros(T, jnp.float32).at[tid.reshape(-1)].add(post.reshape(-1))


@jax.jit
def f_scatter_sorted(post):
    ps = post.reshape(-1)[perm]
    return jnp.zeros(T, jnp.float32).at[tid_sorted].add(ps)


@jax.jit
def f_segsum_sorted(post):
    ps = post.reshape(-1)[perm]
    return jax.ops.segment_sum(ps, tid_sorted, num_segments=T, indices_are_sorted=True)


@jax.jit
def f_segsum_unsorted(post):
    return jax.ops.segment_sum(post.reshape(-1), tid.reshape(-1), num_segments=T)


if __name__ == "__main__":
    print(f"N={N} W={W} T={T} lanes={N*W}", flush=True)
    timeit("scatter (read layout)", f_scatter, post)
    timeit("gather-perm + sorted scatter", f_scatter_sorted, post)
    timeit("gather-perm + sorted segsum", f_segsum_sorted, post)
    timeit("unsorted segment_sum", f_segsum_unsorted, post)
