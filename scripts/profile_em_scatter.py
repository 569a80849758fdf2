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
rng = np.random.default_rng(0)
# Skewed tids like real data (zipf-ish popularity).
pop = rng.zipf(1.3, size=N * W).astype(np.int64) % T
tid = jnp.asarray(pop.reshape(N, W).astype(np.int32))
post = jnp.asarray(rng.random((N, W)).astype(np.float32))

flat_tid = np.asarray(tid).reshape(-1)
perm_np = np.argsort(flat_tid, kind="stable")
perm = jnp.asarray(perm_np.astype(np.int32))
tid_sorted = jnp.asarray(flat_tid[perm_np])


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
