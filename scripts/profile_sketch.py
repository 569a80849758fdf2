"""Micro-bench: sketch-stage strategies at production shapes.

Compares, per k:
  a) jnp sketch_batch            (hash fused by XLA + 2 dedup row sorts)
  b) Pallas hash + sort dedup    (sketch_batch_pallas_unfused)
  c) fused Pallas kernel         (hash+threshold+dedup+compaction, 1 pass)

Run on the TPU to decide the use_pallas_sketch auto policy.
Usage: python scripts/profile_sketch.py [B] [L] [k[,k...]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from sketch_rna_tpu.utils.compilecache import enable_compilation_cache

enable_compilation_cache()

from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.hash.pallas_hash import (
    _sketch_batch_pallas_fused,
    sketch_batch_pallas_multik,
    sketch_batch_pallas_unfused,
)
from sketch_rna_tpu.sketch.fracminhash import sketch_batch

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
L = int(sys.argv[2]) if len(sys.argv) > 2 else 256
ks = tuple(int(x) for x in (sys.argv[3] if len(sys.argv) > 3 else "31").split(","))

cfg = QuantConfig(kmer_lengths=ks, max_read_len=L)
key = jax.random.PRNGKey(0)
codes = jax.random.randint(key, (B, L), 0, 4, dtype=jnp.int32).astype(jnp.uint8)
lengths = jnp.full((B,), min(150, L), jnp.int32)
jax.block_until_ready((codes, lengths))


def timeit(name, fn, n=20):
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:42s} {best*1000:8.3f} ms", flush=True)
    return best


print(f"B={B} L={L} ks={ks} backend={jax.default_backend()}", flush=True)

# MEASUREMENT HYGIENE: on the tunneled axon backend, the FIRST device->
# host transfer permanently degrades host dispatch throughput for the
# whole process (~0.7-2 ms per jitted call afterwards; measured — see
# docs/DESIGN.md "axon dispatch cliff").  All timing therefore runs
# BEFORE any np.asarray; correctness checks happen at the end.
checks = []
for k in ks:
    cap = cfg.sketch_capacity_for(k, L)
    print(f"-- k={k} cap={cap}", flush=True)
    jit_jnp = jax.jit(lambda c, l, k=k, cap=cap: sketch_batch(c, l, k, 0.05, cap))
    timeit("jnp hash + 2 row sorts", lambda: jit_jnp(codes, lengths))
    jit_unf = jax.jit(
        lambda c, l, k=k, cap=cap: sketch_batch_pallas_unfused(c, l, k, 0.05, cap)
    )
    timeit("pallas hash + sort dedup", lambda: jit_unf(codes, lengths))
    jit_fus = jax.jit(
        lambda c, l, k=k, cap=cap: _sketch_batch_pallas_fused(c, l, k, 0.05, cap)
    )
    timeit("fused pallas (1 pass)", lambda: jit_fus(codes, lengths))
    checks.append((f"k={k} fused == jnp", jit_jnp(codes, lengths)[0],
                   jit_fus(codes, lengths)[0]))

if len(ks) > 1:
    # The production multi-k path: every k's sketch from ONE launch.
    all_caps = tuple(cfg.sketch_capacity_for(k, L) for k in ks)
    print(f"-- multi-k {ks} caps={all_caps}", flush=True)

    def all_jnp():
        return tuple(
            sketch_batch(codes, lengths, k, 0.05, c) for k, c in zip(ks, all_caps)
        )

    timeit("jnp per-k (hash + 2 sorts each)", jax.jit(all_jnp))
    jit_mk = jax.jit(
        lambda c, l: sketch_batch_pallas_multik(c, l, ks, 0.05, all_caps)
    )
    timeit("multi-k fused pallas (1 launch)", lambda: jit_mk(codes, lengths))
    for (g, _m, _o), k, cap in zip(jit_mk(codes, lengths), ks, all_caps):
        a = sketch_batch(codes, lengths, k, 0.05, cap)
        checks.append((f"multik k={k} == jnp", a[0], g))

import numpy as np

for tag, a, b in checks:
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print(f"   {tag}: OK", flush=True)
