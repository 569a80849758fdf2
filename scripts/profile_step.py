"""Component-level TPU profiling of the quant step (dev tool)."""

import sys, os, time, functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_problem
from sketch_rna_tpu.pipeline import _padded_index_arrays
from sketch_rna_tpu.sketch.fracminhash import sketch_batch
from sketch_rna_tpu.match.lookup import lookup_postings, expand_postings
from sketch_rna_tpu.match.candidates import expand_events, events_to_candidates


def timeit(name, fn, *args, n=3):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt*1000:10.2f} ms")
    return dt


def main():
    cfg, idx, packed, _ = build_problem()
    ks = tuple(idx.kmer_lengths)
    caps = tuple(cfg.sketch_capacity_for(k) for k in ks)
    keys, row_ptr, postings = _padded_index_arrays(idx, ks)
    keys = tuple(jnp.asarray(a) for a in keys)
    row_ptr = tuple(jnp.asarray(a) for a in row_ptr)
    postings = tuple(jnp.asarray(a) for a in postings)
    codes, lengths, _ = next(packed.batches(cfg.batch_size))
    codes = jnp.asarray(codes)
    lengths = jnp.asarray(lengths)
    B = cfg.batch_size
    print(f"B={B} U={keys[0].shape} P={postings[0].shape} E={B*cfg.expand_per_read}")

    @jax.jit
    def f_null(codes):
        return codes.sum()

    timeit("dispatch+trivial", f_null, codes)

    @jax.jit
    def f_sketch(codes, lengths):
        return sketch_batch(codes, lengths, ks[0], cfg.sketch_fraction, caps[0])

    timeit("sketch", f_sketch, codes, lengths)

    @jax.jit
    def f_lookup(codes, lengths):
        h, m, _ = sketch_batch(codes, lengths, ks[0], cfg.sketch_fraction, caps[0])
        return lookup_postings(h, m, keys[0], row_ptr[0])

    timeit("sketch+lookup", f_lookup, codes, lengths)

    @jax.jit
    def f_expand(codes, lengths):
        h, m, _ = sketch_batch(codes, lengths, ks[0], cfg.sketch_fraction, caps[0])
        s, l = lookup_postings(h, m, keys[0], row_ptr[0])
        return expand_postings(s, l, postings[0], B * cfg.expand_per_read)

    timeit("sketch+lookup+expand", f_expand, codes, lengths)

    @jax.jit
    def f_sortonly(codes, lengths):
        h, m, _ = sketch_batch(codes, lengths, ks[0], cfg.sketch_fraction, caps[0])
        s, l = lookup_postings(h, m, keys[0], row_ptr[0])
        r, t, v, d = expand_postings(s, l, postings[0], B * cfg.expand_per_read)
        return jax.lax.sort((r, t, jnp.zeros_like(r), v.astype(jnp.int32)), num_keys=2)

    timeit("...+event sort (2M)", f_sortonly, codes, lengths)

    @jax.jit
    def f_full(codes, lengths):
        h, m, _ = sketch_batch(codes, lengths, ks[0], cfg.sketch_fraction, caps[0])
        r, t, v, kk, drops = expand_events([h], [m], [keys[0]], [row_ptr[0]], [postings[0]], expand_per_read=cfg.expand_per_read)
        res = events_to_candidates(r, t, v, kk, num_reads=B, num_k=1, chain_fraction=cfg.chain_fraction, candidate_capacity=cfg.candidate_capacity)
        return res.tid, res.score, res.mask

    dt = timeit("full step", f_full, codes, lengths)
    print(f"==> reads/s (device step only): {B/dt:,.0f}")


if __name__ == "__main__":
    main()
