"""Component-level TPU profiling of the quant step (dev tool)."""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_problem
from sketch_rna_tpu.pipeline import _padded_index_arrays, sketch_match_step, collect_pairs, quantify
from sketch_rna_tpu.sketch.fracminhash import sketch_batch
from sketch_rna_tpu.match.lookup import lookup_postings
from sketch_rna_tpu.match.rowmatch import row_expand_events, row_events_to_candidates
from sketch_rna_tpu.em.em import run_em, assign_reads


def timeit(name, fn, *args, n=5):
    jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s} {dt*1000:10.2f} ms", flush=True)
    return dt


def main():
    cfg, idx, packed, _ = build_problem()
    ks = tuple(idx.kmer_lengths)
    k0 = ks[0]
    caps = tuple(cfg.sketch_capacity_for(k) for k in ks)
    keys, row_ptr, postings = _padded_index_arrays(idx, ks)
    keys = tuple(jnp.asarray(a) for a in keys)
    row_ptr = tuple(jnp.asarray(a) for a in row_ptr)
    postings = tuple(jnp.asarray(a) for a in postings)
    codes, lengths, _ = next(packed.batches(cfg.batch_size))
    codes = jnp.asarray(codes)
    lengths = jnp.asarray(lengths)
    B = cfg.batch_size
    print(f"B={B} U={keys[0].shape} P={postings[0].shape} Epr={cfg.expand_per_read}")

    timeit("dispatch+trivial", jax.jit(lambda c: c.sum()), codes)

    f_sketch = jax.jit(lambda c, l: sketch_batch(c, l, k0, cfg.sketch_fraction, caps[0]))
    timeit("sketch", f_sketch, codes, lengths)

    @jax.jit
    def f_lookup(c, l):
        h, m, _ = sketch_batch(c, l, k0, cfg.sketch_fraction, caps[0])
        return lookup_postings(h, m, keys[0], row_ptr[0])

    timeit("sketch+lookup", f_lookup, codes, lengths)

    @jax.jit
    def f_expand(c, l):
        h, m, _ = sketch_batch(c, l, k0, cfg.sketch_fraction, caps[0])
        return row_expand_events(h, m, keys[0], row_ptr[0], postings[0],
                                 events_per_read=cfg.expand_per_read, k_index=0, num_k=1)

    timeit("sketch+lookup+row_expand", f_expand, codes, lengths)

    @jax.jit
    def f_full(c, l):
        h, m, _ = sketch_batch(c, l, k0, cfg.sketch_fraction, caps[0])
        key, d = row_expand_events(h, m, keys[0], row_ptr[0], postings[0],
                                   events_per_read=cfg.expand_per_read, k_index=0, num_k=1)
        r = row_events_to_candidates(key, num_k=1, chain_fraction=cfg.chain_fraction,
                                     candidate_capacity=cfg.candidate_capacity)
        return r.tid, r.score, r.mask

    dt = timeit("full row step", f_full, codes, lengths)
    print(f"==> device step reads/s: {B/dt:,.0f}")

    # Host+device pipeline portions.
    t0 = time.perf_counter()
    pr, pt, ps, stats = collect_pairs(idx, packed, cfg)
    t_collect = time.perf_counter() - t0
    print(f"collect_pairs total {t_collect*1000:.0f} ms  -> {packed.num_reads/t_collect:,.0f} reads/s; pairs={pr.shape[0]}")

    from sketch_rna_tpu.pipeline import _pad_pairs
    R = packed.num_reads
    pr_p, pt_p, ps_p = _pad_pairs(pr, pt, ps, read_capacity=R)
    em_args = (jnp.asarray(pr_p), jnp.asarray(pt_p), jnp.asarray(ps_p), jnp.asarray(R, jnp.int32))
    f_em = lambda a, b, c, d: run_em(a, b, c, d, num_transcripts=idx.num_transcripts,
                                     read_capacity=R, dtype="float32")
    timeit("EM (20 iters)", f_em, *em_args, n=3)


if __name__ == "__main__":
    main()
