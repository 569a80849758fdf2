"""Profile the multi-k match step component-by-component (dev tool):
where does k={21,31} cost over 2x of k={31}?  Run against the cached
250k-isoform scale index (scripts/scale_check.py builds it)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from sketch_rna_tpu.utils.compilecache import enable_compilation_cache

enable_compilation_cache()

from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.index.artifact import load_index
from sketch_rna_tpu.match.bucket_lookup import bucket_lookup
from sketch_rna_tpu.match.rowmatch import (
    calibrate_tier_widths,
    row_events_to_candidates,
    row_expand_from_runs,
    tier_plan,
)
from sketch_rna_tpu.pipeline import (
    _device_index,
    _event_totals_sorted,
    _probe_width_from,
    sketch_match_step,
)
from sketch_rna_tpu.sketch.fracminhash import sketch_batch
from sketch_rna_tpu.utils.synth import sample_reads_device, synth_transcriptome


def timeit(name, fn, *args, n=10):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:44s} {best*1000:9.2f} ms", flush=True)
    return best


def main():
    idx_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sketch_scale_cache/T250000_k21_31.npz"
    idx = load_index(idx_path)
    T = idx.num_transcripts
    ks = tuple(idx.kmer_lengths)
    K = len(ks)
    cfg = QuantConfig(kmer_lengths=ks, em_dtype="float32", max_read_len=256)
    B = cfg.batch_size
    L = 256
    caps = tuple(cfg.sketch_capacity_for(k, L) for k in ks)
    bpacked, postings, metas = _device_index(idx, ks)
    bpacked = tuple(jnp.asarray(a) for a in bpacked)
    postings = tuple(jnp.asarray(a) for a in postings)
    print(f"T={T} ks={ks} caps={caps} B={B}", flush=True)

    rng = np.random.default_rng(5)
    seqs = synth_transcriptome(rng, 2000)
    codes, lengths = sample_reads_device(seqs, B, 150, L, 5)
    jax.block_until_ready((codes, lengths))

    sample = np.asarray(
        _event_totals_sorted(
            codes, lengths, bpacked,
            kmer_lengths=ks, sketch_fraction=cfg.sketch_fraction,
            sketch_caps=caps, bucket_meta=metas,
        )
    )
    st, sc = sample[: len(sample) // 2], sample[len(sample) // 2 :]
    widths = calibrate_tier_widths(st, B, cfg.expand_per_read)
    plan = tier_plan(B, cfg.expand_per_read, widths)
    probe_w = _probe_width_from(sc, caps)
    print(f"tier widths={widths} plan={plan} probe_width={probe_w}", flush=True)

    for ki, k in enumerate(ks):
        timeit(f"sketch k={k}", jax.jit(
            lambda c, l, ki=ki, k=k: sketch_batch(c, l, k, cfg.sketch_fraction, caps[ki])
        ), codes, lengths)

    # NOTE: big index arrays must be jit ARGUMENTS, never closed over —
    # closed-over concrete arrays become HLO literals and XLA spends tens
    # of minutes constant-folding 478MB tables.
    @jax.jit
    def f_probe(c, l, bp):
        out = []
        for ki, k in enumerate(ks):
            h, m, _ = sketch_batch(c, l, k, cfg.sketch_fraction, caps[ki])
            shift, mb = metas[ki]
            out.append(bucket_lookup(h, m, bp[ki], shift=shift, mb=mb))
        return out

    timeit("sketch+lookup (all k)", f_probe, codes, lengths, bpacked)
    runs = jax.block_until_ready(f_probe(codes, lengths, bpacked))
    starts = [r[0] for r in runs]
    lens = [r[1] for r in runs]

    @jax.jit
    def f_sortperm(*sl):
        starts, lens = sl[:K], sl[K:]
        tier_key = jnp.sum(lens[0], axis=1)
        for t in lens[1:]:
            tier_key = jnp.maximum(tier_key, jnp.sum(t, axis=1))
        perm = jnp.argsort(tier_key).astype(jnp.int32)
        return (
            [jnp.take(s, perm, axis=0) for s in starts],
            [jnp.take(l, perm, axis=0) for l in lens],
        )

    timeit("tier sort+permute", f_sortperm, *starts, *lens)
    starts_p, lens_p = jax.block_until_ready(f_sortperm(*starts, *lens))

    row0 = 0
    for t_i, (rows, w) in enumerate(plan):
        s_t = [jax.lax.slice_in_dim(s, row0, row0 + rows, axis=0) for s in starts_p]
        l_t = [jax.lax.slice_in_dim(l, row0, row0 + rows, axis=0) for l in lens_p]

        @partial(jax.jit, static_argnames=("w",))
        def f_exp(s_t, l_t, po, w):
            return [
                row_expand_from_runs(s_t[ki], l_t[ki], po[ki],
                                     events_per_read=w, k_index=ki, num_k=K)[0]
                for ki in range(K)
            ]

        fw = partial(f_exp, w=w)
        timeit(f"tier{t_i} [{rows}x{w}] expand (all k)", fw, tuple(s_t), tuple(l_t), postings)
        keys = jax.block_until_ready(fw(tuple(s_t), tuple(l_t), postings))
        keym = jnp.concatenate(keys, axis=1) if K > 1 else keys[0]

        @jax.jit
        def f_grp(km):
            return row_events_to_candidates(
                km, num_k=K, chain_fraction=cfg.chain_fraction,
                candidate_capacity=cfg.candidate_capacity, num_transcripts=T,
            ).tid

        timeit(f"tier{t_i} [{rows}x{K}*{w}] group", f_grp, keym)
        row0 += rows

    def f_step(c, l):
        return sketch_match_step(
            c, l, bpacked, postings,
            kmer_lengths=ks, sketch_fraction=cfg.sketch_fraction,
            sketch_caps=caps, chain_fraction=cfg.chain_fraction,
            expand_per_read=cfg.expand_per_read,
            candidate_capacity=cfg.candidate_capacity, bucket_meta=metas,
            num_transcripts=T, match_tiers=True, tier_widths=widths,
        )[0]

    def f_step_pt(c, l):
        return sketch_match_step(
            c, l, bpacked, postings,
            kmer_lengths=ks, sketch_fraction=cfg.sketch_fraction,
            sketch_caps=caps, chain_fraction=cfg.chain_fraction,
            expand_per_read=cfg.expand_per_read,
            candidate_capacity=cfg.candidate_capacity, bucket_meta=metas,
            num_transcripts=T, match_tiers=True, tier_widths=widths,
            probe_width=probe_w,
        )[0]

    dt = timeit("FULL sketch_match_step (flat probe)", f_step, codes, lengths)
    dt2 = timeit("FULL sketch_match_step (tiered probe)", f_step_pt, codes, lengths)
    print(f"==> flat {B/dt:,.0f} | tiered-probe {B/dt2:,.0f} reads/s device-step", flush=True)


if __name__ == "__main__":
    main()
