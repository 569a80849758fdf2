"""Profile the quant step against a LARGE index (dev tool): identifies
which component scales with index size despite fixed shapes."""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sketch_rna_tpu.utils.compilecache import enable_compilation_cache

enable_compilation_cache()

from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.index.artifact import load_index
from sketch_rna_tpu.pipeline import _device_index
from sketch_rna_tpu.sketch.fracminhash import sketch_batch
from sketch_rna_tpu.match.bucket_lookup import bucket_lookup
from sketch_rna_tpu.match.rowmatch import row_expand_from_runs, row_events_to_candidates
from sketch_rna_tpu.utils.synth import sample_reads_device, synth_transcriptome
from sketch_rna_tpu.em.em import run_em_tables


def timeit(name, fn, *args, n=5):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt*1000:9.2f} ms", flush=True)
    return dt


def main():
    idx_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sketch_scale_cache/T50000_k31.npz"
    idx = load_index(idx_path)
    T = idx.num_transcripts
    cfg = QuantConfig(kmer_lengths=tuple(idx.kmer_lengths), em_dtype="float32")
    ks = tuple(idx.kmer_lengths)
    k0 = ks[0]
    caps = tuple(cfg.sketch_capacity_for(k) for k in ks)
    bpacked, postings, metas = _device_index(idx, ks)
    bp0 = jnp.asarray(bpacked[0])
    post0 = jnp.asarray(postings[0])
    shift, mb = metas[0]
    B = cfg.batch_size
    print(f"T={T} keys={idx.per_k[k0].num_keys} postings={post0.shape[0]} "
          f"bucket=[{bp0.shape[0]}x{bp0.shape[1]}] mb={mb} shift={shift}", flush=True)

    rng = np.random.default_rng(5)
    seqs = synth_transcriptome(rng, 2000)  # reads only need plausible content
    codes, lengths = sample_reads_device(seqs, B, 150, cfg.max_read_len, 5)
    jax.block_until_ready((codes, lengths))

    f_sk = jax.jit(lambda c, l: sketch_batch(c, l, k0, cfg.sketch_fraction, caps[0]))
    timeit("sketch", f_sk, codes, lengths)

    @jax.jit
    def f_lk(c, l):
        h, m, _ = sketch_batch(c, l, k0, cfg.sketch_fraction, caps[0])
        return bucket_lookup(h, m, bp0, shift=shift, mb=mb)

    timeit("+bucket lookup", f_lk, codes, lengths)

    @jax.jit
    def f_ex(c, l):
        h, m, _ = sketch_batch(c, l, k0, cfg.sketch_fraction, caps[0])
        s, ln = bucket_lookup(h, m, bp0, shift=shift, mb=mb)
        return row_expand_from_runs(s, ln, post0, events_per_read=cfg.expand_per_read,
                                    k_index=0, num_k=1)

    timeit("+row expand", f_ex, codes, lengths)

    @jax.jit
    def f_full(c, l):
        h, m, _ = sketch_batch(c, l, k0, cfg.sketch_fraction, caps[0])
        s, ln = bucket_lookup(h, m, bp0, shift=shift, mb=mb)
        key, d = row_expand_from_runs(s, ln, post0, events_per_read=cfg.expand_per_read,
                                      k_index=0, num_k=1)
        r = row_events_to_candidates(key, num_k=1, chain_fraction=cfg.chain_fraction,
                                     candidate_capacity=cfg.candidate_capacity,
                                     num_transcripts=T)
        return r.tid, r.score, r.mask

    dt = timeit("full step", f_full, codes, lengths)
    print(f"==> device step reads/s: {B/dt:,.0f}", flush=True)

    # EM at this T with W=16, N=200k-ish
    N, W = 204800, 16
    tid_t = jnp.asarray(np.random.default_rng(0).integers(0, T, size=(N, W)).astype(np.int32))
    sc_t = jnp.asarray((np.random.default_rng(1).random((N, W)) < 0.3).astype(np.int32) * 3)
    f_em = lambda a, b: run_em_tables(a, b, jnp.asarray(N, jnp.int32), num_transcripts=T,
                                      dtype="float32")
    timeit(f"EM 20it N={N} W={W}", f_em, tid_t, sc_t, n=3)


if __name__ == "__main__":
    main()
