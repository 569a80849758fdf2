"""Cache-only multi-k profile: times ONLY programs the real pipeline has
already compiled (persistent cache), so it runs in seconds on hosts where
fresh XLA compiles take tens of minutes.

Split obtained:
  A = _event_totals_sorted  ~= sketch (both k) + bucket probe + row-sum
  B = full quant via scale-check shapes (known from DESIGN trajectory)
so  expand+group+tier-permute ~= step_total - A.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sketch_rna_tpu.utils.compilecache import enable_compilation_cache

enable_compilation_cache()

from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.index.artifact import load_index
from sketch_rna_tpu.pipeline import _device_index, _event_totals_sorted
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
    ks = tuple(idx.kmer_lengths)
    cfg = QuantConfig(kmer_lengths=ks, em_dtype="float32", max_read_len=256)
    B = cfg.batch_size
    L = 256
    caps = tuple(cfg.sketch_capacity_for(k, L) for k in ks)
    bpacked, postings, metas = _device_index(idx, ks)
    print(f"T={idx.num_transcripts} ks={ks} caps={caps} B={B}", flush=True)
    for ki, k in enumerate(ks):
        p = bpacked[ki]
        print(f"  k={k}: bucket table {p.shape} = {p.size*4/1e6:.0f} MB, mb={metas[ki][1]}, "
              f"postings {postings[ki].shape[0]/1e6:.1f}M", flush=True)

    rng = np.random.default_rng(5)
    seqs = synth_transcriptome(rng, 2000)
    codes, lengths = sample_reads_device(seqs, B, 150, L, 5)
    jax.block_until_ready((codes, lengths))

    for ki, k in enumerate(ks):
        timeit(f"sketch k={k}", jax.jit(
            lambda c, l, ki=ki, k=k: sketch_batch(c, l, k, cfg.sketch_fraction, caps[ki])
        ), codes, lengths)

    def f_totals(c, l):
        return _event_totals_sorted(
            c, l, bpacked,
            kmer_lengths=ks, sketch_fraction=cfg.sketch_fraction,
            sketch_caps=caps, bucket_meta=metas,
        )

    dt = timeit("sketch+probe+sort [event_totals]", f_totals, codes, lengths)
    print(f"==> sketch+probe: {dt*1000:.2f} ms of the full step", flush=True)


if __name__ == "__main__":
    main()
