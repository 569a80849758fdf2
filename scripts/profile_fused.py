"""Time H2D transfer vs fused quant compute (dev tool)."""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_problem
from sketch_rna_tpu.pipeline import _device_index, quant_fused


def main():
    cfg, idx, packed, _ = build_problem()
    ks = tuple(idx.kmer_lengths)
    caps = tuple(cfg.sketch_capacity_for(k) for k in ks)
    bpacked, postings, bucket_meta = _device_index(idx, ks)
    B = cfg.batch_size
    nb = (packed.num_reads + B - 1) // B
    N = nb * B
    L = packed.padded_len
    codes_all = np.zeros((nb, B, L), np.uint8)
    codes_all.reshape(N, L)[: packed.num_reads] = packed.codes
    lengths_all = np.zeros((nb, B), np.int32)
    lengths_all.reshape(N)[: packed.num_reads] = packed.lengths

    dev_args = None
    for trial in range(3):
        t0 = time.perf_counter()
        dev_args = (
            jax.device_put(codes_all),
            jax.device_put(lengths_all),
            tuple(jnp.asarray(a) for a in bpacked),
            tuple(jnp.asarray(a) for a in postings),
            jnp.asarray(packed.num_reads, jnp.int32),
        )
        jax.block_until_ready(dev_args)
        print(f"H2D ({codes_all.nbytes/1e6:.0f} MB codes): {time.perf_counter()-t0:.3f}s", flush=True)

    kw = dict(
        kmer_lengths=ks, sketch_fraction=cfg.sketch_fraction, sketch_caps=caps,
        chain_fraction=cfg.chain_fraction, expand_per_read=cfg.expand_per_read,
        candidate_capacity=cfg.candidate_capacity, bucket_meta=bucket_meta,
        num_transcripts=idx.num_transcripts, em_max_iterations=cfg.em_max_iterations,
        em_convergence=cfg.em_convergence, pseudocount=cfg.pseudocount,
        em_epsilon=cfg.em_epsilon, em_dtype="float32",
    )
    out = quant_fused(*dev_args, **kw)
    jax.block_until_ready(out)
    for _ in range(3):
        t0 = time.perf_counter()
        out = quant_fused(*dev_args, **kw)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"quant_fused compute: {dt:.3f}s -> {packed.num_reads/dt:,.0f} reads/s", flush=True)


if __name__ == "__main__":
    main()
