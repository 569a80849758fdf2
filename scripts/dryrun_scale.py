"""8-device virtual-mesh dryrun at >=1M reads (VERDICT r1 next-round #4).

Runs the FULL sharded streaming engine (scan-chunked shard_map, bounded
per-device class buffers, psum'd EM/assignment) on an 8-device virtual
CPU mesh at 1M reads, proving the multi-chip program compiles and holds
O(buffer) memory at scale — the real-chip throughput numbers live in
scale_check.py / DESIGN.md.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python scripts/dryrun_scale.py [--reads 1000000] [--transcripts 10000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1_000_000)
    ap.add_argument("--transcripts", type=int, default=10_000)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--batch-size", type=int, default=8192)
    ap.add_argument("--k", default="31")
    args = ap.parse_args()

    from sketch_rna_tpu.utils.compilecache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from sketch_rna_tpu.config import QuantConfig
    from sketch_rna_tpu.dist.mesh import make_mesh, mesh_factor
    from sketch_rna_tpu.index.artifact import load_index, save_index
    from sketch_rna_tpu.index.build import build_index
    from sketch_rna_tpu.io.fasta import FastaRecords
    from sketch_rna_tpu.io.packing import PackedReads
    from sketch_rna_tpu.pipeline import quantify_sharded
    from sketch_rna_tpu.utils.synth import sample_reads_device, synth_transcriptome

    nd = len(jax.devices())
    dp, ip = mesh_factor(nd)
    mesh = make_mesh(dp, ip)
    print(f"devices={nd} mesh=({dp}x{ip}) backend={jax.default_backend()}", flush=True)

    rng = np.random.default_rng(2026)
    seqs = synth_transcriptome(rng, args.transcripts)
    ks = tuple(int(x) for x in args.k.split(","))
    cfg = QuantConfig(
        kmer_lengths=ks,
        batch_size=args.batch_size,
        max_read_len=((args.read_len + 127) // 128) * 128,
        em_dtype="float32",
    )
    cache = (
        f"/tmp/sketch_scale_cache/T{args.transcripts}"
        f"_k{args.k.replace(',', '_')}.npz"
    )
    if os.path.exists(cache):
        idx = load_index(cache)
    else:
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        recs = FastaRecords(
            [f"T{i:06d}" for i in range(len(seqs))],
            [bases[s].tobytes().decode() for s in seqs],
            0,
        )
        idx = build_index(recs, cfg)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        save_index(cache, idx)
    print(f"index: T={idx.num_transcripts}", flush=True)

    codes, lens = sample_reads_device(
        seqs, args.reads, args.read_len, cfg.max_read_len, 7
    )
    jax.block_until_ready((codes, lens))
    packed = PackedReads(np.asarray(codes), np.asarray(lens), [])
    print(f"reads: {args.reads}", flush=True)

    t0 = time.perf_counter()
    result = quantify_sharded(idx, packed, cfg, mesh=mesh)
    dt = time.perf_counter() - t0
    assert result.pi.shape == (idx.num_transcripts,)
    assert np.isfinite(result.pi).all()
    assert result.num_reads == args.reads
    print(
        f"dryrun_scale ok: {args.reads} reads on ({dp}x{ip}) mesh in {dt:.1f}s "
        f"({args.reads/dt/1e3:.1f}k reads/s aggregate), "
        f"em_iters={result.em_iterations}, rows={int(result.has_entry.sum())}, "
        f"overflows={ {k: v for k, v in result.stats.items() if v} }",
        flush=True,
    )


if __name__ == "__main__":
    main()
