"""Scale harness: larger transcriptomes / read counts (BASELINE.json
configs 2-4 analogues).  Reports reads/s and overflow stats.

Usage: python scripts/scale_check.py [--transcripts N] [--reads N]
       [--k 31[,21]] [--read-len L] [--streaming]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", type=int, default=50000)
    ap.add_argument("--reads", type=int, default=1_000_000)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--k", default="31")
    ap.add_argument("--batch-size", type=int, default=8192)
    ap.add_argument("--streaming", action="store_true", help="force the streaming path")
    ap.add_argument("--cache-dir", default="/tmp/sketch_scale_cache",
                    help="reuse the built index across runs (keyed by params)")
    args = ap.parse_args()

    from sketch_rna_tpu.utils.compilecache import enable_compilation_cache

    enable_compilation_cache()
    from sketch_rna_tpu import pipeline as pl
    from sketch_rna_tpu.config import QuantConfig
    from sketch_rna_tpu.index.build import build_index
    from sketch_rna_tpu.io.fasta import FastaRecords
    from sketch_rna_tpu.io.packing import PackedReads
    from sketch_rna_tpu.utils.synth import sample_reads_device, synth_transcriptome

    ks = tuple(int(x) for x in args.k.split(","))
    rng = np.random.default_rng(2026)
    t0 = time.perf_counter()
    seqs = synth_transcriptome(rng, args.transcripts)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    recs = FastaRecords(
        [f"T{i:06d}" for i in range(len(seqs))],
        [bases[s].tobytes().decode() for s in seqs],
        0,
    )
    print(f"transcriptome: {len(seqs)} seqs, {sum(s.size for s in seqs)/1e6:.1f} Mb "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)

    cfg = QuantConfig(
        kmer_lengths=ks,
        batch_size=args.batch_size,
        max_read_len=((args.read_len + 127) // 128) * 128,
        em_dtype="float32",
    )
    from sketch_rna_tpu.index.artifact import load_index, save_index

    cache_key = f"T{args.transcripts}_k{args.k.replace(',','_')}"
    cache_path = os.path.join(args.cache_dir, f"{cache_key}.npz")
    t0 = time.perf_counter()
    if os.path.exists(cache_path):
        idx = load_index(cache_path)
        print(f"index loaded from cache {cache_path}", flush=True)
    else:
        idx = build_index(recs, cfg)
        os.makedirs(args.cache_dir, exist_ok=True)
        save_index(cache_path, idx)
    t_index = time.perf_counter() - t0
    tot_post = {k: idx.per_k[k].num_postings for k in ks}
    print(f"index: {t_index:.1f}s, keys={ {k: idx.per_k[k].num_keys for k in ks} } "
          f"postings={tot_post}", flush=True)

    t0 = time.perf_counter()
    import jax

    codes, lens = sample_reads_device(seqs, args.reads, args.read_len, cfg.max_read_len, 7)
    jax.block_until_ready((codes, lens))
    packed = PackedReads(codes, lens, [])
    print(f"reads: {args.reads} in {time.perf_counter()-t0:.1f}s (device)", flush=True)

    if args.streaming:
        pl_cap = pl.FUSED_MAX_PADDED_READS
        pl.FUSED_MAX_PADDED_READS = 0
    # warm-up run at FULL shape to absorb compiles (the scan program is
    # shape-specialized on the batch count).
    pl.quantify(idx, packed, cfg)

    t0 = time.perf_counter()
    result = pl.quantify(idx, packed, cfg)
    dt = time.perf_counter() - t0
    print(
        f"quant: {dt:.2f}s -> {args.reads/dt:,.0f} reads/s | "
        f"em_iters={result.em_iterations} rows={int(result.has_entry.sum())} "
        f"stats={result.stats} timing={ {k: round(v,3) for k,v in result.timing.items()} }",
        flush=True,
    )
    if result.sizes:
        print(f"sizes={result.sizes}", flush=True)
    if args.streaming:
        pl.FUSED_MAX_PADDED_READS = pl_cap


if __name__ == "__main__":
    main()
