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


def synth_transcriptome(rng, n, len_lo=600, len_hi=2500, iso_frac=0.6):
    seqs = []
    while len(seqs) < n:
        ln = int(rng.integers(len_lo, len_hi))
        base = rng.integers(0, 4, size=ln).astype(np.uint8)
        seqs.append(base)
        while len(seqs) < n and rng.random() < iso_frac:
            a = int(rng.integers(0, ln // 3))
            b = int(rng.integers(a, ln))
            iso = np.concatenate(
                [base[:a], base[b:], rng.integers(0, 4, size=50).astype(np.uint8)]
            )
            if iso.size >= 100:
                seqs.append(iso.astype(np.uint8))
    return seqs[:n]


def synth_reads_vectorized(rng, seqs, n_reads, read_len):
    """Vectorized read sampling: one big gather over the concatenated
    transcriptome."""
    big = np.concatenate(seqs)
    lens = np.array([s.size for s in seqs], dtype=np.int64)
    offs = np.zeros(lens.size + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    tid = rng.integers(0, len(seqs), size=n_reads)
    span = np.maximum(lens[tid] - read_len, 0)
    start = (rng.random(n_reads) * (span + 1)).astype(np.int64)
    eff_len = np.minimum(lens[tid], read_len).astype(np.int32)
    gstart = offs[tid] + start
    idx = gstart[:, None] + np.arange(read_len, dtype=np.int64)[None, :]
    idx = np.minimum(idx, offs[tid][:, None] + lens[tid][:, None] - 1)
    codes = big[idx]
    mask = np.arange(read_len)[None, :] < eff_len[:, None]
    codes = np.where(mask, codes, 0).astype(np.uint8)
    return codes, eff_len


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", type=int, default=50000)
    ap.add_argument("--reads", type=int, default=1_000_000)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--k", default="31")
    ap.add_argument("--batch-size", type=int, default=8192)
    ap.add_argument("--streaming", action="store_true", help="force the streaming path")
    args = ap.parse_args()

    from sketch_rna_tpu import pipeline as pl
    from sketch_rna_tpu.config import QuantConfig
    from sketch_rna_tpu.index.build import build_index
    from sketch_rna_tpu.io.fasta import FastaRecords
    from sketch_rna_tpu.io.packing import PackedReads

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
    t0 = time.perf_counter()
    idx = build_index(recs, cfg)
    t_index = time.perf_counter() - t0
    tot_post = {k: idx.per_k[k].num_postings for k in ks}
    print(f"index: {t_index:.1f}s, keys={{k: idx.per_k[k].num_keys for k in ks}} "
          f"postings={tot_post}", flush=True)

    t0 = time.perf_counter()
    codes, lens = synth_reads_vectorized(rng, seqs, args.reads, args.read_len)
    pad = cfg.max_read_len
    full = np.zeros((args.reads, pad), np.uint8)
    full[:, : args.read_len] = codes
    packed = PackedReads(full, lens, [str(i) for i in range(args.reads)])
    print(f"reads: {args.reads} in {time.perf_counter()-t0:.1f}s", flush=True)

    if args.streaming:
        pl_cap = pl.FUSED_MAX_PADDED_READS
        pl.FUSED_MAX_PADDED_READS = 0
    # warm-up on a slice to absorb compiles
    warm = PackedReads(full[: args.batch_size * 2], lens[: args.batch_size * 2], [])
    pl.quantify(idx, warm, cfg)

    t0 = time.perf_counter()
    result = pl.quantify(idx, packed, cfg)
    dt = time.perf_counter() - t0
    print(
        f"quant: {dt:.2f}s -> {args.reads/dt:,.0f} reads/s | "
        f"em_iters={result.em_iterations} rows={int(result.has_entry.sum())} "
        f"stats={result.stats} timing={ {k: round(v,3) for k,v in result.timing.items()} }",
        flush=True,
    )
    if args.streaming:
        pl.FUSED_MAX_PADDED_READS = pl_cap


if __name__ == "__main__":
    main()
