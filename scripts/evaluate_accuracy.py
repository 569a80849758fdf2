"""Accuracy evaluation: estimated abundances vs. simulation ground truth.

The reference README advertises "accuracy evaluation" scripts that are
absent from its repo (SURVEY.md §4); this provides them.  Simulates
reads with known per-transcript counts, runs quant, and reports
Spearman/Pearson correlation and relative error of NumReads vs truth.

Usage: python scripts/evaluate_accuracy.py [--transcripts N] [--reads N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    return pearson(ra, rb)


def pearson(a, b):
    a = a - a.mean()
    b = b - b.mean()
    d = np.sqrt((a * a).sum() * (b * b).sum())
    return float((a * b).sum() / d) if d > 0 else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", type=int, default=2000)
    ap.add_argument("--reads", type=int, default=100_000)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--k", default="31")
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sketch_rna_tpu.config import QuantConfig
    from sketch_rna_tpu.index.build import build_index
    from sketch_rna_tpu.io.fasta import FastaRecords
    from sketch_rna_tpu.io.packing import PackedReads
    from sketch_rna_tpu.pipeline import quantify
    from sketch_rna_tpu.utils.synth import synth_transcriptome

    ks = tuple(int(x) for x in args.k.split(","))
    rng = np.random.default_rng(args.seed)
    seqs = synth_transcriptome(rng, args.transcripts)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    recs = FastaRecords(
        [f"T{i:06d}" for i in range(len(seqs))],
        [bases[s].tobytes().decode() for s in seqs],
        0,
    )
    cfg = QuantConfig(
        kmer_lengths=ks,
        max_read_len=((args.read_len + 127) // 128) * 128,
        em_dtype="float32",
    )
    idx = build_index(recs, cfg)

    # Ground truth: expression proportional to a log-normal draw,
    # length-weighted read sampling (like a real library).
    T = len(seqs)
    lens = np.array([s.size for s in seqs], dtype=np.float64)
    expr = rng.lognormal(0, 1.5, size=T) * lens
    pvec = expr / expr.sum()
    truth_counts = rng.multinomial(args.reads, pvec).astype(np.float64)

    # Sample reads per transcript on device.
    tid_of_read = np.repeat(np.arange(T), truth_counts.astype(np.int64))
    rng.shuffle(tid_of_read)
    big = jnp.asarray(np.concatenate(seqs))
    lens_i = np.array([s.size for s in seqs], dtype=np.int32)
    offs = np.zeros(T, dtype=np.int32)
    np.cumsum(lens_i[:-1], out=offs[1:])
    tl = lens_i[tid_of_read]
    span = np.maximum(tl - args.read_len, 0)
    start = (rng.random(tid_of_read.size) * (span + 1)).astype(np.int32)
    eff = np.minimum(tl, args.read_len).astype(np.int32)

    gstart = jnp.asarray(offs[tid_of_read] + start)
    pos = jnp.arange(args.read_len, dtype=jnp.int32)[None, :]
    limit = jnp.asarray(offs[tid_of_read] + tl - 1)
    codes = big[jnp.minimum(gstart[:, None] + pos, limit[:, None])]
    codes = jnp.where(pos < jnp.asarray(eff)[:, None], codes, 0).astype(jnp.uint8)
    codes = jnp.pad(codes, ((0, 0), (0, cfg.max_read_len - args.read_len)))
    packed = PackedReads(codes, jnp.asarray(eff), [])

    result = quantify(idx, packed, cfg)
    est = result.weighted_counts.astype(np.float64)

    keep = truth_counts + est > 0
    print(
        f"transcripts={T} reads={packed.num_reads} "
        f"spearman={spearman(truth_counts[keep], est[keep]):.4f} "
        f"pearson={pearson(truth_counts[keep], est[keep]):.4f} "
        f"median_rel_err="
        f"{np.median(np.abs(est[truth_counts>0] - truth_counts[truth_counts>0]) / truth_counts[truth_counts>0]):.4f} "
        f"assigned={est.sum():.0f}/{args.reads}"
    )


if __name__ == "__main__":
    main()
