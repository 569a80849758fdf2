"""Benchmark: quant throughput (reads/s) on one chip.

Prints ONE JSON line:
  {"metric": "quant_reads_per_s_per_chip", "value": N, "unit": "reads/s",
   "vs_baseline": N / 625000.0}

vs_baseline denominator: the reference publishes no numbers
(BASELINE.md); the driver-set north-star target is >= 10M reads/s
aggregate on a 16-chip v5p slice => 625k reads/s per chip.  vs_baseline
= measured per-chip reads/s / 625k, so >= 1.0 meets the per-chip share
of the target.

Workload (BASELINE.json config 2 analogue): synthetic ~2k-transcript
transcriptome (isoform families sharing subsequences, so reads genuinely
multi-map), 131,072 reads of 150 bp, k=31.  Timed section = the full
quant pipeline (sketch + match + pair collection + EM + assignment)
after one warm-up pass that absorbs XLA compilation.
"""

from __future__ import annotations

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_TRANSCRIPTS = 2000
TRANSCRIPT_LEN = (600, 2500)
N_READS = 131072
READ_LEN = 150
BATCH = 8192
SEED = 1234


def build_problem():
    from sketch_rna_tpu.config import QuantConfig
    from sketch_rna_tpu.index.build import build_index
    from sketch_rna_tpu.io.fasta import FastaRecords
    from sketch_rna_tpu.io.packing import PackedReads

    rng = np.random.default_rng(SEED)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seqs = []
    while len(seqs) < N_TRANSCRIPTS:
        ln = int(rng.integers(*TRANSCRIPT_LEN))
        base = rng.integers(0, 4, size=ln).astype(np.uint8)
        seqs.append(base)
        # Two isoforms sharing most of the sequence.
        for _ in range(2):
            if len(seqs) >= N_TRANSCRIPTS:
                break
            a = int(rng.integers(0, ln // 3))
            b = int(rng.integers(a, ln))
            iso = np.concatenate([base[:a], base[b:], rng.integers(0, 4, size=50).astype(np.uint8)])
            if iso.size >= 100:
                seqs.append(iso.astype(np.uint8))
    names = [f"T{i:05d}" for i in range(len(seqs))]
    recs = FastaRecords(names, [bases[s].tobytes().decode() for s in seqs], 0)
    cfg = QuantConfig(
        kmer_lengths=(31,),
        batch_size=BATCH,
        max_read_len=((READ_LEN + 127) // 128) * 128,
        em_dtype="float32",
    )
    t0 = time.perf_counter()
    idx = build_index(recs, cfg)
    t_index = time.perf_counter() - t0

    codes = np.zeros((N_READS, cfg.max_read_len), np.uint8)
    lengths = np.full(N_READS, READ_LEN, np.int32)
    picks = rng.integers(0, len(seqs), size=N_READS)
    for i in range(N_READS):
        t = seqs[picks[i]]
        if t.size <= READ_LEN:
            codes[i, : t.size] = t
            lengths[i] = t.size
        else:
            start = int(rng.integers(0, t.size - READ_LEN + 1))
            codes[i, :READ_LEN] = t[start : start + READ_LEN]
    packed = PackedReads(codes, lengths, [str(i) for i in range(N_READS)])
    return cfg, idx, packed, t_index


def main():
    from sketch_rna_tpu.pipeline import quantify

    cfg, idx, packed, t_index = build_problem()

    # Warm-up pass absorbs compilation (same static shapes as the timed run).
    quantify(idx, packed, cfg)

    t0 = time.perf_counter()
    result = quantify(idx, packed, cfg)
    elapsed = time.perf_counter() - t0

    reads_per_s = packed.num_reads / elapsed
    print(
        json.dumps(
            {
                "metric": "quant_reads_per_s_per_chip",
                "value": round(reads_per_s, 1),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_s / 625000.0, 4),
            }
        )
    )
    # Context to stderr (driver records stdout JSON only).
    print(
        f"[bench] T={idx.num_transcripts} reads={packed.num_reads} "
        f"elapsed={elapsed:.3f}s em_iters={result.em_iterations} "
        f"index_build={t_index:.2f}s rows={int(result.has_entry.sum())}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
