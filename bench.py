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
    from sketch_rna_tpu.utils.synth import sample_reads_device, synth_transcriptome

    rng = np.random.default_rng(SEED)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seqs = synth_transcriptome(rng, N_TRANSCRIPTS, *TRANSCRIPT_LEN)
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

    # Reads are sampled ON DEVICE (host loops are far too slow) and stay
    # there; the fused quant path consumes device arrays directly.
    codes, lengths = sample_reads_device(seqs, N_READS, READ_LEN, cfg.max_read_len, SEED)
    packed = PackedReads(codes, lengths, [])
    return cfg, idx, packed, t_index


def main():
    from sketch_rna_tpu.utils.compilecache import enable_compilation_cache

    enable_compilation_cache()
    from sketch_rna_tpu.pipeline import quantify

    cfg, idx, packed, t_index = build_problem()

    # Warm-up pass absorbs compilation (same static shapes as the timed run).
    quantify(idx, packed, cfg)

    # Best of 3: the ~1 s timed window sees +/-20% dispatch jitter on
    # tunneled backends; min-of-N is the standard stable estimator.
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        result = quantify(idx, packed, cfg)
        elapsed = min(elapsed, time.perf_counter() - t0)

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
