"""Generate a large on-disk FASTQ from the scale-check transcriptome.

Feeds the big-dataset streaming demo (VERDICT r1 next-round #4): the
chunked native-parser path needs a REAL multi-gigabyte file, not
device-resident synthetic reads.  Reads are sampled on the accelerator
in chunks (utils/synth.py) and framed into FASTQ records with pure
vectorized numpy — no per-read Python.

Usage: python scripts/make_fastq.py out.fq [--transcripts 250000]
       [--reads 32000000] [--read-len 150] [--chunk 2000000]

The transcriptome uses the SAME generator + seed as scale_check.py, so
the cached indexes under /tmp/sketch_scale_cache match these reads.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def frame_fastq_chunk(codes: np.ndarray, start_id: int) -> bytes:
    """[n, L] uint8 base codes -> FASTQ bytes with fixed-width ids."""
    n, L = codes.shape
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    # record: '@r' + 10 digits + '\n' + seq + '\n+\n' + qual + '\n'
    head = 13
    rec_len = head + L + 3 + L + 1
    rec = np.empty((n, rec_len), dtype=np.uint8)
    rec[:, 0] = ord("@")
    rec[:, 1] = ord("r")
    ids = np.arange(start_id, start_id + n, dtype=np.int64)
    for d in range(10):
        rec[:, 2 + d] = (ids // 10 ** (9 - d)) % 10 + ord("0")
    rec[:, 12] = ord("\n")
    rec[:, head : head + L] = bases[codes]
    rec[:, head + L] = ord("\n")
    rec[:, head + L + 1] = ord("+")
    rec[:, head + L + 2] = ord("\n")
    rec[:, head + L + 3 : head + L + 3 + L] = ord("I")
    rec[:, -1] = ord("\n")
    return rec.tobytes()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--transcripts", type=int, default=250000)
    ap.add_argument("--reads", type=int, default=32_000_000)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--chunk", type=int, default=2_000_000)
    args = ap.parse_args()

    from sketch_rna_tpu.utils.compilecache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from sketch_rna_tpu.utils.synth import sample_reads_device, synth_transcriptome

    rng = np.random.default_rng(2026)  # scale_check.py's transcriptome seed
    t0 = time.perf_counter()
    seqs = synth_transcriptome(rng, args.transcripts)
    print(
        f"transcriptome: {len(seqs)} seqs ({time.perf_counter()-t0:.1f}s)",
        flush=True,
    )

    written = 0
    t0 = time.perf_counter()
    with open(args.out, "wb", buffering=1 << 24) as fh:
        while written < args.reads:
            n = min(args.chunk, args.reads - written)
            codes, _ = sample_reads_device(
                seqs, n, args.read_len, args.read_len, 1000 + written % 997
            )
            arr = np.asarray(codes)
            fh.write(frame_fastq_chunk(arr, written))
            written += n
            el = time.perf_counter() - t0
            print(
                f"  {written}/{args.reads} reads, {written/el/1e6:.2f} M reads/s",
                flush=True,
            )
    size = os.path.getsize(args.out)
    print(f"wrote {args.out}: {size/1e9:.2f} GB in {time.perf_counter()-t0:.1f}s")


if __name__ == "__main__":
    main()
