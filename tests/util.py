"""Shared synthetic-data helpers for tests: deterministic transcriptomes
with shared subsequences (to exercise multi-mapping candidates) and reads
sampled from them."""

from typing import List, Tuple

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def decode(codes: np.ndarray) -> str:
    return BASES[codes].tobytes().decode()


def make_transcriptome(
    rng: np.random.Generator,
    n: int = 24,
    len_range: Tuple[int, int] = (80, 600),
    family_size: int = 3,
) -> List[np.ndarray]:
    """Families of isoform-like transcripts sharing long exact stretches,
    so reads genuinely multi-map and the EM has work to do."""
    out: List[np.ndarray] = []
    while len(out) < n:
        base_len = int(rng.integers(*len_range))
        base = rng.integers(0, 4, size=base_len).astype(np.uint8)
        fam = min(family_size, n - len(out))
        out.append(base.copy())
        for _ in range(fam - 1):
            # Isoform: drop an internal "exon" and/or append novel tail.
            a = int(rng.integers(0, max(base_len // 3, 1)))
            b = int(rng.integers(a, base_len))
            iso = np.concatenate([base[:a], base[b:], rng.integers(0, 4, size=30).astype(np.uint8)])
            if iso.size >= len_range[0] // 2:
                out.append(iso.astype(np.uint8))
    return out[:n]


def sample_reads(
    rng: np.random.Generator,
    transcripts: List[np.ndarray],
    n_reads: int = 300,
    read_len: int = 100,
    error_rate: float = 0.005,
) -> List[np.ndarray]:
    reads = []
    for _ in range(n_reads):
        t = transcripts[int(rng.integers(0, len(transcripts)))]
        if t.size <= read_len:
            seq = t.copy()
        else:
            start = int(rng.integers(0, t.size - read_len + 1))
            seq = t[start : start + read_len].copy()
        errs = rng.random(seq.size) < error_rate
        seq[errs] = (seq[errs] + rng.integers(1, 4, size=int(errs.sum()))) % 4
        reads.append(seq.astype(np.uint8))
    return reads


def write_fasta(path, names, seqs, wrap: int = 60):
    with open(path, "w") as fh:
        for name, seq in zip(names, seqs):
            fh.write(f">{name} description text\n")
            for i in range(0, len(seq), wrap):
                fh.write(seq[i : i + wrap] + "\n")


def write_fastq(path, names, seqs):
    with open(path, "w") as fh:
        for name, seq in zip(names, seqs):
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
