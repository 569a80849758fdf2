"""FASTQ parsing with the reference's exact single-pass record semantics.

Mirrors process_fastq_single_pass (reference src/main.cpp:107-151):
  - any line starting '@' is treated as a record header; the following
    three lines are sequence, '+' separator (ignored), quality,
  - lines between records that don't start '@' are skipped,
  - the read ID is the FULL header minus '@' (including any description
    after spaces, src/main.cpp:122),
  - records are keyed by ID in an unordered_map, so a duplicate ID
    overwrites: the LAST occurrence wins (src/main.cpp:150); replicated
    here via dict semantics,
  - validation/length filtering happens downstream in packing (the
    reference validates inline at src/main.cpp:132-138; we keep parsing
    and filtering separable so the filter can also run in native code).
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

from sketch_rna_tpu.io.fasta import open_maybe_gzip


def iter_fastq_records(path: str) -> Iterator[Tuple[str, str, str]]:
    """Yield (id, sequence, quality) tuples, reference header heuristics."""
    with open_maybe_gzip(path) as fh:
        it = iter(fh)
        for line in it:
            line = line.rstrip("\n")
            if not line or line[0] != "@":
                continue
            rid = line[1:]
            seq = next(it, "").rstrip("\n")
            next(it, "")  # '+' line, ignored
            qual = next(it, "").rstrip("\n")
            yield rid, seq, qual


def load_fastq_dict(path: str) -> Dict[str, str]:
    """id -> sequence with last-occurrence-wins duplicate handling,
    mirroring read_sketches[read.id] = ... (src/main.cpp:150)."""
    out: Dict[str, str] = {}
    for rid, seq, _ in iter_fastq_records(path):
        out[rid] = seq
    return out
