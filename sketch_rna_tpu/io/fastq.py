"""FASTQ parsing with the reference's exact single-pass record semantics.

Mirrors process_fastq_single_pass (reference src/main.cpp:107-151):
  - any line starting '@' is treated as a record header; the following
    three lines are sequence, '+' separator (ignored), quality,
  - lines between records that don't start '@' are skipped,
  - the read ID is the FULL header minus '@' (including any description
    after spaces, src/main.cpp:122),
  - records are keyed by ID in an unordered_map, so a duplicate ID
    overwrites — but ONLY records that pass validation are ever inserted
    (src/main.cpp:132-150): the LAST VALID occurrence wins, and an
    invalid/too-short duplicate never clobbers an earlier valid read.
    load_fastq_dict therefore filters before the dict assignment
    (matching native/fastio.cpp); pack_reads' downstream filter is then
    a no-op belt for already-filtered input.
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

from sketch_rna_tpu.io.fasta import open_maybe_gzip
from sketch_rna_tpu.io.packing import is_valid_sequence


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


def load_fastq_dict(path: str, min_len: int = 0) -> Dict[str, str]:
    """id -> sequence with last-VALID-occurrence-wins duplicate handling.

    The reference validates (ACGT-only, length >= max k) BEFORE the map
    insert (src/main.cpp:132-150), so an invalid or too-short record
    never overwrites an earlier valid read with the same ID.  min_len=0
    keeps every ACGT record (callers that filter lengths downstream)."""
    out: Dict[str, str] = {}
    for rid, seq, _ in iter_fastq_records(path):
        if len(seq) < min_len or not is_valid_sequence(seq):
            continue
        out[rid] = seq
    return out
