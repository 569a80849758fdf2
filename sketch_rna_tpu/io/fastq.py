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


def byte_range_for_process(path: str, process_index: int, process_count: int):
    """(start, end) byte bounds splitting an uncompressed FASTQ evenly by
    size — the per-host slice for multi-host parsing (SURVEY.md §7.2
    step 6).  Record alignment happens in iter_fastq_records_range."""
    import os

    size = os.path.getsize(path)
    start = (size * process_index) // process_count
    end = (size * (process_index + 1)) // process_count
    return start, end


def _align_to_record(fh, start: int) -> None:
    """Position fh at the first record header at or after byte `start`.

    A header is a line starting '@' whose line-after-next starts '+'
    (the separator) — this disambiguates quality lines that begin with
    '@', which the reference's sequential pass never tests as headers
    (src/main.cpp:121-133 consumes quality inside the record)."""
    fh.seek(start)
    if start > 0:
        fh.readline()  # skip the partial line
    while True:
        pos = fh.tell()
        line = fh.readline()
        if not line:
            return
        if line[:1] == b"@":
            probe = fh.tell()
            fh.readline()  # sequence
            plus = fh.readline()
            fh.seek(probe)
            if plus[:1] == b"+":
                fh.seek(pos)
                return
        # otherwise keep scanning


def iter_fastq_records_range(
    path: str, start: int, end: int
) -> Iterator[Tuple[str, str, str]]:
    """Yield records whose header byte offset lies in [start, end).

    Every process iterating disjoint covering ranges yields exactly the
    records of a full sequential parse, each once (headers align via
    _align_to_record; a record straddling `end` belongs to the range
    containing its header).  Uncompressed files only (byte offsets)."""
    with open(path, "rb") as fh:
        _align_to_record(fh, start)
        while True:
            pos = fh.tell()
            if pos >= end:
                return
            line = fh.readline()
            if not line:
                return
            line = line.rstrip(b"\n")
            if not line or line[:1] != b"@":
                continue
            rid = line[1:].decode()
            seq = fh.readline().rstrip(b"\n").decode()
            fh.readline()  # '+' separator
            qual = fh.readline().rstrip(b"\n").decode()
            yield rid, seq, qual


def load_fastq_dict_range(
    path: str, start: int, end: int, min_len: int = 0
) -> Dict[str, str]:
    """Byte-range variant of load_fastq_dict (same validation-first
    duplicate semantics, applied within the range)."""
    out: Dict[str, str] = {}
    for rid, seq, _ in iter_fastq_records_range(path, start, end):
        if len(seq) < min_len or not is_valid_sequence(seq):
            continue
        out[rid] = seq
    return out


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


def load_fastq_with_quality(
    path: str, min_len: int = 0
) -> Dict[str, Tuple[str, str]]:
    """id -> (sequence, quality), same duplicate/validation semantics.

    Completes the reference's Read data model (id, sequence, quality —
    include/data_io.h:38-43): the reference parses and RETAINS quality
    strings though no downstream math reads them, so the hot paths here
    drop them (PARITY.md deviation 1).  This loader keeps them for
    callers that want full structural parity or QC tooling."""
    out: Dict[str, Tuple[str, str]] = {}
    for rid, seq, qual in iter_fastq_records(path):
        if len(seq) < min_len or not is_valid_sequence(seq):
            continue
        out[rid] = (seq, qual)
    return out
