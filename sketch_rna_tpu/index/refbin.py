"""Reference-binary index format compatibility.

Reads/writes the exact custom binary layout of the reference's
save_index/load_index (src/data_io.cpp:165-304) so users can bring
indexes built by the C++ binary to this framework and vice versa:

  [size_t n_k][u32 k]*n_k
  [size_t n_transcripts]
    per transcript: [size_t idLen][id][size_t seqLen][seq][i32 length]
  [size_t n_maps]
    per map: [u32 k][size_t mapSize]
      per hash: [u32 hash][size_t nPostings]
        per posting: [size_t tidLen][tid]

All fields little-endian LP64 host layout (the reference writes raw
structs).  Sketch pointers are not serialized (nullptr on load) and the
reference never uses the serialized sequences in quant — our reader
drops them, and our writer emits them when provided (or empty strings,
which the reference loader accepts).

Transcript order in the file defines our transcript indices on read.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence

import numpy as np

from sketch_rna_tpu.index.artifact import IndexArtifact, KIndex


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def u64(self) -> int:
        (v,) = struct.unpack_from("<Q", self.data, self.pos)
        self.pos += 8
        return v

    def u32(self) -> int:
        (v,) = struct.unpack_from("<I", self.data, self.pos)
        self.pos += 4
        return v

    def i32(self) -> int:
        (v,) = struct.unpack_from("<i", self.data, self.pos)
        self.pos += 4
        return v

    def bytes_(self, n: int) -> bytes:
        v = self.data[self.pos : self.pos + n]
        self.pos += n
        return v


def read_refbin_index(path: str) -> IndexArtifact:
    with open(path, "rb") as fh:
        r = _Reader(fh.read())
    n_k = r.u64()
    kmer_lengths = tuple(r.u32() for _ in range(n_k))
    n_t = r.u64()
    names: List[str] = []
    lengths = np.zeros(n_t, dtype=np.int32)
    seq_lengths = np.zeros(n_t, dtype=np.int32)
    name_to_idx: Dict[str, int] = {}
    for i in range(n_t):
        id_len = r.u64()
        name = r.bytes_(id_len).decode()
        seq_len = r.u64()
        r.bytes_(seq_len)  # sequences unused in quant; drop
        length = r.i32()
        names.append(name)
        # Reference quirk Q2 writes length 0; recover the real length
        # from the serialized sequence when the stored field is useless.
        lengths[i] = length if length > 0 else seq_len
        seq_lengths[i] = seq_len
        name_to_idx[name] = i

    n_maps = r.u64()
    per_k: Dict[int, KIndex] = {}
    for _ in range(n_maps):
        k = r.u32()
        map_size = r.u64()
        hashes: List[int] = []
        postings_per_hash: List[List[int]] = []
        for _ in range(map_size):
            h = r.u32()
            n_post = r.u64()
            tids = []
            for _ in range(n_post):
                tid_len = r.u64()
                tid_name = r.bytes_(tid_len).decode()
                tids.append(name_to_idx[tid_name])
            hashes.append(h)
            postings_per_hash.append(sorted(tids))
        order = np.argsort(np.asarray(hashes, dtype=np.uint32), kind="stable")
        keys = np.asarray(hashes, dtype=np.uint32)[order]
        row_ptr = np.zeros(len(hashes) + 1, dtype=np.int32)
        flat: List[int] = []
        for j, oi in enumerate(order):
            flat.extend(postings_per_hash[oi])
            row_ptr[j + 1] = len(flat)
        per_k[int(k)] = KIndex(
            keys=keys,
            row_ptr=row_ptr,
            postings=np.asarray(flat, dtype=np.int32),
        )

    for k in kmer_lengths:
        per_k.setdefault(
            int(k),
            KIndex(
                keys=np.zeros(0, np.uint32),
                row_ptr=np.zeros(1, np.int32),
                postings=np.zeros(0, np.int32),
            ),
        )
    return IndexArtifact(
        names=names,
        lengths=lengths,
        kmer_lengths=tuple(int(k) for k in kmer_lengths),
        sketch_fraction=0.05,  # not stored in the reference format
        per_k={k: per_k[k] for k in (int(x) for x in kmer_lengths)},
    )


def write_refbin_index(
    path: str, idx: IndexArtifact, seqs: Optional[Sequence[str]] = None
) -> None:
    """Write an artifact in the reference binary layout.  seqs (aligned
    with idx.names) are serialized when given, mirroring the reference's
    (wasteful but format-mandated) inclusion of transcript sequences."""
    with open(path, "wb") as fh:
        w = fh.write
        w(struct.pack("<Q", len(idx.kmer_lengths)))
        for k in idx.kmer_lengths:
            w(struct.pack("<I", k))
        w(struct.pack("<Q", len(idx.names)))
        for i, name in enumerate(idx.names):
            nb = name.encode()
            w(struct.pack("<Q", len(nb)))
            w(nb)
            sb = (seqs[i] if seqs is not None else "").encode()
            w(struct.pack("<Q", len(sb)))
            w(sb)
            w(struct.pack("<i", int(idx.lengths[i])))
        w(struct.pack("<Q", len(idx.per_k)))
        for k, ki in idx.per_k.items():
            w(struct.pack("<I", k))
            w(struct.pack("<Q", ki.num_keys))
            for j in range(ki.num_keys):
                w(struct.pack("<I", int(ki.keys[j])))
                a, b = int(ki.row_ptr[j]), int(ki.row_ptr[j + 1])
                w(struct.pack("<Q", b - a))
                for t in ki.postings[a:b]:
                    tb = idx.names[int(t)].encode()
                    w(struct.pack("<Q", len(tb)))
                    w(tb)


def is_npz_index(path: str) -> bool:
    """npz artifacts are zip files (magic 'PK'); the reference binary
    format starts with a small size_t count."""
    with open(path, "rb") as fh:
        return fh.read(2) == b"PK"


def load_any_index(path: str) -> IndexArtifact:
    from sketch_rna_tpu.index.artifact import load_index

    if is_npz_index(path):
        return load_index(path)
    return read_refbin_index(path)
