"""Reference-binary index format: round-trip and quant equivalence."""

import numpy as np

from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.index.build import build_index
from sketch_rna_tpu.index.refbin import (
    is_npz_index,
    load_any_index,
    read_refbin_index,
    write_refbin_index,
)
from sketch_rna_tpu.index.artifact import save_index
from sketch_rna_tpu.io.fasta import FastaRecords

from util import decode, make_transcriptome


def make_idx(tmp_path, ks=(21, 31)):
    rng = np.random.default_rng(31337)
    seqs = make_transcriptome(rng, n=12, len_range=(60, 400))
    recs = FastaRecords([f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs], 0)
    cfg = QuantConfig(kmer_lengths=ks)
    return build_index(recs, cfg), recs


def test_refbin_roundtrip(tmp_path):
    idx, recs = make_idx(tmp_path)
    path = str(tmp_path / "ref.bin")
    write_refbin_index(path, idx, recs.seqs)
    idx2 = read_refbin_index(path)
    assert idx2.names == idx.names
    assert idx2.kmer_lengths == idx.kmer_lengths
    np.testing.assert_array_equal(idx2.lengths, idx.lengths)
    for k in idx.kmer_lengths:
        np.testing.assert_array_equal(idx2.per_k[k].keys, idx.per_k[k].keys)
        np.testing.assert_array_equal(idx2.per_k[k].row_ptr, idx.per_k[k].row_ptr)
        np.testing.assert_array_equal(idx2.per_k[k].postings, idx.per_k[k].postings)


def test_refbin_without_sequences_recovers_nothing_but_loads(tmp_path):
    idx, recs = make_idx(tmp_path)
    path = str(tmp_path / "ref_noseq.bin")
    write_refbin_index(path, idx)  # empty sequences, like a lean export
    idx2 = read_refbin_index(path)
    assert idx2.names == idx.names
    np.testing.assert_array_equal(idx2.lengths, idx.lengths)  # real lengths kept


def test_refbin_roundtrip_large_synthetic(tmp_path):
    """Format robustness at GENCODE-like sizes (DESIGN gap: refbin
    untested at scale): 20k transcripts, ~600k keys, ~1.3M postings —
    synthetic CSR arrays so no index build is needed."""
    from sketch_rna_tpu.index.artifact import IndexArtifact, KIndex

    rng = np.random.default_rng(5)
    T, U = 20_000, 600_000
    names = [f"ENST{i:011d}.1" for i in range(T)]
    lengths = rng.integers(200, 90_000, T).astype(np.int32)
    per_k = {}
    for k in (21, 31):
        keys = np.sort(
            rng.choice(np.arange(0, 1 << 32, 7000, dtype=np.uint64), U, replace=False)
        ).astype(np.uint32)
        deg = rng.geometric(0.55, U).astype(np.int32)
        row_ptr = np.zeros(U + 1, np.int32)
        np.cumsum(deg, out=row_ptr[1:])
        postings = rng.integers(0, T, int(row_ptr[-1])).astype(np.int32)
        # ascending within each row, like the builder emits (and the
        # refbin reader re-establishes)
        row_ids = np.repeat(np.arange(U), deg)
        postings = postings[np.lexsort((postings, row_ids))]
        per_k[k] = KIndex(keys, row_ptr, postings)
    idx = IndexArtifact(names, lengths, (21, 31), 0.05, per_k)
    path = str(tmp_path / "big.bin")
    write_refbin_index(path, idx)
    idx2 = read_refbin_index(path)
    assert idx2.names == names
    np.testing.assert_array_equal(idx2.lengths, lengths)
    for k in (21, 31):
        np.testing.assert_array_equal(idx2.per_k[k].keys, per_k[k].keys)
        np.testing.assert_array_equal(idx2.per_k[k].row_ptr, per_k[k].row_ptr)
        np.testing.assert_array_equal(idx2.per_k[k].postings, per_k[k].postings)


def test_load_any_index_detects_format(tmp_path):
    idx, recs = make_idx(tmp_path)
    npz = str(tmp_path / "a.skidx.npz")
    bin_ = str(tmp_path / "a.bin")
    save_index(npz, idx)
    write_refbin_index(bin_, idx, recs.seqs)
    assert is_npz_index(npz)
    assert not is_npz_index(bin_)
    a = load_any_index(npz)
    b = load_any_index(bin_)
    assert a.names == b.names
    for k in idx.kmer_lengths:
        np.testing.assert_array_equal(a.per_k[k].keys, b.per_k[k].keys)
        np.testing.assert_array_equal(a.per_k[k].postings, b.per_k[k].postings)
