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
