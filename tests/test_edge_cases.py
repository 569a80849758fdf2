"""Degenerate inputs: no valid reads, no sketchable transcripts."""

import numpy as np

from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.index.build import build_index
from sketch_rna_tpu.io.fasta import FastaRecords
from sketch_rna_tpu.io.packing import PackedReads
from sketch_rna_tpu.pipeline import quantify, write_csv

from util import decode, make_transcriptome, sample_reads


def test_quant_zero_reads(tmp_path):
    rng = np.random.default_rng(1)
    seqs = make_transcriptome(rng, n=6, len_range=(60, 200))
    recs = FastaRecords([f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs], 0)
    cfg = QuantConfig(kmer_lengths=(31,), max_read_len=128)
    idx = build_index(recs, cfg)
    packed = PackedReads(np.zeros((0, 128), np.uint8), np.zeros(0, np.int32), [])
    result = quantify(idx, packed, cfg)
    assert result.num_reads == 0
    assert not result.has_entry.any()
    out = tmp_path / "empty.csv"
    write_csv(str(out), result)
    assert out.read_text() == "Name,NumReads,EM_Abundance\n"


def test_quant_unsketchable_index():
    # Every transcript shorter than k: index has zero postings; reads
    # produce zero candidates; all reads still count toward R.
    recs = FastaRecords(["a", "b"], ["ACGT" * 5, "GGCC" * 4], 0)  # len 20, 16 < 31
    cfg = QuantConfig(kmer_lengths=(31,), batch_size=16, max_read_len=64, em_dtype="float64")
    idx = build_index(recs, cfg)
    assert idx.per_k[31].num_keys == 0
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, size=(5, 64)).astype(np.uint8)
    lengths = np.full(5, 64, np.int32)
    packed = PackedReads(codes, lengths, [str(i) for i in range(5)])
    result = quantify(idx, packed, cfg)
    assert result.num_reads == 5
    assert not result.has_entry.any()
    # pi = EM over zero-candidate reads: every transcript converges to
    # pseudocount/R + pseudocount after iteration 1 (reference math).
    expected = np.float32(0.01) / np.float32(5) + np.float64(np.float32(0.01))
    np.testing.assert_allclose(result.pi, expected, rtol=1e-12)


def test_quant_reads_shorter_than_k_are_prefiltered():
    # packing drops short reads before quant (src/main.cpp:136-138);
    # quant itself treats remaining rows by length mask.
    from sketch_rna_tpu.io.packing import pack_reads

    packed, n_inv, _ = pack_reads(["ACGT" * 3], ["r1"], min_len=31, pad_len=64)
    assert packed.num_reads == 0
    assert n_inv == 1
