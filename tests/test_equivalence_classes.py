"""Equivalence-class EM: exact agreement with per-read EM, and correct
grouping semantics."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.em.classes import group_candidate_rows
from sketch_rna_tpu.index.build import build_index
from sketch_rna_tpu.io.fasta import FastaRecords
from sketch_rna_tpu.io.packing import PackedReads
from sketch_rna_tpu.pipeline import quantify

from util import decode, make_transcriptome, sample_reads


def test_grouping_counts(rng):
    rows_tid = np.array([[1, 2, 0], [1, 2, 0], [3, 0, 0], [1, 2, 0], [3, 0, 0]], np.int32)
    rows_score = np.array([[5, 3, 0], [5, 3, 0], [2, 0, 0], [5, 3, 0], [2, 0, 0]], np.int32)
    ct, cs, w, n = group_candidate_rows(jnp.asarray(rows_tid), jnp.asarray(rows_score))
    assert int(n) == 2
    w = np.asarray(w)[:2]
    assert sorted(w.tolist()) == [2, 3]
    # Profiles with different scores but same tids stay distinct.
    rows_score2 = rows_score.copy()
    rows_score2[1, 0] = 6
    _, _, w2, n2 = group_candidate_rows(jnp.asarray(rows_tid), jnp.asarray(rows_score2))
    assert int(n2) == 3


def test_class_em_equals_per_read_em():
    rng = np.random.default_rng(777)
    seqs = make_transcriptome(rng, n=12, len_range=(60, 400))
    recs = FastaRecords([f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs], 0)
    cfg = QuantConfig(
        kmer_lengths=(31,), batch_size=512, max_read_len=128, em_dtype="float64",
    )
    idx = build_index(recs, cfg)
    # >1024 reads so the class path engages; heavy duplication via
    # repeated identical reads.
    base = [r for r in sample_reads(rng, seqs, n_reads=300, read_len=100, error_rate=0.0) if r.size >= 31]
    reads = (base * 7)[:1800]
    codes = np.zeros((len(reads), 128), np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
        lens[i] = r.size
    packed = PackedReads(codes, lens, [str(i) for i in range(len(reads))])

    on = quantify(idx, packed, cfg)
    off = quantify(idx, packed, dataclasses.replace(cfg, em_equivalence_classes=False))
    assert on.em_iterations == off.em_iterations
    np.testing.assert_allclose(on.pi, off.pi, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(
        on.weighted_counts, off.weighted_counts, rtol=1e-12, atol=1e-13
    )
    np.testing.assert_array_equal(on.has_entry, off.has_entry)


def test_width_partitioned_em_equals_per_read():
    """Force wide candidate rows (big isoform family) so the narrow/wide
    EM partition engages, and compare against the unpartitioned path."""
    rng = np.random.default_rng(888)
    base = rng.integers(0, 4, size=500).astype(np.uint8)
    seqs = [base]
    for _ in range(15):  # 16 isoforms sharing most of the sequence
        a = int(rng.integers(0, 150))
        b = int(rng.integers(a, 450))
        seqs.append(np.concatenate([base[:a], base[b:],
                                    rng.integers(0, 4, size=40).astype(np.uint8)]))
    seqs += [rng.integers(0, 4, size=300).astype(np.uint8) for _ in range(4)]
    recs = FastaRecords([f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs], 0)
    cfg = QuantConfig(kmer_lengths=(31,), batch_size=512, max_read_len=128,
                      em_dtype="float64", candidate_capacity=32)
    idx = build_index(recs, cfg)
    reads = [r for r in sample_reads(rng, seqs, n_reads=400, read_len=100, error_rate=0.0)
             if r.size >= 31] * 4
    reads = reads[:1500]
    codes = np.zeros((len(reads), 128), np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
        lens[i] = r.size
    packed = PackedReads(codes, lens, [str(i) for i in range(len(reads))])

    on = quantify(idx, packed, cfg)
    off = quantify(idx, packed, dataclasses.replace(cfg, em_equivalence_classes=False))
    assert on.em_iterations == off.em_iterations
    np.testing.assert_allclose(on.pi, off.pi, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(on.weighted_counts, off.weighted_counts, rtol=1e-12, atol=1e-13)
    np.testing.assert_array_equal(on.has_entry, off.has_entry)


def test_singleton_fold_and_mid_tier_exact():
    """Folding single-candidate classes out of the EM loop and the
    narrow/mid/wide tier partition must reproduce the unfolded (and
    per-read) results exactly: a singleton's E-step posterior is
    identically 1, so its contribution is iteration-invariant
    (em/classes.py build_class_tables)."""
    rng = np.random.default_rng(999)
    # Isoform families of size 1 (singleton profiles), ~6 (mid tier) and
    # ~16 (wide tier) so all three partitions plus the fold engage.
    base6 = rng.integers(0, 4, size=400).astype(np.uint8)
    base16 = rng.integers(0, 4, size=500).astype(np.uint8)
    seqs = [rng.integers(0, 4, size=300).astype(np.uint8) for _ in range(8)]
    for _ in range(6):
        a = int(rng.integers(0, 100))
        seqs.append(np.concatenate([base6[:a], base6[a + 20:],
                                    rng.integers(0, 4, size=30).astype(np.uint8)]))
    for _ in range(16):
        a = int(rng.integers(0, 150))
        b = int(rng.integers(a, 450))
        seqs.append(np.concatenate([base16[:a], base16[b:],
                                    rng.integers(0, 4, size=40).astype(np.uint8)]))
    recs = FastaRecords([f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs], 0)
    cfg = QuantConfig(kmer_lengths=(31,), batch_size=512, max_read_len=128,
                      em_dtype="float64", candidate_capacity=32)
    idx = build_index(recs, cfg)
    reads = [r for r in sample_reads(rng, seqs, n_reads=500, read_len=100, error_rate=0.0)
             if r.size >= 31] * 4
    reads = reads[:1900]
    codes = np.zeros((len(reads), 128), np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
        lens[i] = r.size
    packed = PackedReads(codes, lens, [str(i) for i in range(len(reads))])

    fold = quantify(idx, packed, cfg)  # fold + tiers on by default
    nofold = quantify(idx, packed, dataclasses.replace(cfg, em_fold_singletons=False))
    perread = quantify(
        idx, packed, dataclasses.replace(cfg, em_equivalence_classes=False)
    )
    for other in (nofold, perread):
        assert fold.em_iterations == other.em_iterations
        np.testing.assert_allclose(fold.pi, other.pi, rtol=1e-12, atol=1e-13)
        np.testing.assert_allclose(
            fold.weighted_counts, other.weighted_counts, rtol=1e-12, atol=1e-13
        )
        np.testing.assert_array_equal(fold.has_entry, other.has_entry)


def test_pair_tier_exact(rng):
    """The width-2 tier for exactly-2-candidate classes must be a pure
    layout change: quantify with the pair tier on (default) vs disabled
    matches to float64 round-off (same math, different lane grouping)."""
    import dataclasses

    import sketch_rna_tpu.pipeline as pl
    from sketch_rna_tpu.config import QuantConfig
    from sketch_rna_tpu.index.build import build_index
    from sketch_rna_tpu.io.fasta import FastaRecords
    from sketch_rna_tpu.io.packing import PackedReads
    from sketch_rna_tpu.pipeline import quantify

    from util import decode, make_transcriptome, sample_reads

    seqs = make_transcriptome(rng, n=30, len_range=(100, 500))
    recs = FastaRecords(
        [f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs], 0
    )
    cfg = QuantConfig(kmer_lengths=(31,), batch_size=512, max_read_len=128,
                      em_dtype="float64", candidate_capacity=32)
    idx = build_index(recs, cfg)
    reads = [r for r in sample_reads(rng, seqs, n_reads=600, read_len=90)
             if r.size >= 31] * 2
    codes = np.zeros((len(reads), 128), np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
        lens[i] = r.size
    packed = PackedReads(codes, lens, [str(i) for i in range(len(reads))])

    on = quantify(idx, packed, cfg)
    pw = pl._EM_PAIR_WIDTH
    pl._EM_PAIR_WIDTH = 0
    try:
        off = quantify(idx, packed, cfg)
    finally:
        pl._EM_PAIR_WIDTH = pw
    assert on.em_iterations == off.em_iterations
    np.testing.assert_allclose(on.pi, off.pi, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(
        on.weighted_counts, off.weighted_counts, rtol=1e-12, atol=1e-13
    )
    np.testing.assert_array_equal(on.has_entry, off.has_entry)
