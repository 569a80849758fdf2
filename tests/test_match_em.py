"""Vectorized matching + EM vs the exact scalar oracle, end to end on
synthetic multi-mapping data (SURVEY.md §4 golden strategy)."""

import numpy as np
import pytest

from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.index.build import build_index
from sketch_rna_tpu.io.fasta import FastaRecords
from sketch_rna_tpu.io.packing import PackedReads
from sketch_rna_tpu.oracle.reference_oracle import oracle_quant, oracle_sparse_chain
from sketch_rna_tpu.pipeline import collect_pairs, quantify
from sketch_rna_tpu.sketch.fracminhash import sketch_scalar

from util import decode, make_transcriptome, sample_reads


def build_all(seed, ks, n_transcripts=18, n_reads=250, read_len=100):
    rng = np.random.default_rng(seed)
    seqs = make_transcriptome(rng, n=n_transcripts, len_range=(60, 700))
    names = [f"T{i:03d}" for i in range(len(seqs))]
    recs = FastaRecords(names, [decode(s) for s in seqs], 0)
    cfg = QuantConfig(kmer_lengths=ks, batch_size=64, max_read_len=128, em_dtype="float64")
    idx = build_index(recs, cfg)

    reads = sample_reads(rng, seqs, n_reads=n_reads, read_len=read_len)
    max_k = max(ks)
    reads = [r for r in reads if r.size >= max_k]
    codes = np.zeros((len(reads), 128), np.uint8)
    lengths = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
        lengths[i] = r.size
    ids = [f"read{i}" for i in range(len(reads))]
    packed = PackedReads(codes, lengths, ids)
    return seqs, recs, cfg, idx, packed, reads


@pytest.mark.parametrize("ks", [(31,), (21, 31)])
def test_candidates_match_oracle(ks):
    seqs, recs, cfg, idx, packed, reads = build_all(7, ks)
    pr, pt, ps, stats = collect_pairs(idx, packed, cfg)
    assert stats["expand_dropped"] == 0
    assert stats["candidate_spilled"] == 0
    assert stats["sketch_overflow"] == 0

    # Oracle candidates.
    from sketch_rna_tpu.oracle.reference_oracle import oracle_build_index

    oracle_idx = oracle_build_index(seqs, ks, cfg.sketch_fraction)
    read_sketches = {
        f"read{i}": {k: sketch_scalar(r, k, cfg.sketch_fraction) for k in ks}
        for i, r in enumerate(reads)
    }
    segments = oracle_sparse_chain(read_sketches, oracle_idx, ks, cfg.chain_fraction)

    got = {}
    for r, t, s in zip(pr.tolist(), pt.tolist(), ps.tolist()):
        got.setdefault(r, []).append((t, s))
    for i in range(len(reads)):
        want = sorted(segments[f"read{i}"])
        have = sorted(got.get(i, []))
        assert have == want, f"read {i}: {have} != {want}"


@pytest.mark.parametrize("ks", [(31,), (21, 31)])
def test_quant_matches_oracle(ks):
    seqs, recs, cfg, idx, packed, reads = build_all(11, ks)
    result = quantify(idx, packed, cfg)

    read_codes = {f"read{i}": r for i, r in enumerate(reads)}
    segments, o_pi, o_weighted, o_csv_tids = oracle_quant(
        seqs, read_codes, ks, cfg.sketch_fraction, cfg.chain_fraction
    )
    assert result.num_reads == len(segments)
    np.testing.assert_allclose(result.pi, o_pi, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(result.weighted_counts, o_weighted, rtol=1e-9, atol=1e-12)
    got_tids = [t for t in range(len(seqs)) if result.has_entry[t]]
    assert got_tids == o_csv_tids
    # Rank order of abundances must match exactly (BASELINE north star).
    assert np.argsort(-result.pi, kind="stable").tolist() == np.argsort(
        -o_pi, kind="stable"
    ).tolist()


def test_em_iteration_count_matches_oracle():
    # With tight convergence both implementations must stop at the same
    # iteration (the loop structure is replicated, not just the fixpoint).
    ks = (31,)
    seqs, recs, cfg, idx, packed, reads = build_all(13, ks, n_reads=120)
    import dataclasses

    cfg2 = dataclasses.replace(cfg, em_max_iterations=200, em_convergence=1e-6)
    result = quantify(idx, packed, cfg2)

    read_codes = {f"read{i}": r for i, r in enumerate(reads)}
    from sketch_rna_tpu.oracle.reference_oracle import (
        oracle_build_index,
        oracle_em,
    )

    oracle_idx = oracle_build_index(seqs, ks, cfg.sketch_fraction)
    read_sketches = {
        rid: {k: sketch_scalar(c, k, cfg.sketch_fraction) for k in ks}
        for rid, c in read_codes.items()
    }
    segments = oracle_sparse_chain(read_sketches, oracle_idx, ks, cfg.chain_fraction)
    # Count oracle iterations by replicating the loop manually.  Over
    # hundreds of iterations float64 summation-order differences
    # accumulate; tolerance reflects that (values, not semantics).
    o_pi = oracle_em(segments, len(seqs), 200, 1e-6)
    np.testing.assert_allclose(result.pi, o_pi, rtol=1e-6, atol=1e-9)
