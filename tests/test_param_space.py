"""Non-default algorithm parameters: pipeline stays oracle-exact when
the fractions/constants move off the reference defaults."""

import numpy as np
import pytest

from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.index.build import build_index
from sketch_rna_tpu.io.fasta import FastaRecords
from sketch_rna_tpu.io.packing import PackedReads
from sketch_rna_tpu.oracle.reference_oracle import oracle_quant
from sketch_rna_tpu.pipeline import quantify

from util import decode, make_transcriptome, sample_reads


@pytest.mark.parametrize(
    "sketch_fraction,chain_fraction,em_iters",
    [
        (0.1, 0.5, 20),
        (0.02, 0.9, 5),
        (0.05, 0.75, 20),  # 3/4: exact rational path
        (0.05, 0.833, 20),  # not a small rational: float compare path
    ],
)
def test_quant_matches_oracle_offdefault(sketch_fraction, chain_fraction, em_iters):
    rng = np.random.default_rng(hash((sketch_fraction, chain_fraction)) % 2**31)
    seqs = make_transcriptome(rng, n=14, len_range=(60, 500))
    recs = FastaRecords([f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs], 0)
    cfg = QuantConfig(
        kmer_lengths=(31,),
        sketch_fraction=sketch_fraction,
        chain_fraction=chain_fraction,
        em_max_iterations=em_iters,
        batch_size=64,
        max_read_len=128,
        em_dtype="float64",
    )
    idx = build_index(recs, cfg)
    reads = [r for r in sample_reads(rng, seqs, n_reads=150, read_len=100) if r.size >= 31]
    codes = np.zeros((len(reads), 128), np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
        lens[i] = r.size
    packed = PackedReads(codes, lens, [str(i) for i in range(len(reads))])
    result = quantify(idx, packed, cfg)

    read_codes = {f"{i}": r for i, r in enumerate(reads)}
    _, o_pi, o_weighted, o_csv = oracle_quant(
        seqs,
        read_codes,
        (31,),
        sketch_fraction=sketch_fraction,
        chain_fraction=chain_fraction,
        em_max_iterations=em_iters,
    )
    np.testing.assert_allclose(result.pi, o_pi, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(result.weighted_counts, o_weighted, rtol=1e-9, atol=1e-12)
    assert [t for t in range(len(seqs)) if result.has_entry[t]] == o_csv


@pytest.mark.parametrize("seed", [11, 222, 3333, 44444])
def test_quant_matches_oracle_random_seeds(seed):
    """Seed-sweep fuzz: randomized transcriptome shape, k set, read
    count and read length stay oracle-exact in float64.  (Short/invalid
    read handling is covered by the IO and end-to-end tests.)"""
    rng = np.random.default_rng(seed)
    ks = (31,) if rng.random() < 0.5 else (21, 31)
    n_t = int(rng.integers(6, 24))
    seqs = make_transcriptome(rng, n=n_t, len_range=(50, 700))
    recs = FastaRecords(
        [f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs], 0
    )
    cfg = QuantConfig(
        kmer_lengths=ks,
        batch_size=64,
        max_read_len=128,
        em_dtype="float64",
    )
    idx = build_index(recs, cfg)
    n_reads = int(rng.integers(40, 220))
    read_len = int(rng.integers(max(ks), 120))
    reads = [
        r for r in sample_reads(rng, seqs, n_reads=n_reads, read_len=read_len)
        if r.size >= max(ks)
    ]
    if not reads:
        pytest.skip("degenerate draw")
    codes = np.zeros((len(reads), 128), np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
        lens[i] = r.size
    packed = PackedReads(codes, lens, [str(i) for i in range(len(reads))])
    result = quantify(idx, packed, cfg)
    read_codes = {f"{i}": r for i, r in enumerate(reads)}
    _, o_pi, o_weighted, o_csv = oracle_quant(seqs, read_codes, ks)
    np.testing.assert_allclose(result.pi, o_pi, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(
        result.weighted_counts, o_weighted, rtol=1e-9, atol=1e-12
    )
    assert [t for t in range(len(seqs)) if result.has_entry[t]] == o_csv
