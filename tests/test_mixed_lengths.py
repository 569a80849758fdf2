"""Mixed read lengths (short-read + long-read in one sample): the
length-bucketed fused path must stay oracle-exact."""

import numpy as np

from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.index.build import build_index
from sketch_rna_tpu.io.fasta import FastaRecords
from sketch_rna_tpu.io.packing import PackedReads
from sketch_rna_tpu.oracle.reference_oracle import oracle_quant
from sketch_rna_tpu.pipeline import quantify

from util import decode, make_transcriptome


def test_mixed_length_reads_match_oracle():
    rng = np.random.default_rng(606)
    seqs = make_transcriptome(rng, n=12, len_range=(400, 1600))
    recs = FastaRecords([f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs], 0)
    cfg = QuantConfig(
        kmer_lengths=(31,), batch_size=64, max_read_len=2048, em_dtype="float64",
        sketch_capacity=128,  # long reads keep ~5% of up to ~1.5k k-mers
    )
    idx = build_index(recs, cfg)

    # 60 short reads (~100 bp), 20 medium (~400), 8 long (~1.4 kb).
    reads = []
    for n, L in [(60, 100), (20, 400), (8, 1400)]:
        for _ in range(n):
            t = seqs[int(rng.integers(0, len(seqs)))]
            if t.size <= L:
                reads.append(t.copy())
            else:
                st = int(rng.integers(0, t.size - L + 1))
                reads.append(t[st : st + L].copy())
    rng.shuffle(reads)
    pad = 2048
    codes = np.zeros((len(reads), pad), np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
        lens[i] = r.size
    packed = PackedReads(codes, lens, [str(i) for i in range(len(reads))])
    result = quantify(idx, packed, cfg)

    read_codes = {f"{i}": r for i, r in enumerate(reads)}
    _, o_pi, o_weighted, o_csv = oracle_quant(seqs, read_codes, (31,))
    np.testing.assert_allclose(result.pi, o_pi, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(result.weighted_counts, o_weighted, rtol=1e-9, atol=1e-12)
    assert [t for t in range(len(seqs)) if result.has_entry[t]] == o_csv
    assert result.stats["sketch_overflow"] == 0
    assert result.stats["expand_dropped"] == 0
