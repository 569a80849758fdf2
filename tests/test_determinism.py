"""Determinism: identical inputs must produce byte-identical CSVs across
runs (the reference's output order is platform-nondeterministic, quirk
Q4 — ours must never be)."""

import numpy as np

from sketch_rna_tpu.cli import main as cli_main

from util import decode, make_transcriptome, sample_reads, write_fasta, write_fastq


def test_repeated_quant_byte_identical(tmp_path):
    rng = np.random.default_rng(31415)
    seqs = make_transcriptome(rng, n=10, len_range=(60, 300))
    names = [f"T{i}" for i in range(len(seqs))]
    fasta = tmp_path / "d.fa"
    fq = tmp_path / "d.fq"
    write_fasta(str(fasta), names, [decode(s) for s in seqs])
    reads = sample_reads(rng, seqs, n_reads=80, read_len=80)
    write_fastq(str(fq), [f"r{i}" for i in range(len(reads))], [decode(r) for r in reads])

    idx1 = str(tmp_path / "a.npz")
    idx2 = str(tmp_path / "b.npz")
    assert cli_main(["-o", "index", str(fasta), idx1]) == 0
    assert cli_main(["-o", "index", str(fasta), idx2]) == 0

    outs = []
    for i, idx in enumerate([idx1, idx2, idx1]):
        out = str(tmp_path / f"o{i}.csv")
        assert cli_main(["-o", "quant", idx, str(fq), out]) == 0
        outs.append(open(out).read())
    assert outs[0] == outs[1] == outs[2]
    assert outs[0].startswith("Name,NumReads,EM_Abundance\n")
