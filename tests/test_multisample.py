"""Multi-sample batch quant: per-sample CSVs, each identical to a
single-sample run."""

import csv
import numpy as np

from sketch_rna_tpu.cli import main as cli_main

from util import decode, make_transcriptome, sample_reads, write_fasta, write_fastq


def test_multi_sample_cli(tmp_path):
    rng = np.random.default_rng(77)
    seqs = make_transcriptome(rng, n=10, len_range=(60, 300))
    names = [f"T{i}" for i in range(len(seqs))]
    fasta = tmp_path / "ref.fa"
    write_fasta(str(fasta), names, [decode(s) for s in seqs])
    fqs = []
    for s in range(3):
        reads = sample_reads(rng, seqs, n_reads=60, read_len=80)
        fq = tmp_path / f"sample{s}.fq"
        write_fastq(str(fq), [f"s{s}_r{i}" for i in range(len(reads))], [decode(r) for r in reads])
        fqs.append(str(fq))

    idx = str(tmp_path / "ref.npz")
    assert cli_main(["-o", "index", str(fasta), idx]) == 0
    out = str(tmp_path / "out.csv")
    assert cli_main(["-o", "quant", idx, ",".join(fqs), out]) == 0

    for s in range(3):
        multi = tmp_path / f"out.sample{s}.csv"
        assert multi.exists()
        single = tmp_path / f"single{s}.csv"
        assert cli_main(["-o", "quant", idx, fqs[s], str(single)]) == 0
        with open(multi) as a, open(single) as b:
            assert a.read() == b.read()


def test_multi_sample_sharded_cli(tmp_path):
    """--sharded multi-sample: each sample runs through the multi-device
    engine and reproduces the single-device per-sample CSVs exactly."""
    rng = np.random.default_rng(78)
    seqs = make_transcriptome(rng, n=10, len_range=(60, 300))
    names = [f"T{i}" for i in range(len(seqs))]
    fasta = tmp_path / "ref.fa"
    write_fasta(str(fasta), names, [decode(s) for s in seqs])
    fqs = []
    for s in range(2):
        reads = sample_reads(rng, seqs, n_reads=70, read_len=80)
        fq = tmp_path / f"sample{s}.fq"
        write_fastq(str(fq), [f"s{s}_r{i}" for i in range(len(reads))], [decode(r) for r in reads])
        fqs.append(str(fq))

    idx = str(tmp_path / "ref.npz")
    assert cli_main(["-o", "index", str(fasta), idx]) == 0
    out = str(tmp_path / "sh.csv")
    assert cli_main(["-o", "quant", "--sharded", "--em-dtype", "float64",
                     idx, ",".join(fqs), out]) == 0
    for s in range(2):
        multi = tmp_path / f"sh.sample{s}.csv"
        assert multi.exists()
        single = tmp_path / f"sg{s}.csv"
        assert cli_main(["-o", "quant", "--em-dtype", "float64",
                         idx, fqs[s], str(single)]) == 0
        with open(multi) as a, open(single) as b:
            assert a.read() == b.read()
