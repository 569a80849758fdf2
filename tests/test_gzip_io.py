"""Transparent gzip input: .fa.gz / .fq.gz quantify identically to the
uncompressed files (the reference cannot read compressed inputs)."""

import gzip
import shutil

import numpy as np

from sketch_rna_tpu.cli import main as cli_main
from sketch_rna_tpu.io.fasta import load_fasta
from sketch_rna_tpu.io.fastq import load_fastq_dict

from util import decode, make_transcriptome, sample_reads, write_fasta, write_fastq


def gz(src, dst):
    with open(src, "rb") as a, gzip.open(dst, "wb") as b:
        shutil.copyfileobj(a, b)
    return str(dst)


def test_gzip_parsers_match_plain(tmp_path):
    rng = np.random.default_rng(515)
    seqs = make_transcriptome(rng, n=8, len_range=(60, 300))
    names = [f"T{i}" for i in range(len(seqs))]
    fasta = tmp_path / "r.fa"
    fq = tmp_path / "r.fq"
    write_fasta(str(fasta), names, [decode(s) for s in seqs])
    reads = sample_reads(rng, seqs, n_reads=40, read_len=80)
    write_fastq(str(fq), [f"r{i}" for i in range(len(reads))], [decode(r) for r in reads])
    fasta_gz = gz(fasta, tmp_path / "r.fa.gz")
    fq_gz = gz(fq, tmp_path / "r.fq.gz")

    a, b = load_fasta(str(fasta)), load_fasta(fasta_gz)
    assert a.names == b.names and a.seqs == b.seqs
    assert load_fastq_dict(str(fq)) == load_fastq_dict(fq_gz)


def test_gzip_end_to_end(tmp_path):
    rng = np.random.default_rng(516)
    seqs = make_transcriptome(rng, n=8, len_range=(60, 300))
    names = [f"T{i}" for i in range(len(seqs))]
    fasta = tmp_path / "r.fa"
    fq = tmp_path / "r.fq"
    write_fasta(str(fasta), names, [decode(s) for s in seqs])
    reads = sample_reads(rng, seqs, n_reads=40, read_len=80)
    write_fastq(str(fq), [f"r{i}" for i in range(len(reads))], [decode(r) for r in reads])
    fasta_gz = gz(fasta, tmp_path / "r.fa.gz")
    fq_gz = gz(fq, tmp_path / "r.fq.gz")

    idx_a, idx_b = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    out_a, out_b = str(tmp_path / "a.csv"), str(tmp_path / "b.csv")
    assert cli_main(["-o", "index", str(fasta), idx_a]) == 0
    assert cli_main(["-o", "index", fasta_gz, idx_b]) == 0
    assert cli_main(["-o", "quant", idx_a, str(fq), out_a]) == 0
    assert cli_main(["-o", "quant", idx_b, fq_gz, out_b]) == 0
    assert open(out_a).read() == open(out_b).read()
