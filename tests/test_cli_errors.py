"""CLI error paths mirror the reference's usage behavior
(src/main.cpp:253-273: missing positionals -> usage + exit 1)."""

import pytest

from sketch_rna_tpu.cli import main as cli_main


def test_index_missing_args(capsys):
    assert cli_main(["-o", "index", "only_one_arg"]) == 1
    assert "Usage:" in capsys.readouterr().err


def test_quant_missing_args(capsys):
    assert cli_main(["-o", "quant", "idx", "reads"]) == 1
    assert "Usage:" in capsys.readouterr().err


def test_invalid_mode_rejected():
    with pytest.raises(SystemExit):
        cli_main(["-o", "bogus", "a", "b"])


def test_quant_missing_index_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        cli_main(["-o", "quant", str(tmp_path / "nope.npz"), "r.fq", "o.csv"])


def test_kmer_list_parsing():
    from sketch_rna_tpu.cli import _parse_kmer_list

    assert _parse_kmer_list("31") == (31,)
    assert _parse_kmer_list("21,31") == (21, 31)
    assert _parse_kmer_list("21, 31,") == (21, 31)
