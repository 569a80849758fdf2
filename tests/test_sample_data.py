"""Bundled sample dataset: quant reproduces the checked-in expected CSV."""

import os

from sketch_rna_tpu.cli import main as cli_main

HERE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")


def test_sample_quant_reproduces_expected(tmp_path):
    idx = str(tmp_path / "sample.npz")
    out = str(tmp_path / "sample.csv")
    assert cli_main(["-o", "index", "-k", "31", os.path.join(HERE, "sample.fa"), idx]) == 0
    assert cli_main(["-o", "quant", "--em-dtype", "float64",
                     idx, os.path.join(HERE, "sample.fq"), out]) == 0
    with open(out) as a, open(os.path.join(HERE, "sample.expected.csv")) as b:
        assert a.read() == b.read()
