"""The acceptance-check CSV comparator: pass/fail behavior."""

import subprocess
import sys
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(a, b):
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "scripts", "compare_csv.py"), a, b],
        capture_output=True,
        text=True,
        timeout=60,
    )
    return r.returncode, r.stdout


def write(p, rows):
    with open(p, "w") as fh:
        fh.write("Name,NumReads,EM_Abundance\n")
        for name, nr, ab in rows:
            fh.write(f"{name},{nr},{ab}\n")
    return str(p)


def test_identical_pass(tmp_path):
    rows = [("a", 10.0, 5.0), ("b", 3.0, 1.5)]
    a = write(tmp_path / "a.csv", rows)
    rc, out = run(a, a)
    assert rc == 0 and "PASS" in out


def test_reordered_rows_pass(tmp_path):
    rows = [("a", 10.0, 5.0), ("b", 3.0, 1.5)]
    a = write(tmp_path / "a.csv", rows)
    b = write(tmp_path / "b.csv", rows[::-1])
    rc, out = run(a, b)
    assert rc == 0 and "PASS" in out


def test_rank_swap_fails(tmp_path):
    a = write(tmp_path / "a.csv", [("a", 10.0, 5.0), ("b", 3.0, 1.5)])
    b = write(tmp_path / "b.csv", [("a", 10.0, 1.5), ("b", 3.0, 5.0)])
    rc, out = run(a, b)
    assert rc == 1 and "SIGNIFICANT inversions" in out


def test_missing_row_fails(tmp_path):
    a = write(tmp_path / "a.csv", [("a", 10.0, 5.0), ("b", 3.0, 1.5)])
    b = write(tmp_path / "b.csv", [("a", 10.0, 5.0)])
    rc, out = run(a, b)
    assert rc == 1 and "ROW SET MISMATCH" in out


def test_small_value_drift_passes(tmp_path):
    a = write(tmp_path / "a.csv", [("a", 10.0, 5.0), ("b", 3.0, 1.5)])
    b = write(tmp_path / "b.csv", [("a", 10.00001, 5.000001), ("b", 3.0, 1.5)])
    rc, out = run(a, b)
    assert rc == 0 and "PASS" in out
