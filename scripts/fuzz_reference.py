"""Fuzz the framework against the REAL reference C++ binary.

Builds /root/reference/src against native/nthash_shim once, then loops
randomized fixtures (transcriptome shape, k set, read count/length/error
rate) through BOTH tools and requires identical CSV row sets, values
within 1e-5 (the reference prints %.6g doubles), and identical abundance
rank order.  Unlike scripts/fuzz_oracle.py (which checks against the
NumPy re-derivation at off-default parameters), the ground truth here is
the reference's own compiled code — only -k is fuzzable because every
other constant is hard-coded in the reference CLI.

Usage:  JAX_PLATFORMS=cpu python scripts/fuzz_reference.py [n_trials] [base_seed]
"""

from __future__ import annotations

import csv
import glob
import os
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REF = "/root/reference"
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import numpy as np  # noqa: E402

from util import decode, make_transcriptome, sample_reads, write_fasta, write_fastq  # noqa: E402

K_SETS = ["31", "21", "21,31", "15,25,33", "17"]


def build_reftool(workdir: str) -> str:
    exe = os.path.join(workdir, "reftool")
    cmd = [
        "g++", "-std=c++17", "-O2",
        "-include", "chrono", "-include", "algorithm",
        "-I", os.path.join(_REF, "include"),
        "-I", os.path.join(_REPO, "native", "nthash_shim"),
        *sorted(glob.glob(os.path.join(_REF, "src", "*.cpp"))),
        "-o", exe,
    ]
    subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    return exe


def _run(cmd, env=None):
    out = subprocess.run(cmd, capture_output=True, timeout=900, env=env)
    if out.returncode != 0:
        raise RuntimeError(out.stdout.decode() + out.stderr.decode())
    return out


def _read_csv(path):
    with open(path) as fh:
        rows = list(csv.reader(fh))
    return {r[0]: (float(r[1]), float(r[2])) for r in rows[1:]}


def one_trial(reftool: str, seed: int, workdir: str) -> dict:
    rng = np.random.default_rng(seed)
    ks = K_SETS[int(rng.integers(0, len(K_SETS)))]
    max_k = max(int(k) for k in ks.split(","))
    n_t = int(rng.integers(5, 40))
    seqs = make_transcriptome(rng, n=n_t, len_range=(50, 800))
    fa = os.path.join(workdir, f"f{seed}.fa")
    fq = os.path.join(workdir, f"f{seed}.fq")
    write_fasta(fa, [f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs])
    n_reads = int(rng.integers(20, 500))
    read_len = int(rng.integers(max_k, 140))
    err = float(rng.choice([0.0, 0.005, 0.02]))
    reads = [
        r
        for r in sample_reads(rng, seqs, n_reads=n_reads, read_len=read_len,
                              error_rate=err)
        if r.size >= max_k
    ]
    if not reads:
        return {"skipped": True}
    write_fastq(fq, [f"r{i}" for i in range(len(reads))], [decode(r) for r in reads])

    ridx = os.path.join(workdir, "ref.idx")
    rcsv = os.path.join(workdir, "ref.csv")
    _run([reftool, "-k", ks, "-o", "index", fa, ridx])
    _run([reftool, "-o", "quant", ridx, fq, rcsv])

    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "JAX_ENABLE_X64": "1",
                "PYTHONPATH": _REPO})
    oidx = os.path.join(workdir, "o.idx.npz")
    ocsv = os.path.join(workdir, "o.csv")
    _run([sys.executable, "-m", "sketch_rna_tpu.cli", "-o", "index",
          "-k", ks, fa, oidx], env=env)
    _run([sys.executable, "-m", "sketch_rna_tpu.cli", "-o", "quant",
          "--em-dtype", "float64", oidx, fq, ocsv], env=env)

    a = _read_csv(ocsv)
    b = _read_csv(rcsv)
    assert a.keys() == b.keys(), (
        f"row sets differ: ours-only {sorted(set(a) - set(b))[:5]}, "
        f"ref-only {sorted(set(b) - set(a))[:5]}")
    for name in a:
        np.testing.assert_allclose(a[name], b[name], rtol=1e-5, atol=1e-9,
                                   err_msg=name)
    rank_a = sorted(a, key=lambda n: (-a[n][1], n))
    rank_b = sorted(b, key=lambda n: (-b[n][1], n))
    assert rank_a == rank_b, "abundance rank order differs"
    return {"ks": ks, "n_t": len(seqs), "reads": len(reads), "err": err}


def main() -> None:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 555000
    t0 = time.time()
    with tempfile.TemporaryDirectory() as workdir:
        reftool = build_reftool(workdir)
        for i in range(n_trials):
            seed = base + i
            try:
                info = one_trial(reftool, seed, workdir)
            except Exception:
                print(f"FUZZ-VS-REFERENCE FAILURE at seed={seed}", flush=True)
                raise
            print(f"[{i + 1}/{n_trials}] seed={seed} ok {info} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    print(f"fuzz_reference: {n_trials} trials green in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
