"""Generate the bundled sample dataset (examples/sample.fa, sample.fq)
deterministically, plus the expected quant CSV (float64 EM on CPU).

The reference repo advertises a Test_Data/ directory that is absent
(SURVEY.md §4); this provides the equivalent for this framework.
Regenerate with: python examples/make_sample_data.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
HERE = os.path.dirname(os.path.abspath(__file__))


def decode(codes):
    return BASES[codes].tobytes().decode()


def main():
    rng = np.random.default_rng(420)
    from sketch_rna_tpu.utils.synth import synth_transcriptome

    seqs = synth_transcriptome(rng, 30, 200, 1200)
    names = [f"SAMPLE_T{i:03d}" for i in range(len(seqs))]

    with open(os.path.join(HERE, "sample.fa"), "w") as fh:
        for name, s in zip(names, seqs):
            fh.write(f">{name} synthetic isoform\n")
            text = decode(s)
            for i in range(0, len(text), 70):
                fh.write(text[i : i + 70] + "\n")

    reads = []
    for i in range(400):
        t = seqs[int(rng.integers(0, len(seqs)))]
        L = 100
        if t.size <= L:
            r = t.copy()
        else:
            st = int(rng.integers(0, t.size - L + 1))
            r = t[st : st + L].copy()
        errs = rng.random(r.size) < 0.005
        r[errs] = (r[errs] + rng.integers(1, 4, size=int(errs.sum()))) % 4
        reads.append(r)
    with open(os.path.join(HERE, "sample.fq"), "w") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@sample_read_{i}\n{decode(r)}\n+\n{'I' * r.size}\n")

    # Expected output (CPU float64).
    from sketch_rna_tpu.cli import main as cli_main

    idx = os.path.join(HERE, "sample.skidx.npz")
    out = os.path.join(HERE, "sample.expected.csv")
    assert cli_main(["-o", "index", "-k", "31", os.path.join(HERE, "sample.fa"), idx]) == 0
    assert cli_main(["-o", "quant", "--em-dtype", "float64",
                     idx, os.path.join(HERE, "sample.fq"), out]) == 0
    os.remove(idx)
    print("sample data written to", HERE)


if __name__ == "__main__":
    main()
