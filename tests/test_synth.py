"""Device-side synthetic read sampler: reads are genuine transcript
substrings with correct lengths and padding."""

import numpy as np

from sketch_rna_tpu.utils.synth import sample_reads_device, synth_transcriptome


def test_sampled_reads_are_substrings(rng):
    seqs = synth_transcriptome(rng, 10, 120, 400)
    codes, lens = sample_reads_device(seqs, 50, 100, 128, seed=3)
    codes = np.asarray(codes)
    lens = np.asarray(lens)
    assert codes.shape == (50, 128)
    big = "".join("ACGT"[c] for s in seqs for c in s)
    cat = {}
    for s in seqs:
        t = "".join("ACGT"[c] for c in s)
        cat[t] = True
    joined = ["".join("ACGT"[c] for c in s) for s in seqs]
    for i in range(50):
        L = int(lens[i])
        assert 0 < L <= 100
        read = "".join("ACGT"[c] for c in codes[i, :L])
        assert any(read in t for t in joined), f"read {i} not a substring"
        # padding is zeros
        assert (codes[i, L:] == 0).all()


def test_sampler_deterministic(rng):
    seqs = synth_transcriptome(rng, 5, 120, 300)
    a = np.asarray(sample_reads_device(seqs, 20, 80, 128, seed=9)[0])
    b = np.asarray(sample_reads_device(seqs, 20, 80, 128, seed=9)[0])
    np.testing.assert_array_equal(a, b)
