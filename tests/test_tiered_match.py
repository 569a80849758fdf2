"""Tiered event-window matching == flat-window matching (bit-exact).

The tiered path (match/rowmatch.py tier_plan + row_match_runs_tiered)
sorts batch rows by event count and sizes each tier's expansion window
to its rank; with no spills it must reproduce the flat expand_per_read
window exactly, modulo the row permutation it reports.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.index.build import build_index
from sketch_rna_tpu.io.fasta import FastaRecords
from sketch_rna_tpu.match.rowmatch import tier_plan
from sketch_rna_tpu.pipeline import _device_index, sketch_match_step
from sketch_rna_tpu.utils.synth import synth_transcriptome


def test_tier_plan_covers_batch():
    for B in (1024, 2048, 8192, 1536):
        for epr in (64, 128, 256, 512):
            for tw in ((16, 64), (32, 32), (64, 256), (256, 256)):
                plan = tier_plan(B, epr, tw)
                assert sum(rows for rows, _ in plan) == B
                widths = [w for _, w in plan]
                assert widths[-1] == epr  # tail always gets the full budget
                assert widths == sorted(widths)
                assert len(set(widths)) == len(widths)  # merged duplicates
    # Small batches stay flat.
    assert tier_plan(512, 256) == ((512, 256),)
    # Calibrated widths at/above the budget collapse to one flat tier.
    assert tier_plan(8192, 32, (32, 64)) == ((8192, 32),)


@pytest.fixture(scope="module")
def tiered_problem():
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seqs = synth_transcriptome(rng, 80, 200, 500)
    recs = FastaRecords(
        [f"T{i}" for i in range(len(seqs))],
        [bases[s].tobytes().decode() for s in seqs],
        0,
    )
    cfg = QuantConfig(kmer_lengths=(21, 31), batch_size=1024, max_read_len=128)
    idx = build_index(recs, cfg)
    B, L = 1024, 128
    codes = np.zeros((B, L), np.uint8)
    lengths = np.zeros(B, np.int32)
    for i in range(B):
        s = seqs[rng.integers(len(seqs))]
        ln = int(rng.integers(40, 120))
        st = int(rng.integers(0, max(len(s) - ln, 1)))
        sub = s[st : st + ln]
        codes[i, : len(sub)] = sub
        lengths[i] = len(sub)
    return cfg, idx, codes, lengths


def test_tiered_equals_flat(tiered_problem):
    cfg, idx, codes, lengths = tiered_problem
    ks = tuple(idx.kmer_lengths)
    caps = tuple(cfg.sketch_capacity_for(k, 128) for k in ks)
    bp, post, meta = _device_index(idx, ks)
    kw = dict(
        kmer_lengths=ks,
        sketch_fraction=cfg.sketch_fraction,
        sketch_caps=caps,
        chain_fraction=cfg.chain_fraction,
        expand_per_read=cfg.expand_per_read,
        candidate_capacity=cfg.candidate_capacity,
        bucket_meta=meta,
        num_transcripts=idx.num_transcripts,
    )
    t0, s0, m0, st0 = sketch_match_step(
        jnp.asarray(codes), jnp.asarray(lengths), bp, post, match_tiers=False, **kw
    )
    t1, s1, m1, st1 = sketch_match_step(
        jnp.asarray(codes),
        jnp.asarray(lengths),
        bp,
        post,
        match_tiers=True,
        restore_order=True,
        **kw,
    )
    t0, s0, m0 = np.asarray(t0), np.asarray(s0), np.asarray(m0)
    t1, s1, m1 = np.asarray(t1), np.asarray(s1), np.asarray(m1)
    assert int(np.asarray(st1["expand_dropped"]).sum()) == 0
    assert (m0 == m1).all()
    assert (np.where(m0, t0, 0) == np.where(m1, t1, 0)).all()
    assert (np.where(m0, s0, 0) == np.where(m1, s1, 0)).all()


def test_tiered_unordered_matches_flat_as_bag(tiered_problem):
    """Without restore_order the tables are a row permutation of flat."""
    cfg, idx, codes, lengths = tiered_problem
    ks = tuple(idx.kmer_lengths)
    caps = tuple(cfg.sketch_capacity_for(k, 128) for k in ks)
    bp, post, meta = _device_index(idx, ks)
    kw = dict(
        kmer_lengths=ks,
        sketch_fraction=cfg.sketch_fraction,
        sketch_caps=caps,
        chain_fraction=cfg.chain_fraction,
        expand_per_read=cfg.expand_per_read,
        candidate_capacity=cfg.candidate_capacity,
        bucket_meta=meta,
        num_transcripts=idx.num_transcripts,
    )
    t0, s0, m0, _ = sketch_match_step(
        jnp.asarray(codes), jnp.asarray(lengths), bp, post, match_tiers=False, **kw
    )
    t1, s1, m1, _ = sketch_match_step(
        jnp.asarray(codes), jnp.asarray(lengths), bp, post, match_tiers=True, **kw
    )

    def rows_as_bag(t, s, m):
        t, s, m = np.asarray(t), np.asarray(s), np.asarray(m)
        rows = [
            tuple(zip(t[i][m[i]].tolist(), s[i][m[i]].tolist()))
            for i in range(t.shape[0])
        ]
        return sorted(rows)

    assert rows_as_bag(t0, s0, m0) == rows_as_bag(t1, s1, m1)


def test_probe_tiered_equals_flat(tiered_problem):
    """Tiered bucket probe (probe_width) == flat full-capacity probe,
    bit-exact after restore_order, with zero spills when the width
    covers the batch's kept-hash counts."""
    cfg, idx, codes, lengths = tiered_problem
    ks = tuple(idx.kmer_lengths)
    caps = tuple(cfg.sketch_capacity_for(k, 128) for k in ks)
    bp, post, meta = _device_index(idx, ks)
    kw = dict(
        kmer_lengths=ks,
        sketch_fraction=cfg.sketch_fraction,
        sketch_caps=caps,
        chain_fraction=cfg.chain_fraction,
        expand_per_read=cfg.expand_per_read,
        candidate_capacity=cfg.candidate_capacity,
        bucket_meta=meta,
        num_transcripts=idx.num_transcripts,
    )
    t0, s0, m0, _ = sketch_match_step(
        jnp.asarray(codes), jnp.asarray(lengths), bp, post, match_tiers=False, **kw
    )
    # Width covering the dataset (reads <= 120 bp, ~5% kept): 16 lanes.
    t1, s1, m1, st1 = sketch_match_step(
        jnp.asarray(codes),
        jnp.asarray(lengths),
        bp,
        post,
        match_tiers=True,
        restore_order=True,
        probe_width=16,
        **kw,
    )
    t0, s0, m0 = np.asarray(t0), np.asarray(s0), np.asarray(m0)
    t1, s1, m1 = np.asarray(t1), np.asarray(s1), np.asarray(m1)
    assert int(np.asarray(st1["expand_dropped_pretail"])) == 0
    assert (m0 == m1).all()
    assert (np.where(m0, t0, 0) == np.where(m1, t1, 0)).all()
    assert (np.where(m0, s0, 0) == np.where(m1, s1, 0)).all()


def test_probe_tiered_undersized_width_spills(tiered_problem):
    """A probe window smaller than the batch's kept counts must report
    pretail spills (the callers' trigger for the exact flat rerun)."""
    cfg, idx, codes, lengths = tiered_problem
    ks = tuple(idx.kmer_lengths)
    caps = tuple(cfg.sketch_capacity_for(k, 128) for k in ks)
    bp, post, meta = _device_index(idx, ks)
    _, _, _, st = sketch_match_step(
        jnp.asarray(codes),
        jnp.asarray(lengths),
        bp,
        post,
        kmer_lengths=ks,
        sketch_fraction=cfg.sketch_fraction,
        sketch_caps=caps,
        chain_fraction=cfg.chain_fraction,
        expand_per_read=cfg.expand_per_read,
        candidate_capacity=cfg.candidate_capacity,
        bucket_meta=meta,
        num_transcripts=idx.num_transcripts,
        match_tiers=True,
        probe_width=1,
    )
    assert int(np.asarray(st["expand_dropped_pretail"])) > 0
