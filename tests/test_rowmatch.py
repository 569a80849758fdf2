"""Row-parallel match path vs the global-sort path and the oracle:
identical candidate tables (same reads, tids, scores, masks)."""

import numpy as np
import pytest
import jax.numpy as jnp

from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.index.build import build_index
from sketch_rna_tpu.io.fasta import FastaRecords
from sketch_rna_tpu.match.candidates import match_batch
from sketch_rna_tpu.match.rowmatch import row_match
from sketch_rna_tpu.pipeline import _padded_index_arrays
from sketch_rna_tpu.sketch.fracminhash import sketch_batch

from util import decode, make_transcriptome, sample_reads


def build(seed, ks, n_reads=200):
    rng = np.random.default_rng(seed)
    seqs = make_transcriptome(rng, n=20, len_range=(60, 600))
    recs = FastaRecords([f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs], 0)
    cfg = QuantConfig(kmer_lengths=ks)
    idx = build_index(recs, cfg)
    reads = [r for r in sample_reads(rng, seqs, n_reads=n_reads, read_len=100) if r.size >= max(ks)]
    B = len(reads)
    codes = np.zeros((B, 128), np.uint8)
    lengths = np.zeros(B, np.int32)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
        lengths[i] = r.size
    return cfg, idx, codes, lengths


@pytest.mark.slow  # cross-check vs the legacy global-sort matcher
@pytest.mark.parametrize("ks", [(31,), (21, 31)])
def test_rowmatch_equals_global_sort_path(ks):
    cfg, idx, codes, lengths = build(5, ks)
    keys, row_ptr, postings = _padded_index_arrays(idx, ks)
    keys = [jnp.asarray(a) for a in keys]
    row_ptr = [jnp.asarray(a) for a in row_ptr]
    postings = [jnp.asarray(a) for a in postings]
    caps = [cfg.sketch_capacity_for(k) for k in ks]
    hashes, masks = [], []
    for k, cap in zip(ks, caps):
        h, m, _ = sketch_batch(jnp.asarray(codes), jnp.asarray(lengths), k, cfg.sketch_fraction, cap)
        hashes.append(h)
        masks.append(m)

    a = match_batch(
        hashes, masks, keys, row_ptr, postings,
        chain_fraction=cfg.chain_fraction,
        expand_per_read=cfg.expand_per_read,
        candidate_capacity=cfg.candidate_capacity,
    )
    b = row_match(
        hashes, masks, keys, row_ptr, postings,
        chain_fraction=cfg.chain_fraction,
        events_per_read=cfg.expand_per_read,
        candidate_capacity=cfg.candidate_capacity,
    )
    assert int(jnp.sum(a.stats["expand_dropped"])) == 0
    assert int(jnp.sum(b.stats["expand_dropped"])) == 0
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    np.testing.assert_array_equal(np.asarray(a.tid), np.asarray(b.tid))
    np.testing.assert_array_equal(np.asarray(a.score), np.asarray(b.score))


def test_rowmatch_overflow_counted():
    # Tiny per-read budget must report drops, not crash or lie.
    ks = (31,)
    cfg, idx, codes, lengths = build(6, ks, n_reads=50)
    keys, row_ptr, postings = _padded_index_arrays(idx, ks)
    caps = [cfg.sketch_capacity_for(k) for k in ks]
    h, m, _ = sketch_batch(jnp.asarray(codes), jnp.asarray(lengths), 31, cfg.sketch_fraction, caps[0])
    r = row_match(
        [h], [m],
        [jnp.asarray(keys[0])], [jnp.asarray(row_ptr[0])], [jnp.asarray(postings[0])],
        chain_fraction=cfg.chain_fraction,
        events_per_read=2,
        candidate_capacity=cfg.candidate_capacity,
    )
    assert int(jnp.sum(r.stats["expand_dropped"])) > 0


def test_sort_event_parts_bit_identical_to_full_sort():
    """Per-k sorts + bitonic merge must equal sorting the concatenation
    (grouping input invariance) across pow2/odd widths and part counts."""
    from sketch_rna_tpu.match.rowmatch import sort_event_parts

    rng = np.random.default_rng(0)
    for B, w, K in [(64, 8, 2), (32, 16, 2), (16, 64, 4), (4, 32, 8), (5, 7, 3), (6, 8, 3)]:
        parts = [
            jnp.asarray(rng.integers(0, 2**31, size=(B, w), dtype=np.int32))
            for _ in range(K)
        ]
        got = np.asarray(sort_event_parts(parts))
        want = np.sort(np.concatenate([np.asarray(p) for p in parts], axis=1), axis=1)
        assert (got == want).all(), (B, w, K)


def test_combine_k_tables_equals_event_grouping():
    """Per-k K=1 grouping + table intersection must reproduce the K-wide
    event grouping exactly when per-k capacities cover every passing set
    (the production sizing guarantees this: Ck = min(2C, pow2(w)))."""
    from sketch_rna_tpu.match.rowmatch import (
        combine_k_tables,
        row_events_to_candidates,
    )

    rng = np.random.default_rng(7)
    B, w, K, T, C = 48, 24, 2, 12, 8
    # random per-k event keys over few tids so intersections are dense;
    # sentinel-fill a random tail per row (variable event counts)
    parts = []
    for _ in range(K):
        ev = rng.integers(0, T, size=(B, w)).astype(np.int32)
        n = rng.integers(0, w + 1, size=(B, 1))
        ev = np.where(np.arange(w)[None, :] < n, ev, np.int32(2**31 - 1))
        parts.append(ev)
    # ground truth: the K-wide packed-key grouping (old path)
    packed = [
        np.where(p != 2**31 - 1, p * K + ki, np.int32(2**31 - 1))
        for ki, p in enumerate(parts)
    ]
    want = row_events_to_candidates(
        jnp.asarray(np.concatenate(packed, axis=1)),
        num_k=K,
        chain_fraction=0.9,
        candidate_capacity=C,
        num_transcripts=T,
    )
    # per-k grouping at full coverage (capacity >= T passing tids)
    res_k = [
        row_events_to_candidates(
            jnp.asarray(p),
            num_k=1,
            chain_fraction=0.9,
            candidate_capacity=16,
            num_transcripts=T,
        )
        for p in parts
    ]
    got = combine_k_tables(
        [r.tid for r in res_k],
        [r.score for r in res_k],
        [r.mask for r in res_k],
        candidate_capacity=C,
        score_bound=K * w,
        num_transcripts=T,
    )
    assert np.array_equal(np.asarray(got.mask), np.asarray(want.mask))
    assert np.array_equal(
        np.asarray(jnp.where(got.mask, got.tid, 0)),
        np.asarray(jnp.where(want.mask, want.tid, 0)),
    )
    assert np.array_equal(
        np.asarray(jnp.where(got.mask, got.score, 0)),
        np.asarray(jnp.where(want.mask, want.score, 0)),
    )


def test_per_k_expansion_budgets_match_global():
    """row_match with per-k budget tuples equals the int budget when
    both cover the data (per-k budgets only shrink padded lanes)."""
    cfg, idx, codes, lengths = build(11, (21, 31), n_reads=120)
    keys, row_ptr, postings = _padded_index_arrays(idx, (21, 31))
    keys = [jnp.asarray(a) for a in keys]
    row_ptr = [jnp.asarray(a) for a in row_ptr]
    postings = [jnp.asarray(a) for a in postings]
    hashes, masks = [], []
    for k in (21, 31):
        h, m, _ = sketch_batch(
            jnp.asarray(codes), jnp.asarray(lengths), k,
            cfg.sketch_fraction, cfg.sketch_capacity_for(k),
        )
        hashes.append(h)
        masks.append(m)
    kw = dict(chain_fraction=0.9, candidate_capacity=16, num_transcripts=idx.num_transcripts)
    a = row_match(hashes, masks, keys, row_ptr, postings, events_per_read=256, **kw)
    b = row_match(hashes, masks, keys, row_ptr, postings, events_per_read=(256, 128), **kw)
    assert int(np.asarray(b.stats["expand_dropped"]).sum()) == 0
    assert np.array_equal(np.asarray(a.tid), np.asarray(b.tid))
    assert np.array_equal(np.asarray(a.score), np.asarray(b.score))
    assert np.array_equal(np.asarray(a.mask), np.asarray(b.mask))


def test_flat_path_accepts_per_k_budgets():
    """Regression (round-5 review finding): the non-tiered match branch
    crashed with TypeError when expand_per_read_k was set (the fused
    engine's flat-rerun -> per-k-retry chain reaches that state)."""
    import dataclasses

    from sketch_rna_tpu.io.packing import PackedReads
    from sketch_rna_tpu.pipeline import quantify

    cfg, idx, codes, lengths = build(13, (21, 31), n_reads=80)
    packed = PackedReads(codes, lengths, [])
    base = dataclasses.replace(cfg, match_tiers=False)
    r1 = quantify(idx, packed, base)
    r2 = quantify(
        idx, packed, dataclasses.replace(base, expand_per_read_k=(256, 128))
    )
    assert int(np.asarray(r2.stats.get("expand_dropped", 0)).sum()) == 0
    np.testing.assert_allclose(r2.pi, r1.pi, rtol=1e-6)
    np.testing.assert_allclose(r2.weighted_counts, r1.weighted_counts, rtol=1e-6)


def test_merged_grouping_mode_matches_per_k():
    """match_per_k_tables=False (the exact spill fallback) must agree
    with the default per-k mode when nothing spills."""
    import dataclasses

    from sketch_rna_tpu.io.packing import PackedReads
    from sketch_rna_tpu.pipeline import quantify

    cfg, idx, codes, lengths = build(17, (21, 31), n_reads=100)
    packed = PackedReads(codes, lengths, [])
    r1 = quantify(idx, packed, cfg)
    r2 = quantify(idx, packed, dataclasses.replace(cfg, match_per_k_tables=False))
    np.testing.assert_allclose(r2.pi, r1.pi, rtol=1e-6)
    np.testing.assert_allclose(r2.weighted_counts, r1.weighted_counts, rtol=1e-6)


def test_per_k_spill_triggers_merged_grouping_retry():
    """Adversarial case for PARITY deviation 7: 300 transcripts share an
    80-base core, so a core-read's k=15 passing set (300) exceeds the
    per-k table capacity (2*C = 16 at C=8).  The per-k engine must
    detect the spill and rerun with the merged K-wide grouping —
    asserted by exact equality with a forced merged-mode run."""
    import dataclasses

    from sketch_rna_tpu.io.packing import PackedReads
    from sketch_rna_tpu.pipeline import quantify

    rng = np.random.default_rng(3)
    core = rng.integers(0, 4, 80).astype(np.uint8)
    seqs = [
        np.concatenate([core, rng.integers(0, 4, 60).astype(np.uint8)])
        for _ in range(300)
    ]
    recs = FastaRecords(
        [f"T{i:04d}" for i in range(300)], [decode(s) for s in seqs], 0
    )
    cfg = QuantConfig(
        kmer_lengths=(15, 31),
        candidate_capacity=8,
        batch_size=64,
        max_read_len=128,
        em_dtype="float64",
    )
    idx = build_index(recs, cfg)
    B = 32
    codes = np.zeros((B, 128), np.uint8)
    codes[:, :70] = core[:70]
    lengths = np.full(B, 70, np.int32)
    packed = PackedReads(codes, lengths, [])
    r1 = quantify(idx, packed, cfg)
    r2 = quantify(
        idx, packed, dataclasses.replace(cfg, match_per_k_tables=False)
    )
    # the merged fallback still truncates the FINAL set at C (the
    # documented cap), so spill stays counted — but results must be
    # exactly the merged-mode semantics
    assert int(np.asarray(r1.stats["candidate_spilled"]).sum()) > 0
    np.testing.assert_array_equal(r1.pi, r2.pi)
    np.testing.assert_array_equal(r1.weighted_counts, r2.weighted_counts)
