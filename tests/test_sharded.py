"""Multi-device sharded quant on the virtual 8-CPU mesh vs the
single-device pipeline: identical pi / counts / CSV membership
(SURVEY.md §4 "Multi-host without a cluster")."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.dist.mesh import make_mesh, mesh_factor
from sketch_rna_tpu.dist.quant_sharded import quant_step_sharded
from sketch_rna_tpu.index.build import build_index
from sketch_rna_tpu.index.shard import shard_index_arrays
from sketch_rna_tpu.io.fasta import FastaRecords
from sketch_rna_tpu.io.packing import PackedReads
from sketch_rna_tpu.pipeline import quantify

from util import decode, make_transcriptome, sample_reads


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(99)
    seqs = make_transcriptome(rng, n=14, len_range=(60, 400))
    names = [f"T{i:03d}" for i in range(len(seqs))]
    recs = FastaRecords(names, [decode(s) for s in seqs], 0)
    ks = (21, 31)
    cfg = QuantConfig(
        kmer_lengths=ks, batch_size=128, max_read_len=128, em_dtype="float64",
        expand_per_read=128, candidate_capacity=32,
    )
    idx = build_index(recs, cfg)
    reads = [r for r in sample_reads(rng, seqs, n_reads=120, read_len=100) if r.size >= 31]
    codes = np.zeros((len(reads), 128), np.uint8)
    lengths = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
        lengths[i] = r.size
    packed = PackedReads(codes, lengths, [f"r{i}" for i in range(len(reads))])
    return cfg, idx, packed


def test_mesh_factor():
    assert mesh_factor(8) == (4, 2)
    assert mesh_factor(2) == (2, 1)
    assert mesh_factor(1) == (1, 1)
    # Generalized index axis: grows while it divides the device count,
    # stays under the cap, and data parallelism still dominates.
    assert mesh_factor(16, max_index_shards=4) == (4, 4)
    assert mesh_factor(8, max_index_shards=4) == (4, 2)
    assert mesh_factor(32, max_index_shards=8) == (8, 4)
    assert mesh_factor(6, max_index_shards=4) == (3, 2)


def test_mesh_factor_auto_widens_for_big_index():
    gib = 1 << 30
    # A replica that fits the budget: the balanced default wins.
    assert mesh_factor(8, index_bytes=1 * gib, hbm_budget_bytes=4 * gib) == (4, 2)
    # 12 GiB replica / 4 GiB budget: fit needs >= 4 shards even though
    # that shrinks the data axis below the index axis.
    assert mesh_factor(8, index_bytes=12 * gib, hbm_budget_bytes=4 * gib) == (2, 4)
    # Enormous index: widen all the way to index-only.
    assert mesh_factor(8, index_bytes=60 * gib, hbm_budget_bytes=4 * gib) == (1, 8)
    # Widening never exceeds the device count (fits-or-not, 1 device).
    assert mesh_factor(1, index_bytes=60 * gib, hbm_budget_bytes=4 * gib) == (1, 1)
    # Non-pow2 device counts widen through divisors (3 shards fit here).
    assert mesh_factor(6, index_bytes=12 * gib, hbm_budget_bytes=4 * gib) == (2, 3)


def test_index_device_bytes(problem):
    from sketch_rna_tpu.dist.mesh import index_device_bytes

    _, idx, _ = problem
    b = index_device_bytes(idx)
    # Two k tables at >= 1024 buckets x 3 lanes x 4 bytes each.
    assert b >= 2 * 1024 * 3 * 4
    # The estimate must reflect build_bucket_table's REAL shapes.
    from sketch_rna_tpu.match.bucket_lookup import (
        build_bucket_table,
        bucket_table_shape,
    )

    for k in idx.kmer_lengths:
        ki = idx.per_k[k]
        bt = build_bucket_table(ki.keys, ki.row_ptr)
        nb, mb, shift = bucket_table_shape(ki.keys)
        assert bt.packed.shape == (nb, 3 * mb)
        assert (bt.shift, bt.mb) == (shift, mb)


@pytest.mark.parametrize("shape", [(4, 2), (8, 1), (2, 2), (2, 4), (1, 8)])
def test_sharded_matches_single_device(problem, shape):
    cfg, idx, packed = problem
    dp, ip = shape
    if dp * ip > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = make_mesh(dp, ip)

    # Pad batch rows to a multiple of dp.
    B = ((packed.num_reads + dp - 1) // dp) * dp
    codes = np.zeros((B, packed.padded_len), np.uint8)
    lengths = np.zeros(B, np.int32)
    codes[: packed.num_reads] = packed.codes
    lengths[: packed.num_reads] = packed.lengths

    shards = shard_index_arrays(idx, ip)
    ks = tuple(idx.kmer_lengths)
    keys = tuple(jnp.asarray(shards[k][0]) for k in ks)
    row_ptr = tuple(jnp.asarray(shards[k][1]) for k in ks)
    postings = tuple(jnp.asarray(shards[k][2]) for k in ks)
    caps = tuple(cfg.sketch_capacity_for(k) for k in ks)

    pi, weighted, has_entry, iters, stats = quant_step_sharded(
        jnp.asarray(codes),
        jnp.asarray(lengths),
        keys,
        row_ptr,
        postings,
        jnp.asarray(packed.num_reads, jnp.int32),
        mesh=mesh,
        kmer_lengths=ks,
        sketch_fraction=cfg.sketch_fraction,
        sketch_caps=caps,
        chain_fraction=cfg.chain_fraction,
        expand_per_read=cfg.expand_per_read,
        candidate_capacity=cfg.candidate_capacity,
        num_transcripts=idx.num_transcripts,
        em_dtype="float64",
    )

    ref = quantify(idx, packed, cfg)
    assert int(stats["expand_dropped"].sum()) == 0
    assert int(stats["candidate_spilled"]) == 0
    np.testing.assert_allclose(np.asarray(pi), ref.pi, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(weighted), ref.weighted_counts, rtol=1e-12, atol=1e-14)
    np.testing.assert_array_equal(np.asarray(has_entry), ref.has_entry)
    assert int(iters) == ref.em_iterations


def test_sharded_matches_single_midscale():
    """Mid-scale multi-k sharded equality (beyond the tiny fixture)."""
    rng = np.random.default_rng(4242)
    seqs = make_transcriptome(rng, n=100, len_range=(100, 600))
    recs = FastaRecords([f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs], 0)
    cfg = QuantConfig(kmer_lengths=(21, 31), batch_size=1024, max_read_len=128,
                      em_dtype="float64", expand_per_read=128, candidate_capacity=32)
    idx = build_index(recs, cfg)
    reads = [r for r in sample_reads(rng, seqs, n_reads=4096, read_len=100) if r.size >= 31]
    codes = np.zeros((len(reads), 128), np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
        lens[i] = r.size
    packed = PackedReads(codes, lens, [str(i) for i in range(len(reads))])

    from sketch_rna_tpu.pipeline import quantify_sharded

    a = quantify(idx, packed, cfg)
    b = quantify_sharded(idx, packed, cfg)
    np.testing.assert_allclose(a.pi, b.pi, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(a.weighted_counts, b.weighted_counts, rtol=1e-12, atol=1e-14)
    np.testing.assert_array_equal(a.has_entry, b.has_entry)
