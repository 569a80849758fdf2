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
