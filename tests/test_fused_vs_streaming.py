"""The fused single-program path and the streaming host-collection path
must produce identical results."""

import numpy as np

import sketch_rna_tpu.pipeline as pl
from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.index.build import build_index
from sketch_rna_tpu.io.fasta import FastaRecords
from sketch_rna_tpu.io.packing import PackedReads

from util import decode, make_transcriptome, sample_reads


def test_fused_equals_streaming(monkeypatch):
    rng = np.random.default_rng(321)
    seqs = make_transcriptome(rng, n=15, len_range=(60, 500))
    recs = FastaRecords([f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs], 0)
    cfg = QuantConfig(kmer_lengths=(31,), batch_size=64, max_read_len=128, em_dtype="float64")
    idx = build_index(recs, cfg)
    reads = [r for r in sample_reads(rng, seqs, n_reads=150, read_len=100) if r.size >= 31]
    codes = np.zeros((len(reads), 128), np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
        lens[i] = r.size
    packed = PackedReads(codes, lens, [str(i) for i in range(len(reads))])

    fused = pl.quantify(idx, packed, cfg)
    monkeypatch.setattr(pl, "FUSED_MAX_PADDED_READS", 0)
    streaming = pl.quantify(idx, packed, cfg)

    np.testing.assert_allclose(fused.pi, streaming.pi, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(
        fused.weighted_counts, streaming.weighted_counts, rtol=1e-12, atol=1e-14
    )
    np.testing.assert_array_equal(fused.has_entry, streaming.has_entry)
    assert fused.em_iterations == streaming.em_iterations


def test_streamed_compaction_exact(monkeypatch):
    """Tiny class buffer forces in-scan compaction every few batches;
    results must still match the fused path exactly (class reduction is
    an exact transformation)."""
    import dataclasses

    rng = np.random.default_rng(99)
    seqs = make_transcriptome(rng, n=10, len_range=(80, 400))
    recs = FastaRecords([f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs], 0)
    cfg = QuantConfig(
        kmer_lengths=(31,),
        batch_size=64,
        max_read_len=128,
        em_dtype="float64",
        stream_class_capacity=128,  # max(128, 2*B) -> compact constantly
        stream_chunk_reads=192,  # several host super-chunks too
    )
    idx = build_index(recs, cfg)
    reads = [r for r in sample_reads(rng, seqs, n_reads=600, read_len=90) if r.size >= 31]
    codes = np.zeros((len(reads), 128), np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
        lens[i] = r.size
    packed = PackedReads(codes, lens, [str(i) for i in range(len(reads))])

    fused = pl.quantify(idx, packed, cfg)
    monkeypatch.setattr(pl, "FUSED_MAX_PADDED_READS", 0)
    streamed = pl.quantify(idx, packed, cfg)
    assert streamed.stats.get("class_overflow", 0) == 0
    np.testing.assert_allclose(fused.pi, streamed.pi, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(
        fused.weighted_counts, streamed.weighted_counts, rtol=1e-12, atol=1e-14
    )
    np.testing.assert_array_equal(fused.has_entry, streamed.has_entry)
    assert fused.em_iterations == streamed.em_iterations
    assert fused.num_reads == streamed.num_reads


def test_stream_drain_exact_beyond_buffer(monkeypatch):
    """Distinct classes EXCEED the class buffer: the drain path hands
    compacted segments to the host between super-chunks and re-merges
    them before the EM, staying exactly equal to the fused path where
    the old behavior dropped batches (class_overflow > 0)."""
    import dataclasses

    rng = np.random.default_rng(910009)  # fuzz_oracle's first catch
    seqs = make_transcriptome(rng, n=20, len_range=(60, 700))
    recs = FastaRecords([f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs], 0)
    cfg = QuantConfig(
        kmer_lengths=(21,),
        batch_size=32,
        max_read_len=128,
        em_dtype="float64",
        stream_class_capacity=64,  # -> m_cap = max(64, 2*B) = 64 rows
        stream_chunk_reads=32,  # one batch per super-chunk
    )
    idx = build_index(recs, cfg)
    reads = [r for r in sample_reads(rng, seqs, n_reads=500, read_len=70,
                                     error_rate=0.02) if r.size >= 21]
    codes = np.zeros((len(reads), 128), np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
        lens[i] = r.size
    packed = PackedReads(codes, lens, [str(i) for i in range(len(reads))])

    fused = pl.quantify(idx, packed, cfg)
    monkeypatch.setattr(pl, "FUSED_MAX_PADDED_READS", 0)

    # The regime genuinely exceeds the buffer: with draining disabled
    # the engine must drop and count (never silent)...
    dropped = pl.quantify(idx, packed, dataclasses.replace(cfg, stream_drain=False))
    assert dropped.stats.get("class_overflow", 0) > 0

    # ...and with draining (the default) it stays exact.
    streamed = pl.quantify(idx, packed, cfg)
    assert streamed.stats.get("stream_drains", 0) > 0
    assert streamed.stats.get("class_overflow", 0) == 0
    np.testing.assert_allclose(fused.pi, streamed.pi, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(
        fused.weighted_counts, streamed.weighted_counts, rtol=1e-12, atol=1e-14
    )
    np.testing.assert_array_equal(fused.has_entry, streamed.has_entry)
    assert fused.em_iterations == streamed.em_iterations


def test_stream_pretail_spill_reruns_flat(monkeypatch):
    """An under-calibrated tier probe must not cost exactness in the
    streaming path: pretail spills trigger the same flat rerun the
    fused and sharded paths perform (for replayable inputs)."""
    rng = np.random.default_rng(4242)
    seqs = make_transcriptome(rng, n=16, len_range=(80, 500))
    recs = FastaRecords([f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs], 0)
    # Tiering only engages at batch >= 1024 rows (tier_plan keeps small
    # batches flat), so use a real batch size here.
    cfg = QuantConfig(kmer_lengths=(31,), batch_size=1024, max_read_len=128,
                      em_dtype="float64")
    idx = build_index(recs, cfg)
    reads = [r for r in sample_reads(rng, seqs, n_reads=2500, read_len=100) if r.size >= 31]
    codes = np.zeros((len(reads), 128), np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
        lens[i] = r.size
    packed = PackedReads(codes, lens, [str(i) for i in range(len(reads))])

    fused = pl.quantify(idx, packed, cfg)

    # Sabotage the calibration: probe width 1 guarantees pretail spills.
    # The streaming path calibrates from the uploaded first chunk
    # (stream._tier_widths_dev); patch both hooks so the fused fallback
    # rerun (pl.quantify) also sees the sabotage.
    import sketch_rna_tpu.stream as stream_mod

    real = pl._tier_widths_for
    monkeypatch.setattr(
        pl, "_tier_widths_for", lambda *a, **kw: (real(*a, **kw)[0], 1)
    )
    real_dev = stream_mod._tier_widths_dev
    monkeypatch.setattr(
        stream_mod,
        "_tier_widths_dev",
        lambda *a, **kw: (real_dev(*a, **kw)[0], 1),
    )
    monkeypatch.setattr(pl, "FUSED_MAX_PADDED_READS", 0)

    # Prove the sabotage bites: a non-replayable feed cannot rerun, so
    # the spill surfaces in its stats (never silent).
    from sketch_rna_tpu.stream import quantify_streamed

    spilled = quantify_streamed(
        idx, iter([packed]), cfg, num_reads_hint=packed.num_reads
    )
    assert spilled.stats.get("expand_dropped_pretail", 0) > 0

    streamed = pl.quantify(idx, packed, cfg)

    # The flat rerun reports clean stats and exact results.
    assert streamed.stats.get("expand_dropped_pretail", 0) == 0
    np.testing.assert_allclose(fused.pi, streamed.pi, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(
        fused.weighted_counts, streamed.weighted_counts, rtol=1e-12, atol=1e-14
    )
    np.testing.assert_array_equal(fused.has_entry, streamed.has_entry)


def test_dual_buffer_streaming_exact(monkeypatch):
    """The narrow/wide dual class buffer (stream_narrow_width < C) must
    reproduce the fused path bit-for-bit, including 2-bit packed chunks:
    wide classes route through the side buffer, narrow ones through the
    16x-cheaper narrow buffer, and their tier tables concatenate."""
    import dataclasses

    rng = np.random.default_rng(77)
    # Heavily overlapping transcriptome -> many wide candidate profiles.
    base = rng.integers(0, 4, size=400).astype(np.uint8)
    seqs = []
    for i in range(24):
        a = int(rng.integers(0, 40))
        mut = base.copy()
        pos = rng.integers(0, base.size, size=3)
        mut[pos] = (mut[pos] + 1) % 4
        seqs.append(np.concatenate([mut[a : a + 300],
                                    rng.integers(0, 4, size=50).astype(np.uint8)]))
    recs = FastaRecords([f"T{i}" for i in range(len(seqs))], [decode(s) for s in seqs], 0)
    cfg = QuantConfig(kmer_lengths=(21,), batch_size=32, max_read_len=128,
                      em_dtype="float64", candidate_capacity=32,
                      stream_narrow_width=2, stream_chunk_reads=64)
    idx = build_index(recs, cfg)
    reads = [r for r in sample_reads(rng, seqs, n_reads=400, read_len=80,
                                     error_rate=0.01) if r.size >= 21]
    codes = np.zeros((len(reads), 128), np.uint8)
    lens = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        codes[i, : r.size] = r
        lens[i] = r.size
    packed = PackedReads(codes, lens, [str(i) for i in range(len(reads))])

    fused = pl.quantify(idx, packed, cfg)
    monkeypatch.setattr(pl, "FUSED_MAX_PADDED_READS", 0)

    from sketch_rna_tpu.stream import quantify_streamed

    for feed in ("packed", "packed2"):
        if feed == "packed":
            streamed = quantify_streamed(idx, packed, cfg)
        else:
            chunks = [
                PackedReads(packed.codes[s : s + 64],
                            packed.lengths[s : s + 64], []).bit_packed()
                for s in range(0, packed.num_reads, 64)
            ]
            streamed = quantify_streamed(
                idx, iter(chunks), cfg, num_reads_hint=packed.num_reads
            )
        assert streamed.stats.get("class_overflow", 0) == 0, feed
        assert streamed.stats.get("wide_spilled", 0) == 0, feed
        np.testing.assert_allclose(fused.pi, streamed.pi, rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(
            fused.weighted_counts, streamed.weighted_counts, rtol=1e-12, atol=1e-14
        )
        np.testing.assert_array_equal(fused.has_entry, streamed.has_entry)
        assert fused.em_iterations == streamed.em_iterations

    # Tiny buffers force compaction + drains on BOTH buffers: still exact.
    small = dataclasses.replace(cfg, stream_class_capacity=64)
    streamed = quantify_streamed(idx, packed, small)
    assert streamed.stats.get("class_overflow", 0) == 0
    np.testing.assert_allclose(fused.pi, streamed.pi, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(
        fused.weighted_counts, streamed.weighted_counts, rtol=1e-12, atol=1e-14
    )
