"""Index construction: device-batched transcript hashing -> CSR postings.

Reference pipeline (build_and_save_index, src/main.cpp:56-92 and
build_kmer_to_transcript_map, src/sketch.cpp:51-74):
  - transcripts shorter than ANY configured k are excluded from sketching
    (src/main.cpp:66-75) but still serialized into the index,
  - per transcript per k: FracMinHash sketch (a set),
  - inverted map: hash -> list of transcript ids.

TPU-first shape (SURVEY.md §7.2 step 3): ALL heavy array work runs on
device —
  1. per length-bucketed batch: windowed ntHash + threshold mask, then a
     row sort that compacts each transcript's kept hashes to the front
     of its row (discarded lanes carry the 0xFFFFFFFF sentinel),
  2. one global device sort of the concatenated (hash, tid) pairs,
  3. the host does only linear boundary scans to dedup pairs (set
     semantics) and emit the CSR arrays.
The host never runs per-transcript set operations (a Python np.unique
loop is minutes-to-hours at GENCODE scale on weak-CPU hosts).
"""

from __future__ import annotations

import functools
import logging
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.hash.nthash import nthash_batch_u32
from sketch_rna_tpu.index.artifact import IndexArtifact, KIndex
from sketch_rna_tpu.io.fasta import FastaRecords
from sketch_rna_tpu.io.packing import encode_sequence
from sketch_rna_tpu.sketch.fracminhash import fracminhash_threshold

log = logging.getLogger(__name__)

# Cap on elements per device hashing batch (B * L).
_BATCH_ELEMENT_BUDGET = 1 << 24
_SENTINEL = np.uint32(0xFFFFFFFF)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _hash_pairs_batch(codes, lengths, tid_of_row, k, thr, cap):
    """[B, L] codes -> compacted kept (hash, tid) pairs.

    The whole batch's kept k-mers compact on device: one flat pair sort
    pushes kept hashes (all < sentinel) to the front, and only the first
    `cap` lanes transfer to the host.  Returns (pair_hash [cap] u32,
    pair_tid [cap] i32, n_kept [] i32).
    """
    h = nthash_batch_u32(codes, k)
    B, nk = h.shape
    pos_ok = jnp.arange(nk, dtype=jnp.int32)[None, :] < (lengths[:, None] - (k - 1))
    keep = pos_ok & (h <= jnp.uint32(thr))
    flat_h = jnp.where(keep, h, jnp.uint32(0xFFFFFFFF)).reshape(-1)
    flat_t = jnp.broadcast_to(tid_of_row[:, None], (B, nk)).reshape(-1)
    sh, st = jax.lax.sort((flat_h, flat_t), num_keys=2)
    n_kept = jnp.sum(keep.astype(jnp.int32))
    return sh[:cap], st[:cap], n_kept


@functools.partial(jax.jit, static_argnums=())
def _global_pair_sort(hashes, tids):
    """Lexicographic device sort of (hash, tid) pairs."""
    return jax.lax.sort((hashes, tids), num_keys=2)


@functools.lru_cache(maxsize=1)
def _cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


# Above this many total bases, hashing runs on the default accelerator
# (chunk shapes are padded so each (bucket, k) costs exactly one
# compile); below it, the CPU backend avoids accelerator compile latency
# for tiny inputs.  Kept low: the in-batch pair sort is heavy for weak
# host CPUs, and accelerator compiles amortize via the persistent cache.
_DEVICE_HASH_MIN_BASES = 1 << 20


def _bucketize(lengths: Sequence[int]) -> Dict[int, List[int]]:
    """Group transcript indices into power-of-two padded-length buckets."""
    buckets: Dict[int, List[int]] = {}
    for i, ln in enumerate(lengths):
        b = 256
        while b < ln:
            b <<= 1
        buckets.setdefault(b, []).append(i)
    return buckets


def build_index(records: FastaRecords, config: QuantConfig) -> IndexArtifact:
    ks = tuple(sorted(config.kmer_lengths))
    max_k = max(ks)
    names = records.names
    seq_codes: List[np.ndarray] = []
    lengths = np.zeros(len(names), dtype=np.int32)
    for i, seq in enumerate(records.seqs):
        codes = encode_sequence(seq)
        assert codes is not None, "load_fasta already validated sequences"
        seq_codes.append(codes)
        lengths[i] = codes.size

    # Sketchable set: length >= every configured k (src/main.cpp:66-75).
    sketchable = [i for i in range(len(names)) if lengths[i] >= max_k]
    thr = fracminhash_threshold(config.sketch_fraction)
    total_bases = int(lengths.sum())
    cpu = _cpu_device() if total_bases < _DEVICE_HASH_MIN_BASES else None

    per_k: Dict[int, KIndex] = {}
    for k in ks:
        hash_parts: List[np.ndarray] = []
        tid_parts: List[np.ndarray] = []
        buckets = _bucketize([int(lengths[i]) for i in sketchable])
        for pad_len, rows in buckets.items():
            ids = [sketchable[r] for r in rows]
            bsz = max(_BATCH_ELEMENT_BUDGET // pad_len, 1)
            # Transfer cap: generous headroom over the expected kept
            # fraction; widened to everything for large fractions.
            frac_cap = min(1.0, config.sketch_fraction * 2.0 + 0.05)
            cap = max(int(bsz * pad_len * frac_cap), 1)
            for start in range(0, len(ids), bsz):
                chunk = ids[start : start + bsz]
                # Pad chunk height to a power of two: the (bucket_len,
                # height, k) shape family is then small and largely
                # dataset-independent, so compiled programs (and the
                # persistent cache) transfer across transcriptomes
                # without exploding padding waste for tiny inputs.
                B = 1 << max(len(chunk) - 1, 0).bit_length()
                B = max(min(B, bsz), 1)
                codes = np.zeros((B, pad_len), dtype=np.uint8)
                lens = np.zeros(B, dtype=np.int32)
                tid_of_row = np.zeros(B, dtype=np.int32)
                for r, tid in enumerate(chunk):
                    c = seq_codes[tid]
                    codes[r, : c.size] = c
                    lens[r] = c.size
                    tid_of_row[r] = tid
                chunk_cap = min(cap, B * (pad_len - k + 1))
                cj, lj, tj = codes, lens, tid_of_row
                if cpu is not None:
                    cj = jax.device_put(codes, cpu)
                    lj = jax.device_put(lens, cpu)
                    tj = jax.device_put(tid_of_row, cpu)
                ph, pt, n_kept = _hash_pairs_batch(cj, lj, tj, k, thr, chunk_cap)
                n = int(n_kept)
                if n > chunk_cap:
                    # Extremely skewed batch: redo with the full width.
                    ph, pt, n_kept = _hash_pairs_batch(
                        cj, lj, tj, k, thr, B * (pad_len - k + 1)
                    )
                if n:
                    hash_parts.append(np.asarray(ph[:n]))
                    tid_parts.append(np.asarray(pt[:n]))

        if hash_parts:
            all_h = np.concatenate(hash_parts)
            all_t = np.concatenate(tid_parts)
            n_real = all_h.size
            if n_real > 1 << 16:
                # Big pair sort on the accelerator; pad to a power of two
                # (sentinel pairs sort last) to bound compile variants.
                padded = 1 << (n_real - 1).bit_length()
                ph = np.full(padded, _SENTINEL, dtype=np.uint32)
                pt = np.zeros(padded, dtype=np.int32)
                ph[:n_real] = all_h
                pt[:n_real] = all_t
                sh, st = _global_pair_sort(jnp.asarray(ph), jnp.asarray(pt))
                all_h = np.asarray(sh)[:n_real]
                all_t = np.asarray(st)[:n_real]
            else:
                order = np.lexsort((all_t, all_h))
                all_h, all_t = all_h[order], all_t[order]
        else:
            all_h = np.zeros(0, dtype=np.uint32)
            all_t = np.zeros(0, dtype=np.int32)

        # Linear host scans: dedup (hash, tid) pairs (set semantics —
        # duplicates arise from repeated k-mers within one transcript)
        # and build the CSR arrays.
        if all_h.size:
            first = np.empty(all_h.size, dtype=bool)
            first[0] = True
            np.not_equal(all_h[1:], all_h[:-1], out=first[1:])
            tid_change = np.empty(all_h.size, dtype=bool)
            tid_change[0] = True
            np.not_equal(all_t[1:], all_t[:-1], out=tid_change[1:])
            keep_pair = first | tid_change
            all_h = all_h[keep_pair]
            all_t = all_t[keep_pair]

            new_key = np.empty(all_h.size, dtype=bool)
            new_key[0] = True
            np.not_equal(all_h[1:], all_h[:-1], out=new_key[1:])
            keys = all_h[new_key]
            starts = np.flatnonzero(new_key)
            row_ptr = np.zeros(keys.size + 1, dtype=np.int32)
            row_ptr[:-1] = starts
            row_ptr[-1] = all_h.size
        else:
            keys = np.zeros(0, dtype=np.uint32)
            row_ptr = np.zeros(1, dtype=np.int32)

        per_k[k] = KIndex(
            keys=keys.astype(np.uint32), row_ptr=row_ptr, postings=all_t.astype(np.int32)
        )
        log.info(
            "index k=%d: %d keys, %d postings over %d sketchable transcripts",
            k,
            keys.size,
            all_t.size,
            len(sketchable),
        )

    return IndexArtifact(
        names=list(names),
        lengths=lengths,
        kmer_lengths=ks,
        sketch_fraction=config.sketch_fraction,
        per_k=per_k,
    )
