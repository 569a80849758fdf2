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


# Fixed hashing tile: every transcript is cut into TL-base tiles with a
# (max_k - 1)-base halo overlap, so EVERY device hashing launch has the
# same [TILE_BATCH, TL] shape — exactly one compile per k, for any
# transcriptome (the round-2 bucketed scheme compiled one program per
# (pow2-length-bucket, chunk-height, k), which dominated cold index
# builds through remote-compile latency).  Tiling the rolling-window
# hash is exact: a window's hash depends only on its k bases, and any
# window duplicated in a halo produces a duplicate (hash, tid) pair the
# set-semantics dedup drops anyway (SURVEY.md §5 long-context note).
_TILE_LEN = 8192
_TILE_BATCH = _BATCH_ELEMENT_BUDGET // _TILE_LEN  # 2048


def _pack_tiles(
    seq_codes: List[np.ndarray],
    lengths: np.ndarray,
    sketchable: List[int],
    max_k: int,
):
    """Cut the sketchable transcripts into halo-overlapped fixed tiles.

    Returns (tiles [n_tiles, TL] uint8, tile_len [n_tiles] i32,
    tile_tid [n_tiles] i32), n_tiles padded to a _TILE_BATCH multiple
    (pad tiles carry length 0 and hash to nothing).  All array work is
    vectorized numpy — no per-base Python.
    """
    stride = _TILE_LEN - (max_k - 1)
    sk_lens = lengths[sketchable].astype(np.int64)
    n_tiles_of = np.maximum((sk_lens - max_k) // stride, 0) + 1
    total_tiles = int(n_tiles_of.sum())
    n_pad = ((total_tiles + _TILE_BATCH - 1) // _TILE_BATCH) * _TILE_BATCH
    n_pad = max(n_pad, _TILE_BATCH)

    flat = np.concatenate(
        [seq_codes[i] for i in sketchable] + [np.zeros(_TILE_LEN, np.uint8)]
    )
    offsets = np.zeros(len(sketchable), dtype=np.int64)
    np.cumsum(sk_lens[:-1], out=offsets[1:])

    # Per-tile source transcript and within-transcript tile rank.
    owner = np.repeat(np.arange(len(sketchable), dtype=np.int64), n_tiles_of)
    first_tile = np.zeros(len(sketchable), dtype=np.int64)
    np.cumsum(n_tiles_of[:-1], out=first_tile[1:])
    rank = np.arange(total_tiles, dtype=np.int64) - first_tile[owner]
    start = offsets[owner] + rank * stride
    tlen = np.minimum(sk_lens[owner] - rank * stride, _TILE_LEN)

    tiles = np.zeros((n_pad, _TILE_LEN), dtype=np.uint8)
    # Strided gather of every tile's bases in one shot (flat is padded by
    # a full tile, so the tail window never reads out of bounds).
    tiles[:total_tiles] = flat[
        start[:, None] + np.arange(_TILE_LEN, dtype=np.int64)[None, :]
    ]
    tile_len = np.zeros(n_pad, dtype=np.int32)
    tile_len[:total_tiles] = tlen
    tile_tid = np.zeros(n_pad, dtype=np.int32)
    tile_tid[:total_tiles] = np.asarray(sketchable, dtype=np.int32)[owner]
    return tiles, tile_len, tile_tid


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

    tiles, tile_len, tile_tid = _pack_tiles(seq_codes, lengths, sketchable, max_k)
    n_batches = tiles.shape[0] // _TILE_BATCH
    # Transfer cap: generous headroom over the expected kept fraction;
    # widened to everything for large fractions.
    frac_cap = min(1.0, config.sketch_fraction * 2.0 + 0.05)
    cap = max(int(_TILE_BATCH * _TILE_LEN * frac_cap), 1)

    # Upload each tile batch ONCE and hash every k from it (multi-k pays
    # one transfer); per-k pair parts accumulate on the host.
    hash_parts: Dict[int, List[np.ndarray]] = {k: [] for k in ks}
    tid_parts: Dict[int, List[np.ndarray]] = {k: [] for k in ks}
    for b in range(n_batches):
        sl = slice(b * _TILE_BATCH, (b + 1) * _TILE_BATCH)
        cj, lj, tj = tiles[sl], tile_len[sl], tile_tid[sl]
        if cpu is not None:
            cj = jax.device_put(cj, cpu)
            lj = jax.device_put(lj, cpu)
            tj = jax.device_put(tj, cpu)
        else:
            cj = jnp.asarray(cj)
            lj = jnp.asarray(lj)
            tj = jnp.asarray(tj)
        for k in ks:
            chunk_cap = min(cap, _TILE_BATCH * (_TILE_LEN - k + 1))
            ph, pt, n_kept = _hash_pairs_batch(cj, lj, tj, k, thr, chunk_cap)
            n = int(n_kept)
            if n > chunk_cap:
                # Extremely skewed batch: redo with the full width.
                ph, pt, n_kept = _hash_pairs_batch(
                    cj, lj, tj, k, thr, _TILE_BATCH * (_TILE_LEN - k + 1)
                )
            if n:
                hash_parts[k].append(np.asarray(ph[:n]))
                tid_parts[k].append(np.asarray(pt[:n]))

    per_k: Dict[int, KIndex] = {}
    for k in ks:
        if hash_parts[k]:
            all_h = np.concatenate(hash_parts[k])
            all_t = np.concatenate(tid_parts[k])
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
