"""Index construction: device-batched transcript hashing -> CSR postings.

Reference pipeline (build_and_save_index, src/main.cpp:56-92 and
build_kmer_to_transcript_map, src/sketch.cpp:51-74):
  - transcripts shorter than ANY configured k are excluded from sketching
    (src/main.cpp:66-75) but still serialized into the index,
  - per transcript per k: FracMinHash sketch (a set),
  - inverted map: hash -> list of transcript ids.

TPU-first shape: the hashing (the O(total bases) hot loop) runs on device
in length-bucketed batches via the windowed ntHash; set-dedup and CSR
assembly are a one-off host finalization (np.unique over (hash, tid)
pairs), since index build is offline and bandwidth-trivial next to quant
(SURVEY.md §7.2 step 3).
"""

from __future__ import annotations

import functools
import logging
from typing import Dict, List, Sequence, Tuple

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


def _hash_keep_batch(codes: jnp.ndarray, lengths: jnp.ndarray, k: int, thr: int):
    """[B, L] codes -> (hashes [B, L-k+1] u32, keep mask)."""
    h = nthash_batch_u32(codes, k)
    nk = h.shape[1]
    pos_ok = jnp.arange(nk, dtype=jnp.int32)[None, :] < (lengths[:, None] - (k - 1))
    keep = pos_ok & (h <= jnp.uint32(thr))
    return h, keep


# Index build is offline and bucket shapes vary; pin its hashing to the
# CPU backend so it never burns (slow, remote) TPU compiles per bucket.
# The quant hot path is unaffected.
@functools.lru_cache(maxsize=1)
def _cpu_device():
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def _hash_keep_batch_jit(codes, lengths, k, thr):
    dev = _cpu_device()
    if dev is not None:
        codes = jax.device_put(codes, dev)
        lengths = jax.device_put(lengths, dev)
    return _hash_keep_batch_compiled(codes, lengths, k, thr)


_hash_keep_batch_compiled = jax.jit(_hash_keep_batch, static_argnums=(2, 3))


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
    thr_cache = {k: fracminhash_threshold(config.sketch_fraction) for k in ks}

    per_k: Dict[int, KIndex] = {}
    for k in ks:
        pair_hashes: List[np.ndarray] = []
        pair_tids: List[np.ndarray] = []
        buckets = _bucketize([int(lengths[i]) for i in sketchable])
        for pad_len, rows in buckets.items():
            ids = [sketchable[r] for r in rows]
            bsz = max(_BATCH_ELEMENT_BUDGET // pad_len, 1)
            for start in range(0, len(ids), bsz):
                chunk = ids[start : start + bsz]
                B = len(chunk)
                codes = np.zeros((B, pad_len), dtype=np.uint8)
                lens = np.zeros(B, dtype=np.int32)
                for r, tid in enumerate(chunk):
                    c = seq_codes[tid]
                    codes[r, : c.size] = c
                    lens[r] = c.size
                h, keep = _hash_keep_batch_jit(codes, lens, k, thr_cache[k])
                h = np.asarray(h)
                keep = np.asarray(keep)
                for r, tid in enumerate(chunk):
                    hk = np.unique(h[r][keep[r]])  # set semantics per transcript
                    if hk.size:
                        pair_hashes.append(hk)
                        pair_tids.append(np.full(hk.size, tid, dtype=np.int32))

        if pair_hashes:
            all_h = np.concatenate(pair_hashes)
            all_t = np.concatenate(pair_tids)
        else:
            all_h = np.zeros(0, dtype=np.uint32)
            all_t = np.zeros(0, dtype=np.int32)
        # Sort postings by (hash, tid); pairs are already distinct
        # because dedup happened per transcript.
        order = np.lexsort((all_t, all_h))
        all_h = all_h[order]
        all_t = all_t[order]
        keys, counts = np.unique(all_h, return_counts=True)
        row_ptr = np.zeros(keys.size + 1, dtype=np.int32)
        np.cumsum(counts, out=row_ptr[1:])
        per_k[k] = KIndex(keys=keys.astype(np.uint32), row_ptr=row_ptr, postings=all_t)
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
