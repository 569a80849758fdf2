"""Multi-process (multi-host) sharded quantification.

Each host process parses only its byte-range slice of the FASTQ
(io/fastq.byte_range_for_process), packs it locally, and contributes its
rows to a global device array via jax.make_array_from_process_local_data
over the ("data", "index") mesh spanning every process's devices.  The
single jitted shard_map step (dist/quant_sharded.py) then runs SPMD
across hosts: collectives ride ICI within a slice and DCN across hosts,
and outputs come back fully replicated so every process holds the final
pi / counts.

Cross-host semantics note: the reference's duplicate-read-ID rule (last
valid occurrence wins, src/main.cpp:150) applies within each host's
slice; duplicate IDs straddling slice boundaries are both kept.  Real
FASTQ read IDs are unique, so this deviation is theoretical; it is
asserted nowhere and documented in PARITY.md.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from sketch_rna_tpu.config import QuantConfig
from sketch_rna_tpu.em.em import resolve_em_mxu
from sketch_rna_tpu.index.artifact import IndexArtifact
from sketch_rna_tpu.io.packing import PackedReads

log = logging.getLogger(__name__)


def _allgather_host_ints(values) -> np.ndarray:
    """[P, len(values)] int64 across processes (tiny control-plane sync)."""
    from jax.experimental import multihost_utils

    arr = np.asarray(values, dtype=np.int64)
    return np.asarray(multihost_utils.process_allgather(arr))


def quantify_sharded_multihost(
    index: IndexArtifact,
    local_packed: PackedReads,
    config: Optional[QuantConfig] = None,
    mesh=None,
):
    """Sharded quant where each process supplies only ITS read slice.

    All processes must call this collectively (same index, same config).
    Returns the replicated QuantResult on every process.
    """
    from sketch_rna_tpu.dist.mesh import make_mesh, mesh_factor
    from sketch_rna_tpu.dist.quant_sharded import quant_step_sharded
    from sketch_rna_tpu.index.shard import shard_index_arrays
    from sketch_rna_tpu.pipeline import QuantResult, _empty_result

    config = config or QuantConfig(kmer_lengths=tuple(index.kmer_lengths))
    n_proc = jax.process_count()
    if mesh is None:
        dp, ip = mesh_factor(len(jax.devices()))
        mesh = make_mesh(dp, ip)
    dp = mesh.shape["data"]
    ip = mesh.shape["index"]
    if dp % n_proc:
        raise ValueError(
            f"data axis {dp} must divide evenly across {n_proc} processes"
        )
    dp_local = dp // n_proc

    # Control plane: local row counts and pad widths -> common shapes.
    local_R = local_packed.num_reads
    local_L = int(local_packed.padded_len) if local_R else 0
    meta = _allgather_host_ints([local_R, local_L])
    R_global = int(meta[:, 0].sum())
    if R_global == 0:
        return _empty_result(index)
    L = max(int(meta[:, 1].max()), 128)
    max_local = int(meta[:, 0].max())
    rows_local = ((max_local + dp_local - 1) // dp_local) * dp_local
    rows_local = max(rows_local, dp_local)

    codes = np.zeros((rows_local, L), np.uint8)
    lengths = np.zeros(rows_local, np.int32)
    if local_R:
        codes[:local_R, :local_L] = np.asarray(local_packed.codes)
        lengths[:local_R] = np.asarray(local_packed.lengths)

    data_sharding = NamedSharding(mesh, P("data", None))
    codes_g = jax.make_array_from_process_local_data(data_sharding, codes)
    lengths_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), lengths
    )

    shards = shard_index_arrays(index, ip)
    ks = tuple(index.kmer_lengths)
    keys = tuple(shards[k][0] for k in ks)
    row_ptr = tuple(shards[k][1] for k in ks)
    postings = tuple(shards[k][2] for k in ks)
    caps = tuple(config.sketch_capacity_for(k, L) for k in ks)

    pi, weighted, has_entry, iters, stats = quant_step_sharded(
        codes_g,
        lengths_g,
        keys,
        row_ptr,
        postings,
        jnp.asarray(R_global, jnp.int32),
        mesh=mesh,
        kmer_lengths=ks,
        sketch_fraction=config.sketch_fraction,
        sketch_caps=caps,
        chain_fraction=config.chain_fraction,
        expand_per_read=config.expand_per_read,
        candidate_capacity=config.candidate_capacity,
        num_transcripts=index.num_transcripts,
        em_max_iterations=config.em_max_iterations,
        em_convergence=config.em_convergence,
        pseudocount=config.pseudocount,
        em_epsilon=config.em_epsilon,
        em_dtype=config.em_dtype,
        use_mxu=resolve_em_mxu(
            config.em_mxu,
            index.num_transcripts,
            codes_g.shape[0] * config.candidate_capacity,
            config.em_dtype,
        ),
    )
    host_stats = {k: int(np.asarray(v).sum()) for k, v in stats.items()}
    return QuantResult(
        names=list(index.names),
        pi=np.asarray(pi),
        weighted_counts=np.asarray(weighted),
        has_entry=np.asarray(has_entry),
        em_iterations=int(iters),
        num_reads=R_global,
        stats=host_stats,
        lengths=np.asarray(index.lengths),
    )
