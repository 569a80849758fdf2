"""Multi-host initialization.

The reference is single-process (SURVEY.md §2 parallelism inventory);
this is the TPU-native entry to multi-host execution: call
init_distributed() once per host process before building meshes, then
every jax.devices() call sees the global device set and the
("data", "index") mesh in dist/mesh.py spans hosts (collectives ride
ICI within a slice, DCN across slices).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger(__name__)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-host.

    No-ops (returns False) when single-process: explicit args absent and
    no cluster env (JAX autodetects TPU pods / SLURM / GKE).  Safe to
    call unconditionally from CLIs.
    """
    import jax

    explicit = coordinator_address is not None
    cluster_env = any(
        os.environ.get(v)
        for v in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS", "SLURM_JOB_ID")
    )
    if not explicit and not cluster_env:
        return False
    try:
        # Cross-process collectives on the CPU backend need gloo (the
        # default "none" fails at the first psum); harmless elsewhere.
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info(
            "jax.distributed initialized: process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )
        return True
    except Exception as e:  # already initialized or misconfigured
        log.warning("jax.distributed.initialize failed: %s", e)
        return False
