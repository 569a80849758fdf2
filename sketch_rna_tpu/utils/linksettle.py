"""Tunneled-backend link settling.

Round-4 finding: on the tunneled TPU backend, the FIRST device->host
readback of a process intermittently stalls for 10-22 MINUTES (observed
579 s, 727 s, 1318 s on identical code that otherwise completes the same
fetch in 1-8 s) — a transport-level timeout/retry, not compute.  All
observed stalls hit the first dependent D2H *after substantial uploads
were enqueued*; issuing a trivial D2H at process start, before any real
transfers, moves that first-readback transition to a point where a stall
has nothing to wait behind and the retry window is empty.

Call settle_link() once at entry-point start (CLI, bench, profilers).
No-op on non-tunneled backends (cost: one 4-byte fetch).
"""

from __future__ import annotations

import logging
import time

log = logging.getLogger(__name__)


def settle_link() -> float:
    """One tiny round-trip through the device; returns seconds taken."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.perf_counter()
    np.asarray(jnp.zeros(1, jnp.int32) + 1)
    dt = time.perf_counter() - t0
    if dt > 5.0:
        log.warning("link settle took %.1fs (tunnel stall absorbed at startup)", dt)
    return dt
