"""Phase timing + throughput counters.

The reference's only instrumentation is one std::chrono wall-clock around
index build (src/main.cpp:60-88) and cout phase banners (:176-196).
This module gives every pipeline phase a named timer with derived
throughput, queryable as a dict (the observability gap noted in
SURVEY.md §5 "Tracing / profiling").
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

log = logging.getLogger("sketch_rna_tpu.timing")


class PhaseTimer:
    """Accumulates named phase durations and item counts."""

    def __init__(self) -> None:
        self.durations: Dict[str, float] = {}
        self.items: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, items: Optional[int] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.durations[name] = self.durations.get(name, 0.0) + dt
            if items is not None:
                self.items[name] = self.items.get(name, 0) + items
            rate = f" ({items / dt:,.0f}/s)" if items else ""
            log.info("phase %-18s %8.3fs%s", name, dt, rate)

    def report(self) -> Dict[str, float]:
        out = dict(self.durations)
        for name, n in self.items.items():
            if self.durations.get(name):
                out[f"{name}_per_s"] = n / self.durations[name]
        return out


_GLOBAL = PhaseTimer()


def phase(name: str, items: Optional[int] = None):
    """Module-level convenience: time a phase on the global timer."""
    return _GLOBAL.phase(name, items)


def global_report() -> Dict[str, float]:
    return _GLOBAL.report()
