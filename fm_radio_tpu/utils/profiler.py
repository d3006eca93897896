"""Instrumentation: stack-scoped timers + throughput counters + JAX traces.

Parity: the reference ships a complete-but-dormant header-only instrumentor
(``src/utility/profiler.h:32-245``: per-thread scoped timers, trace logging,
RAII ``InstrumentationTimer``) that no app ever enables (SURVEY.md §5.1).
Here the equivalent is first-class: scoped host timers that understand device
async (they block_until_ready on exit when asked), per-stage samples/s
counters, Chrome-trace export, and a bridge to ``jax.profiler`` for real
device traces.
"""

from __future__ import annotations

import contextlib
import json
import threading
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class _StageStats:
    calls: int = 0
    total_s: float = 0.0
    samples: int = 0

    @property
    def samples_per_s(self) -> float:
        return self.samples / self.total_s if self.total_s else 0.0


@dataclass
class Profiler:
    """Scoped profiler; one instance per pipeline (thread-safe)."""

    enabled: bool = True
    stats: dict = field(default_factory=lambda: defaultdict(_StageStats))
    events: list = field(default_factory=list)  # chrome trace events
    _lock: threading.Lock = field(default_factory=threading.Lock)
    _t0: float = field(default_factory=time.perf_counter)

    @contextlib.contextmanager
    def scope(self, name: str, samples: int = 0, sync=None):
        """Time a scope.  ``sync``: optional array/pytree to
        ``jax.block_until_ready`` before stopping the clock (device work is
        async; without this you time only dispatch)."""
        if not self.enabled:
            yield
            return
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            dur = time.perf_counter() - start
            with self._lock:
                s = self.stats[name]
                s.calls += 1
                s.total_s += dur
                s.samples += samples
                self.events.append(
                    {
                        "name": name,
                        "ph": "X",
                        "ts": (start - self._t0) * 1e6,
                        "dur": dur * 1e6,
                        "pid": 0,
                        "tid": threading.get_ident() % 100000,
                    }
                )

    def report(self) -> str:
        lines = [f"{'stage':30s} {'calls':>7s} {'total ms':>10s} {'Msamp/s':>9s}"]
        for name, s in sorted(self.stats.items(), key=lambda kv: -kv[1].total_s):
            lines.append(
                f"{name:30s} {s.calls:7d} {s.total_s * 1e3:10.2f} "
                f"{s.samples_per_s / 1e6:9.2f}"
            )
        return "\n".join(lines)

    def dump_chrome_trace(self, path: str) -> None:
        """Chrome-trace JSON (open in chrome://tracing or Perfetto) — the
        richer replacement for the reference's GUI profiler viewer."""
        with open(path, "w") as f:
            json.dump({"traceEvents": self.events}, f)

    def reset(self) -> None:
        with self._lock:
            self.stats.clear()
            self.events.clear()
            self._t0 = time.perf_counter()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a real device trace via jax.profiler (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# A module-level default instance, like the reference's global Profiler
# singleton (profiler.h:151-188) — but explicit instances are preferred.
default_profiler = Profiler(enabled=False)
