"""Named accumulating timer registry.

Capability analog of libvis ``Timing``
(/root/reference/libvis/src/libvis/timing.h:47-144): named accumulating
timers with a sortable text report. On TPU, timed regions should wrap
``jax.block_until_ready`` at phase boundaries; within a phase, XLA dispatch
is async and a wall-clock timer measures enqueue+execute correctly only if
the caller synchronizes.
"""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@dataclass
class _TimerStats:
    count: int = 0
    total: float = 0.0
    min: float = float("inf")
    max: float = 0.0
    samples: List[float] = field(default_factory=list)
    keep_samples: bool = False

    def add(self, seconds: float) -> None:
        self.count += 1
        self.total += seconds
        self.min = min(self.min, seconds)
        self.max = max(self.max, seconds)
        if self.keep_samples:
            self.samples.append(seconds)

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0


class Timing:
    """Process-wide registry of named accumulating timers."""

    _lock = threading.Lock()
    _timers: Dict[str, _TimerStats] = {}
    enabled: bool = True

    @classmethod
    def add_time(cls, name: str, seconds: float) -> None:
        if not cls.enabled:
            return
        with cls._lock:
            cls._timers.setdefault(name, _TimerStats()).add(seconds)

    @classmethod
    @contextmanager
    def time(cls, name: str, sync=None):
        """Context manager; pass ``sync=array_or_pytree`` to block on it.
        A CALLABLE sync is invoked at region exit (lazy: lets callers block
        on state produced inside the region — per-stage device profiling)."""
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync() if callable(sync) else sync)
            cls.add_time(name, time.perf_counter() - start)

    @classmethod
    def stats(cls, name: str) -> Optional[_TimerStats]:
        return cls._timers.get(name)

    @classmethod
    def reset(cls) -> None:
        with cls._lock:
            cls._timers.clear()

    @classmethod
    def snapshot(cls) -> Dict[str, tuple]:
        """{name: (count, total_seconds)} copy of the registry — cheap;
        diff two snapshots to attribute time to a run segment."""
        with cls._lock:
            return {k: (st.count, st.total) for k, st in cls._timers.items()}

    @staticmethod
    def delta(before: Dict[str, tuple], after: Dict[str, tuple],
              top: int = 6) -> Dict[str, float]:
        """Per-phase seconds spent between two snapshots (top-N by time)."""
        out = {}
        for name, (cnt, total) in after.items():
            b = before.get(name, (0, 0.0))
            d = total - b[1]
            if d > 1e-4:
                out[name] = d
        return dict(sorted(out.items(), key=lambda kv: -kv[1])[:top])

    @classmethod
    def report(cls, sort_by_total: bool = True) -> str:
        with cls._lock:
            items = sorted(
                cls._timers.items(),
                key=(lambda kv: -kv[1].total) if sort_by_total else (lambda kv: kv[0]),
            )
        lines = [
            f"{'timer':<44} {'count':>8} {'total[s]':>10} {'mean[ms]':>10}"
            f" {'min[ms]':>10} {'max[ms]':>10}"
        ]
        for name, st in items:
            lines.append(
                f"{name:<44} {st.count:>8} {st.total:>10.3f} {1e3 * st.mean:>10.3f}"
                f" {1e3 * st.min:>10.3f} {1e3 * st.max:>10.3f}"
            )
        return "\n".join(lines)

    @classmethod
    def save(cls, path: str) -> None:
        with open(path, "w") as f:
            f.write(cls.report() + "\n")


@contextmanager
def timed(name: str, sync=None):
    with Timing.time(name, sync=sync):
        yield
