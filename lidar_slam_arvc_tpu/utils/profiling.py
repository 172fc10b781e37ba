"""Tracing and per-stage timing (SURVEY.md §5: absent in the reference,
first-class here).

  * :class:`StageTimer` — named wall-clock counters with frames/s reporting,
    used by the pipeline drivers (replaces the reference's ad-hoc prints,
    run_scanmatcher.py:194,209-210).
  * :func:`trace` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable trace directory for kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class StageTimer:
    """Accumulates wall time + item counts per named stage."""

    def __init__(self):
        self.seconds = defaultdict(float)
        self.items = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[name] += time.perf_counter() - t0
            self.items[name] += items

    def rate(self, name: str) -> float | None:
        s = self.seconds.get(name, 0.0)
        n = self.items.get(name, 0)
        return n / s if s > 0 and n else None

    def report(self) -> dict:
        out = {}
        for name in self.seconds:
            out[name] = {"seconds": round(self.seconds[name], 4),
                         "items": self.items[name]}
            r = self.rate(name)
            if r is not None:
                out[name]["items_per_second"] = round(r, 2)
        return out

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)

    def __str__(self):
        parts = []
        for name, stats in sorted(self.report().items()):
            rate = stats.get("items_per_second")
            rate_s = f" ({rate}/s)" if rate else ""
            parts.append(f"{name}: {stats['seconds']}s{rate_s}")
        return " | ".join(parts)


def enable_compilation_cache(path: str, force: bool = False) -> None:
    """Persist compiled XLA executables to ``path`` across processes.

    Through remote-execution tunnels a distinct jitted program costs minutes
    to compile; the on-disk cache makes re-runs of the same program (same
    shapes/params) near-instant.  No reference counterpart (the reference
    has no compiled programs).  Harmless no-op if the backend refuses to
    serialize executables — JAX falls back to compiling.

    On the CPU backend this is a no-op unless ``force``: XLA:CPU AOT cache
    entries record tuning flags (+prefer-no-scatter) as machine features
    and warn loudly on every reload, and CPU compiles are seconds anyway —
    the cache exists for accelerator programs.
    """
    import jax
    if jax.default_backend() == "cpu" and not force:
        return
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every program regardless of size/compile time: the per-program
    # dispatch overhead we are avoiding is the tunnel round-trip, not the
    # local compile
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


class CompileCounter:
    """Counts distinct XLA compilations (and their wall time) in a scope.

    Through remote-execution tunnels every distinct program costs minutes;
    this makes the program count a first-class, regression-trackable metric
    (BENCH r2 postmortem: preprocess-incl-compile grew 5x when kernel
    variants multiplied).  Counts '/jax/core/compile/backend_compile'
    events via jax.monitoring; note JAX compiles a few tiny internal
    helpers on first use, so the count is an upper bound on user programs —
    the durations are what matter.
    """

    _EVENT = "/jax/core/compile/backend_compile_duration"

    def __init__(self):
        self.events = []

    @property
    def count(self) -> int:
        return len(self.events)

    @property
    def seconds(self) -> float:
        return float(sum(self.events))

    @contextlib.contextmanager
    def scope(self):
        from jax import monitoring

        def listener(name, duration, **kw):
            if name == self._EVENT:
                self.events.append(duration)

        monitoring.register_event_duration_secs_listener(listener)
        try:
            yield self
        finally:
            try:
                monitoring.unregister_event_duration_listener(listener)
            except Exception:
                pass  # older JAX: listener stays, harmlessly appending

    def report(self) -> dict:
        return {"programs_compiled": self.count,
                "compile_seconds": round(self.seconds, 3)}


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace (view with TensorBoard's profile plugin)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
