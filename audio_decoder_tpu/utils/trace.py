"""Tracing, profiling scopes, and throughput metrics.

The reference's only observability is println! tracing in the parsers and
a REPL spinner (SURVEY §5).  The TPU build gets real instrumentation:
named profiler scopes (visible in XLA/jax-profiler traces), wall-clock
stage timers, and decode-throughput counters the benchmark and CLI share.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict

import jax


@dataclasses.dataclass
class StageStat:
    calls: int = 0
    seconds: float = 0.0
    items: float = 0.0  # stage-defined unit (audio-sec, files, bytes…)

    @property
    def rate(self) -> float:
        return self.items / self.seconds if self.seconds > 0 else 0.0


class Tracer:
    """Per-stage wall timers + counters with jax profiler annotation."""

    def __init__(self):
        self.stats: dict[str, StageStat] = defaultdict(StageStat)

    @contextlib.contextmanager
    def stage(self, name: str, items: float = 0.0):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                dt = time.perf_counter() - t0
                s = self.stats[name]
                s.calls += 1
                s.seconds += dt
                s.items += items

    def add(self, name: str, items: float) -> None:
        self.stats[name].items += items

    def report(self) -> str:
        lines = []
        for name in sorted(self.stats):
            s = self.stats[name]
            rate = f" ({s.rate:,.1f}/s)" if s.items else ""
            lines.append(
                f"{name}: {s.calls} calls, {s.seconds * 1e3:,.1f} ms{rate}"
            )
        return "\n".join(lines)

    def reset(self) -> None:
        self.stats.clear()


#: process-wide tracer the decode layer reports into (stage names
#: "decode/<family>", items = decoded audio-seconds); the CLI's --stats
#: flag and tests read it via report()/stats
TRACE = Tracer()


#: process-wide default tracer (CLI/bench attach here)
TRACER = Tracer()


@contextlib.contextmanager
def profile_to(log_dir: str):
    """Capture a jax profiler trace around a region (for tensorboard /
    xprof analysis of the decode pipeline)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
