"""Tracing / profiling utilities.

The reference has no profiling beyond wall-clock banners and timestamped
convergence rows (SURVEY.md section 5.1). Here:

  * `PhaseTimer` — lightweight per-phase wall-clock accumulation for the
    driver loop (device work timed via block_until_ready at phase edges),
  * `trace()` — context manager around jax.profiler for on-demand XLA traces
    (`--profile <dir>` in the CLI writes a TensorBoard-compatible trace),
  * the timestamped convergence rows themselves still provide the
    steps/second telemetry the reference derives its throughput from.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["phase timings:"]
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"  {name:<24s} {tot:8.2f} s total, {tot / max(n, 1) * 1e3:8.2f} ms/call x{n}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace wrapper; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
