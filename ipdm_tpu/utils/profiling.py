"""Tracing / per-phase profiling.

The reference has no profiling beyond wall-clock prints in its native driver
(TASART2DNSL0_cpu.cpp:129-138). Here:

  * `PhaseTimer` — named wall-clock phases with running mean/total, a
    `phase(...)` contextmanager, and a one-line report. The engine times the
    proj-stage / convert / img-stage segments of every slice with it.
  * `device_trace(...)` — contextmanager around `jax.profiler.trace` for a
    full XLA device trace (TensorBoard-viewable), gated so it degrades to a
    no-op where the backend can't trace (e.g. through the axon relay).

Timing note: through tunneled backends `block_until_ready` may not fence all
buffer types; PhaseTimer.sync() uses a scalar readback when `strict=True`.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimer:
    def __init__(self, strict: bool = False):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.strict = strict

    @staticmethod
    def sync(x=None, strict: bool = False):
        if x is None:
            return
        import jax
        if strict:
            import jax.numpy as jnp
            float(jnp.asarray(x).ravel()[0])  # scalar readback fence
        else:
            jax.block_until_ready(x)

    @contextlib.contextmanager
    def phase(self, name: str, result_ref=None):
        t0 = time.time()
        holder = {}
        try:
            yield holder
        finally:
            self.sync(holder.get("out", result_ref), self.strict)
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def report(self) -> str:
        parts = []
        for k in sorted(self.totals):
            c = max(self.counts[k], 1)
            parts.append(f"{k}: {self.totals[k]:.2f}s"
                         f" ({self.totals[k]/c*1000:.0f}ms x{c})")
        return " | ".join(parts)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """XLA device trace → log_dir (view with TensorBoard's profile plugin).
    No-op when log_dir is None or the backend refuses to trace."""
    if not log_dir:
        yield
        return
    import jax
    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception as e:  # relay backends may not support profiling
        print(f"[profiling] device trace unavailable: {e}")
        yield
