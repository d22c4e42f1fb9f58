"""Lightweight per-stage timer, the analogue of the reference's TimerOutputs
integration (reference: src/plan.jl:282-286, src/NonuniformFFTs.jl:157-185).

When ``synchronise=True`` each stage calls ``block_until_ready`` on its result
so device timings are honest (the analogue of ``KA.synchronize`` in
src/plan.jl:453-454).  Inside ``jax.jit`` the timer is inert (stages fuse), so
it is only meaningful when the pipeline is run eagerly / per-stage.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax


class Timer:
    def __init__(self, synchronise: bool = False):
        self.synchronise = synchronise
        self.times = defaultdict(float)
        self.counts = defaultdict(int)
        self._stack = []

    @contextmanager
    def section(self, name: str):
        label = "/".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._stack.pop()
            self.times[label] += time.perf_counter() - t0
            self.counts[label] += 1

    def sync(self, value):
        """Block on `value` if synchronisation is enabled; returns `value`."""
        if self.synchronise:
            try:
                jax.block_until_ready(value)
            except Exception:
                pass
        return value

    def reset(self):
        self.times.clear()
        self.counts.clear()

    def __repr__(self):
        lines = ["Timer:"]
        for label in sorted(self.times, key=self.times.get, reverse=True):
            lines.append(
                f"  {label:<40s} {self.times[label] * 1e3:10.3f} ms"
                f"  ({self.counts[label]} calls)"
            )
        return "\n".join(lines)
