"""Tracing / profiling utilities (SURVEY §5 'Tracing / profiling').

The reference's only observability is wall-clock FPS counters
(infer_two_stage_burr.py:267-371). Here: jax.profiler device traces plus a
light per-stage wall-clock aggregator for the host loop (the on-frame FPS
HUD lives in pipeline.visualize.draw_hud).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard-compatible) around a block:

        with device_trace("/tmp/trace"):
            for batch in ...:
                step(...)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Per-stage wall-clock aggregation for host-side loops.

        timer = StageTimer()
        with timer("decode"): ...
        with timer("device_step"): ...
        print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, stage: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[stage] += time.perf_counter() - t0
            self.counts[stage] += 1

    def report(self) -> str:
        lines = []
        for stage in sorted(self.totals, key=lambda s: -self.totals[s]):
            total = self.totals[stage]
            n = max(self.counts[stage], 1)
            lines.append(f"{stage:<20s} {total:8.3f}s total "
                         f"{total / n * 1000:8.2f} ms/call x{n}")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {s: {"total_sec": self.totals[s], "calls": self.counts[s]}
                for s in self.totals}
