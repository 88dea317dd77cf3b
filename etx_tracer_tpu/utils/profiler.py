"""Render observability: timings, throughput counters, device traces.

Counterpart of the reference's microprofile wrapper + Integrator::Status
(core/profiler.hxx, rt/integrators/integrator.hxx:24-37): wall-clock scopes
with a report, Mrays/s accounting, and optional jax.profiler device traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class Status:
  """Integrator::Status analogue."""
  completed_iterations: int = 0
  last_iteration_time: float = 0.0
  total_time: float = 0.0
  total_rays: float = 0.0

  @property
  def mrays_per_second(self) -> float:
    return self.total_rays / max(self.total_time, 1e-9) / 1e6


class Profiler:
  def __init__(self):
    self.scopes: dict[str, list[float]] = {}

  @contextlib.contextmanager
  def scope(self, name: str):
    t0 = time.perf_counter()
    try:
      yield
    finally:
      self.scopes.setdefault(name, []).append(time.perf_counter() - t0)

  def report(self) -> str:
    lines = []
    for name, times in sorted(self.scopes.items()):
      total = sum(times)
      lines.append(f"{name}: {total*1000:.1f}ms total, "
                   f"{total/len(times)*1000:.2f}ms avg over {len(times)} calls")
    return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
  """jax.profiler trace scope — inspect with TensorBoard/xprof."""
  import jax
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()
