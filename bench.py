#!/usr/bin/env python
"""Headline benchmark: Cornell-box PT trace+shade throughput (Mrays/s/chip).

Runs on whatever accelerator jax picks (one TPU chip under the driver).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 100 Mrays/s (the BASELINE.md north-star target).
"""

import json
import time

import jax
import numpy as np


def main():
  from etx_tracer_tpu.models import path_tracing
  from etx_tracer_tpu.render import film as film_mod
  from etx_tracer_tpu.scene import cornell

  size = 512
  b = cornell.build_cornell_box(film_size=(size, size), diffuse_only=True,
                                max_path_length=1023)
  scene, config = b.build()

  iters = 8
  # warmup/compile (pooled wavefront renderer with lane regeneration);
  # first_iteration is traced, so timed calls reuse the executable
  sums, rays = path_tracing.render_samples_static(scene, config, 0, iters)
  jax.block_until_ready(sums.table)

  # Under tunneled backends block_until_ready may not force completion;
  # a host transfer (float()) inside the timed region does.
  reps = 3
  float(rays)
  t0 = time.time()
  total_rays = 0.0
  for rep in range(1, 1 + reps):
    sums, rays = path_tracing.render_samples_static(scene, config, rep, iters)
    total_rays += float(rays)  # forces execution + transfer
  dt = time.time() - t0

  mrays = total_rays / dt / 1e6
  img = np.asarray(path_tracing.finalize_film(sums, iters).camera)
  assert np.isfinite(img).all(), "benchmark render produced non-finite values"

  print(json.dumps({
      "metric": "cornell_pt_trace_shade_throughput",
      "value": round(mrays, 3),
      "unit": "Mrays/s/chip",
      "vs_baseline": round(mrays / 100.0, 4),
  }))


if __name__ == "__main__":
  main()
