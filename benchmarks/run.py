"""Benchmark runner for the five BASELINE.json configs.

Usage: python benchmarks/run.py [--configs 1,2,3] [--spp N] [--size WxH]
Prints one JSON line per config: name, seconds, spp, mrays, and a
cross-integrator RMSE where the config calls for a bidirectional method.
NOTE: rmse_vs_pt at equal low spp is Monte-Carlo-noise-dominated — it is
a sanity indicator, NOT a pass/fail gate. The correctness gate lives in
tests/test_golden.py: the device estimator is anchored to an independent
NumPy implementation of the reference estimator within MC tolerance.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _timed(fn, warmup=True):
  if warmup:  # compile outside the timed region (first jit is ~20-40s)
    out = fn()
    np.asarray(out[0].table if hasattr(out[0] if isinstance(out, tuple) else out, "table") else (out[0] if isinstance(out, tuple) else out))
  t0 = time.time()
  out = fn()
  o = out[0] if isinstance(out, tuple) else out
  np.asarray(o.table if hasattr(o, "table") else o)  # force completion
  return out, time.time() - t0


def run_config(name, size, spp):
  import jax.numpy as jnp  # noqa
  from benchmarks import scenes  # noqa: E402
  from etx_tracer_tpu.models import path_tracing, vcm
  from etx_tracer_tpu.render import film as film_mod
  from etx_tracer_tpu.utils import image_io

  result = {"config": name, "size": list(size), "spp": spp}

  if name == "cornell_pt":
    b = scenes.cornell_pt(size)
    scene, config = b.build()
    (sums, rays), dt = _timed(
        lambda: path_tracing.render_samples_static(scene, config, 0, spp))
    result["seconds"] = round(dt, 3)
    result["mrays_per_s"] = round(float(rays) / dt / 1e6, 3)
    img = np.asarray(path_tracing.finalize_film(sums, spp, config.film_width).camera)
  elif name == "materials":
    b = scenes.materials(size)
    scene, config = b.build()
    (sums, rays), dt = _timed(
        lambda: path_tracing.render_samples_static(scene, config, 0, spp))
    result["seconds"] = round(dt, 3)
    result["mrays_per_s"] = round(float(rays) / dt / 1e6, 3)
    img = np.asarray(path_tracing.finalize_film(sums, spp, config.film_width).camera)
  elif name == "atmosphere":
    b = scenes.atmosphere_scene(size)
    scene, config = b.build()
    (sums, rays), dt = _timed(
        lambda: path_tracing.render_samples_static(scene, config, 0, spp))
    result["seconds"] = round(dt, 3)
    result["mrays_per_s"] = round(float(rays) / dt / 1e6, 3)
    img = np.asarray(path_tracing.finalize_film(sums, spp, config.film_width).camera)
  elif name == "volumetric":
    b = scenes.volumetric(size)
    scene, config = b.build()
    fs, dt = _timed(lambda: vcm.render(scene, config, iterations=spp,
                                       options=vcm.bdpt_options()))
    result["seconds"] = round(dt, 3)
    img = np.asarray(film_mod.result_image(fs))
    # cross-check vs PT
    fs_pt = path_tracing.render(scene, config, iterations=spp)
    pt_img = np.asarray(film_mod.result_image(fs_pt))
    result["rmse_vs_pt"] = round(image_io.rmse(img, pt_img), 5)
  elif name == "caustics":
    b = scenes.caustics(size)
    scene, config = b.build()
    fs, dt = _timed(lambda: vcm.render(scene, config, iterations=spp))
    result["seconds"] = round(dt, 3)
    img = np.asarray(film_mod.result_image(fs))
    fs_pt = path_tracing.render(scene, config, iterations=spp)
    pt_img = np.asarray(film_mod.result_image(fs_pt))
    result["rmse_vs_pt"] = round(image_io.rmse(img, pt_img), 5)
  elif name == "bigscene":
    b = scenes.bigscene(size)
    scene, config = b.build()
    result["triangles"] = int(scene.tri_idx.shape[0])
    (sums, rays), dt = _timed(
        lambda: path_tracing.render_samples_static(scene, config, 0, spp))
    result["seconds"] = round(dt, 3)
    result["mrays_per_s"] = round(float(rays) / dt / 1e6, 3)
    img = np.asarray(path_tracing.finalize_film(sums, spp, config.film_width).camera)
  else:
    raise ValueError(name)

  result["mean"] = round(float(img.mean()), 6)
  result["finite"] = bool(np.isfinite(img).all())
  return result, img


CONFIGS = ["cornell_pt", "materials", "atmosphere", "volumetric", "caustics",
           "bigscene"]


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument("--configs", default="1,2,3,4,5")
  p.add_argument("--spp", type=int, default=16)
  p.add_argument("--size", default="256x256")
  p.add_argument("--save", default=None, help="directory for EXR outputs")
  args = p.parse_args(argv)
  w, h = args.size.lower().split("x")
  size = (int(w), int(h))
  for ci in args.configs.split(","):
    name = CONFIGS[int(ci) - 1]
    try:
      result, img = run_config(name, size, args.spp)
      if args.save:
        import os
        from etx_tracer_tpu.utils import image_io
        os.makedirs(args.save, exist_ok=True)
        image_io.save_exr(os.path.join(args.save, f"{name}.exr"), img)
      print(json.dumps(result))
    except Exception as e:  # keep going; report the failure
      print(json.dumps({"config": name, "error": str(e)}))
      raise


if __name__ == "__main__":
  main()
