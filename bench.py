#!/usr/bin/env python
"""Driver benchmark: one JSON line per BASELINE.md config.

Line 1 (headline, parsed by the driver): Cornell-box PT trace+shade
throughput in Mrays/s/chip, vs_baseline = value / 100 Mrays/s (the
BASELINE.md north-star target). Subsequent lines cover the remaining
baseline configs (materials/atmosphere spectral PT, volumetric BDPT,
caustics VCM, bigscene) so every pillar gets a recorded number
(VERDICT round-1 item 4).

Runs on whatever accelerator jax picks (one TPU chip under the driver).
"""

import json
import time

import jax
import numpy as np

# Persistent compilation cache: the big pool-render graphs take minutes to
# compile on this single-core host; cached executables make repeat bench
# runs (and the driver's end-of-round run after an interactive session)
# start in seconds instead.
jax.config.update("jax_compilation_cache_dir", "/tmp/etx_jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def _emit(metric, value, unit, vs_baseline):
  print(json.dumps({
      "metric": metric,
      "value": round(value, 4),
      "unit": unit,
      "vs_baseline": round(vs_baseline, 4),
  }), flush=True)


def bench_cornell_pt():
  from etx_tracer_tpu.models import path_tracing
  from etx_tracer_tpu.scene import cornell

  size = 512
  b = cornell.build_cornell_box(film_size=(size, size), diffuse_only=True,
                                max_path_length=1023)
  scene, config = b.build()

  iters = 16
  # warmup/compile (pooled wavefront renderer with lane regeneration);
  # first_iteration is traced, so timed calls reuse the executable.
  # pool 2^18 = one lane per pixel: measured best on v5e (127.6 vs 123.3
  # at 2^17 / 101.0 at 2^19 — wider pools lose to film-row bandwidth)
  pool = 1 << 18
  sums, rays = path_tracing.render_samples_compiled(scene, config, 0, iters,
                                                    pool)
  jax.block_until_ready(sums.table)

  # Under tunneled backends block_until_ready may not force completion;
  # a host transfer (float()) inside the timed region does.
  reps = 3
  float(rays)
  t0 = time.time()
  total_rays = 0.0
  for rep in range(1, 1 + reps):
    sums, rays = path_tracing.render_samples_compiled(scene, config, rep,
                                                      iters, pool)
    total_rays += float(rays)  # forces execution + transfer
  dt = time.time() - t0

  mrays = total_rays / dt / 1e6
  img = np.asarray(path_tracing.finalize_film(sums, iters).camera)
  assert np.isfinite(img).all(), "benchmark render produced non-finite values"
  _emit("cornell_pt_trace_shade_throughput", mrays, "Mrays/s/chip",
        mrays / 100.0)


def bench_time_to_1024spp():
  """BASELINE.md headline: time-to-1024spp, Cornell 512x512 (real render,
  not extrapolated). vs_baseline = (time the 100 Mrays/s north star would
  need for the same ray count) / measured time, so >1 beats the target."""
  from etx_tracer_tpu.models import path_tracing
  from etx_tracer_tpu.scene import cornell

  size = 512
  b = cornell.build_cornell_box(film_size=(size, size), diffuse_only=True,
                                max_path_length=1023)
  scene, config = b.build()

  chunk = 64  # iterations per jitted call (static arg; reuses executable)
  pool = 1 << 18
  # compile
  sums, rays = path_tracing.render_samples_compiled(scene, config, 0, chunk,
                                                    pool)
  jax.block_until_ready(sums.table)

  total_rays = 0.0
  t0 = time.time()
  acc = None
  for start in range(0, 1024, chunk):
    s, rays = path_tracing.render_samples_compiled(scene, config, start,
                                                   chunk, pool)
    acc = s.table if acc is None else acc + s.table  # FilmSums is additive
    total_rays += float(rays)  # forces completion per chunk
  dt = time.time() - t0
  sums = path_tracing.FilmSums(table=acc)

  img = np.asarray(path_tracing.finalize_film(sums, 1024).camera)
  assert np.isfinite(img).all()
  target_time = total_rays / 100e6
  _emit("cornell512_time_to_1024spp", dt, "s", target_time / dt)


def _pt_mrays(builder, iters=4, reps=2, pool=1 << 18):
  from etx_tracer_tpu.models import path_tracing
  scene, config = builder.build()
  sums, rays = path_tracing.render_samples_compiled(scene, config, 0, iters,
                                                    pool)
  jax.block_until_ready(sums.table)
  float(rays)
  t0 = time.time()
  total = 0.0
  for rep in range(1, 1 + reps):
    sums, rays = path_tracing.render_samples_compiled(scene, config, rep,
                                                      iters, pool)
    total += float(rays)
  dt = time.time() - t0
  img = np.asarray(path_tracing.finalize_film(sums, iters).camera)
  assert np.isfinite(img).all()
  return total / dt / 1e6


def bench_materials():
  """Config 2: conductor/dielectric/thinfilm showcase, spectral, 512²
  (film size per BASELINE.md; 256² gave every pool lane only 2 samples, so
  the measurement was dominated by the Russian-roulette tail)."""
  from benchmarks import scenes
  mrays = _pt_mrays(scenes.materials((512, 512)), iters=8)
  _emit("materials_spectral_pt_throughput", mrays, "Mrays/s/chip",
        mrays / 100.0)


def bench_atmosphere():
  """Config 3: atmosphere sun/sky + DOF, spectral, 512² (BASELINE.md)."""
  from benchmarks import scenes
  mrays = _pt_mrays(scenes.atmosphere_scene((512, 512)), iters=8)
  _emit("atmosphere_spectral_pt_throughput", mrays, "Mrays/s/chip",
        mrays / 100.0)


def _vcm_step_seconds(builder, options, reps=3):
  from etx_tracer_tpu.models import vcm
  from etx_tracer_tpu.render import film as film_mod
  scene, config = builder.build()
  fs = film_mod.allocate(config.film_width, config.film_height)
  fs = vcm.render_iteration(scene, config, options, fs, 0)  # compile
  jax.block_until_ready(fs.camera)
  t0 = time.time()
  for i in range(1, 1 + reps):
    fs = vcm.render_iteration(scene, config, options, fs, i)
    float(np.asarray(fs.iteration))  # host transfer forces completion
  dt = (time.time() - t0) / reps
  img = np.asarray(film_mod.result_image(fs))
  assert np.isfinite(img).all()
  return dt


def bench_volumetric():
  """Config 4: homogeneous fog BDPT (volumetric bidirectional)."""
  from benchmarks import scenes
  from etx_tracer_tpu.models import vcm
  dt = _vcm_step_seconds(scenes.volumetric((256, 256)), vcm.bdpt_options())
  # vs_baseline: speedup over the round-1 recorded ~0.3 s VCM camera step
  # at 16k lanes (PARITY.md) scaled to this lane count (65k lanes -> 1.2 s)
  _emit("volumetric_bdpt_step_time", dt, "s/iteration", 1.2 / max(dt, 1e-9))


def bench_caustics():
  """Config 5: SDS caustics, full VCM connect+merge, spectral."""
  from benchmarks import scenes
  from etx_tracer_tpu.models import vcm
  dt = _vcm_step_seconds(scenes.caustics((256, 256)), vcm.VCMOptions())
  _emit("caustics_vcm_step_time", dt, "s/iteration", 1.2 / max(dt, 1e-9))


def bench_bigscene():
  """15k-triangle scene through the fat-node Pallas BVH kernels, 512²."""
  from benchmarks import scenes
  mrays = _pt_mrays(scenes.bigscene((512, 512)), iters=8)
  _emit("bigscene_pt_throughput", mrays, "Mrays/s/chip", mrays / 100.0)


def bench_vcm_correctness():
  """BASELINE.md correctness gate: VCM vs converged PT on a non-SDS scene.

  Per-pixel RMSE at finite spp carries an MC noise floor ~C/sqrt(N); the
  1e-3 gate targets estimator BIAS, so alongside the raw per-pixel RMSE we
  emit the 8x8 box-downsampled RMSE (noise averages down 8x, bias does
  not). vs_baseline = 1e-3 / value (>1 = gate met)."""
  from etx_tracer_tpu.models import path_tracing, vcm
  from etx_tracer_tpu.render import film as film_mod
  from etx_tracer_tpu.scene import cornell

  b = cornell.build_cornell_box(film_size=(64, 64), diffuse_only=True,
                                max_path_length=8)
  scene, config = b.build()

  # 192 iters measured boxed-RMSE 0.0024 with a predicted noise floor
  # sigma/8 = 0.0021 — still noise-dominated, not bias; 768 puts the floor
  # near the 1e-3 gate
  n_vcm = 768
  fs = film_mod.allocate(config.film_width, config.film_height)
  options = vcm.VCMOptions()
  for i in range(n_vcm):
    fs = vcm.render_iteration(scene, config, options, fs, i)
  img_vcm = np.asarray(film_mod.result_image(fs))

  sums, _ = path_tracing.render_samples_compiled(scene, config, 0, 2048,
                                                 pool_size=1 << 16)
  img_pt = np.asarray(path_tracing.finalize_film(sums, 2048,
                                                 config.film_width).camera)

  diff = img_vcm - img_pt
  rmse = float(np.sqrt(np.mean(diff ** 2)))
  h, w, _ = diff.shape
  ds = img_vcm.reshape(h // 8, 8, w // 8, 8, 3).mean((1, 3)) \
      - img_pt.reshape(h // 8, 8, w // 8, 8, 3).mean((1, 3))
  rmse_ds = float(np.sqrt(np.mean(ds ** 2)))
  _emit("vcm_vs_pt_rmse", rmse, "RMSE", 1e-3 / max(rmse, 1e-12))
  _emit("vcm_vs_pt_rmse_8x8box", rmse_ds, "RMSE", 1e-3 / max(rmse_ds, 1e-12))


def main():
  bench_cornell_pt()  # headline first (driver parses line 1)
  for fn in (bench_time_to_1024spp, bench_vcm_correctness,
             bench_materials, bench_atmosphere, bench_volumetric,
             bench_caustics, bench_bigscene):
    try:
      fn()
    except Exception as e:  # keep the remaining configs running
      print(json.dumps({"metric": fn.__name__, "error": str(e)}), flush=True)


if __name__ == "__main__":
  main()
