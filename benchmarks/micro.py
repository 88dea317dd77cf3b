"""Micro-benchmarks for round-3 perf work: trace kernels, sorts, dispatch.

Run on the real chip: `python -m benchmarks.micro trace|sort|dispatch|mxu`.

Methodology: the device tunnel costs ~27ms per host sync and ~1.5ms per
dispatched call, so every measurement CHAINS the op K times inside one jit
(data-dependent, so steps serialize on device) and reports device time/op.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _chain_time(step, state0, n_iter=10, reps=3):
  """step: state -> state (jittable). Returns seconds per step on device."""

  @jax.jit
  def run(state):
    return jax.lax.fori_loop(0, n_iter, lambda i, s: step(s), state)

  out = run(state0)
  jax.block_until_ready(out)
  np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
  t0 = time.time()
  for _ in range(reps):
    out = run(state0)
  np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
  return (time.time() - t0) / (reps * n_iter)


def _rays(scene, num_r, kind, seed=0):
  """Ray sets: 'primary' (coherent camera rays), 'bounce' (origins on
  surfaces, random hemisphere), 'random' (fully incoherent)."""
  rs = np.random.RandomState(seed)
  c = np.asarray(scene.bsphere_center)
  r = float(scene.bsphere_radius)
  if kind == "primary":
    o = np.tile(c + np.array([0, 0, 2.2 * r]), (num_r, 1)).astype(np.float32)
    side = int(np.sqrt(num_r))
    xs = (np.arange(num_r) % side) / side - 0.5
    ys = (np.arange(num_r) // side % side) / side - 0.5
    d = np.stack([xs * 0.8, ys * 0.8, -np.ones(num_r)], 1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
  elif kind == "bounce":
    u = rs.normal(size=(num_r, 3)).astype(np.float32)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    o = (c + u * r * 0.7).astype(np.float32)
    d = rs.normal(size=(num_r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
  else:  # random
    o = (c + rs.uniform(-0.9, 0.9, (num_r, 3)) * r).astype(np.float32)
    d = rs.normal(size=(num_r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
  t_min = np.full(num_r, 1e-4, np.float32)
  t_max = np.full(num_r, 1e30, np.float32)
  return (jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_min),
          jnp.asarray(t_max))


def _dep(x):
  """A value-preserving but non-foldable data dependency: adding
  1e-30*clamped(x) to O(1) coordinates rounds to identity in f32, yet XLA
  cannot fold it away (0.0*x folds once x is provably finite, which lets
  CSE hoist loop-invariant kernels OUT of the chain — measured)."""
  return 1e-30 * jnp.minimum(jnp.abs(x.astype(jnp.float32)), 1.0)


def _trace_chain(trace_fn, o, d, tmin, tmax):
  """Chain traces with a data dependency through the origin jitter."""

  def step(state):
    o_cur, acc = state
    hit = trace_fn(o_cur, d, tmin, tmax)
    t = jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)
    return o_cur + _dep(t)[:, None], acc + jnp.sum(t)

  return step, (o, jnp.float32(0))


def _occ_chain(occ_fn, o, d, tmin, tmax):
  def step(state):
    o_cur, acc = state
    occ = occ_fn(o_cur, d, tmin, tmax).astype(jnp.float32)
    return o_cur + _dep(occ)[:, None], acc + jnp.sum(occ)

  return step, (o, jnp.float32(0))


def bench_trace():
  from benchmarks import scenes
  from etx_tracer_tpu.ops import pallas_trace

  scene, config = scenes.bigscene((256, 256)).build()
  num_t = scene.tri_v0.shape[0]
  print(f"bigscene tris={num_t} nodes={scene.bvh.node_min.shape[0]} "
        f"fat={None if scene.bvh.fat_rows is None else scene.bvh.fat_rows.shape}")

  num_r = 1 << 16
  for kind in ("primary", "bounce", "random"):
    o, d, tmin, tmax = _rays(scene, num_r, kind)
    for rb in (16, 8):
      fn = lambda o, d, tmin, tmax, rb=rb: pallas_trace.intersect_bvh_fat_pallas(
          scene.bvh, scene.tri_v0, scene.tri_e1, scene.tri_e2,
          o, d, tmin, tmax, rb=rb)
      step, st = _trace_chain(fn, o, d, tmin, tmax)
      dt = _chain_time(step, st)
      print(f"fat  {kind:8s} rb={rb:2d}: {dt*1e3:7.2f} ms  "
            f"{num_r/dt/1e6:8.2f} Mrays/s")
    fn = lambda o, d, tmin, tmax: pallas_trace.intersect_pallas(
        scene.tri_v0, scene.tri_e1, scene.tri_e2, o, d, tmin, tmax)
    step, st = _trace_chain(fn, o, d, tmin, tmax)
    dt = _chain_time(step, st)
    print(f"brute {kind:8s}      : {dt*1e3:7.2f} ms  "
          f"{num_r/dt/1e6:8.2f} Mrays/s")


def bench_trace_brute():
  """Small-scene dense kernels head-to-head: brute2 (MT pair-tile) vs woop
  (MXU unit-triangle transform), chained on-device (tunnel latency
  excluded). Sizes bracket the brute/BVH switchover."""
  from benchmarks import scenes
  from etx_tracer_tpu.ops import pallas_trace

  num_r = 1 << 18
  for scene_name, size_note in (("materials", "996 tris"),
                                ("caustics", "~1k tris"),
                                ("bigscene", "15k tris")):
    builder = getattr(scenes, scene_name, None) or getattr(
        scenes, scene_name + "_scene")
    scene, _ = builder((256, 256)).build()
    num_t = scene.tri_v0.shape[0]
    o, d, tmin, tmax = _rays(scene, num_r, "random")
    print(f"{scene_name}: tris={num_t} rays={num_r} (random)")
    for label, fn in (
        ("brute2", pallas_trace.intersect_brute2_pallas),
        ("woop", pallas_trace.intersect_woop_pallas),
    ):
      tr = lambda o, d, tmin, tmax, fn=fn: fn(
          scene.tri_v0, scene.tri_e1, scene.tri_e2, o, d, tmin, tmax)
      step, st = _trace_chain(tr, o, d, tmin, tmax)
      dt = _chain_time(step, st)
      print(f"  {label:7s} closest: {dt*1e3:7.2f} ms  "
            f"{num_r/dt/1e6:8.2f} Mrays/s  {num_r*num_t/dt/1e9:7.1f} Gpairs/s")
    for label, fn in (
        ("brute2", pallas_trace.occluded_brute2_pallas),
        ("woop", pallas_trace.occluded_woop_pallas),
    ):
      oc = lambda o, d, tmin, tmax, fn=fn: fn(
          scene.tri_v0, scene.tri_e1, scene.tri_e2, o, d, tmin, tmax)
      step, st = _occ_chain(oc, o, d, tmin, tmax)
      dt = _chain_time(step, st)
      print(f"  {label:7s} anyhit : {dt*1e3:7.2f} ms  "
            f"{num_r/dt/1e6:8.2f} Mrays/s")


def bench_trace_sorted():
  """Fat kernel on rays pre-sorted by Morton-of-origin+octant (device sort
  inside the chain, so its cost is included)."""
  from benchmarks import scenes
  from etx_tracer_tpu.ops import pallas_trace, trace as trace_ops

  scene, config = scenes.bigscene((256, 256)).build()
  num_r = 1 << 16
  for kind in ("bounce", "random"):
    o, d, tmin, tmax = _rays(scene, num_r, kind)

    def trace_sorted(o_cur, d, tmin, tmax):
      key = trace_ops._ray_sort_keys(scene.bvh, o_cur, d).astype(jnp.int32)
      perm = jnp.argsort(key)
      hs = pallas_trace.intersect_bvh_fat_pallas(
          scene.bvh, scene.tri_v0, scene.tri_e1, scene.tri_e2,
          o_cur[perm], d[perm], tmin[perm], tmax[perm], rb=16)
      inv = jnp.zeros_like(perm).at[perm].set(
          jnp.arange(num_r, dtype=perm.dtype))
      return trace_ops.Hit(hs.t[inv], hs.tri[inv], hs.u[inv], hs.v[inv])

    step, st = _trace_chain(trace_sorted, o, d, tmin, tmax)
    dt = _chain_time(step, st)
    print(f"fat+sort {kind:8s}: {dt*1e3:7.2f} ms  {num_r/dt/1e6:8.2f} Mrays/s")


def bench_trace_oracle():
  """Upper bound for sorted shared traversal: rays pre-sorted by their TRUE
  hit (triangle id, or hit-position Morton) — measures the fat kernel on
  destination-coherent tiles at several tile sizes."""
  from benchmarks import scenes
  from etx_tracer_tpu.ops import pallas_trace, trace as trace_ops

  scene, config = scenes.bigscene((256, 256)).build()
  num_r = 1 << 16
  for kind in ("bounce", "random"):
    o, d, tmin, tmax = _rays(scene, num_r, kind)
    hit = pallas_trace.intersect_bvh_fat_pallas(
        scene.bvh, scene.tri_v0, scene.tri_e1, scene.tri_e2,
        o, d, tmin, tmax, rb=16)
    # (a) sort by hit triangle id (misses last)
    key_tri = jnp.where(hit.tri >= 0, hit.tri, 1 << 30).astype(jnp.int32)
    # (b) sort by hit-position morton
    hp = o + d * jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)[:, None]
    root_min = scene.bvh.node_min[0]
    root_ext = jnp.maximum(scene.bvh.node_max[0] - root_min, 1e-6)
    q = jnp.clip((hp - root_min) / root_ext, 0.0, 1.0)
    cell = (q * 511.0).astype(jnp.uint32)
    key_pos = (trace_ops._spread3(cell[:, 0])
               | (trace_ops._spread3(cell[:, 1]) << 1)
               | (trace_ops._spread3(cell[:, 2]) << 2)).astype(jnp.int32)
    for name, key in (("tri", key_tri), ("pos", key_pos)):
      perm = jnp.argsort(key)
      os, ds = o[perm], d[perm]
      ts, xs = tmin[perm], tmax[perm]
      for rb in (16, 8):  # rb<8 blocks no longer lower (Pallas 8x128 rule)
        fn = lambda o_, d_, tn, tx, rb=rb: pallas_trace.intersect_bvh_fat_pallas(
            scene.bvh, scene.tri_v0, scene.tri_e1, scene.tri_e2,
            o_, d_, tn, tx, rb=rb)
        step, st = _trace_chain(fn, os, ds, ts, xs)
        dt = _chain_time(step, st)
        print(f"oracle[{name}] {kind:7s} rb={rb:2d}: {dt*1e3:7.2f} ms  "
              f"{num_r/dt/1e6:8.2f} Mrays/s", flush=True)


def bench_sort():
  """Device-time sort/permute costs at wavefront widths."""
  for n in (1 << 14, 1 << 16, 1 << 17):
    keys0 = jnp.asarray(np.random.randint(0, 1 << 30, n, np.int32))
    payload0 = jnp.asarray(np.random.rand(n, 16).astype(np.float32))

    def step_sort(state):
      keys, acc = state
      k2, v = jax.lax.sort_key_val(keys, jnp.arange(n, dtype=jnp.int32))
      return keys ^ (v[0] & 1), acc + k2[0]

    dt = _chain_time(step_sort, (keys0, jnp.int32(0)))
    print(f"sort_key_val   n={n:7d}: {dt*1e3:7.3f} ms")

    def step_perm(state):
      p, acc = state
      q = p[jnp.argsort(p[:, 0])]
      return q, acc + q[0, 0]

    dt = _chain_time(step_perm, (payload0, jnp.float32(0)))
    print(f"argsort+permute(n,16) n={n:7d}: {dt*1e3:7.3f} ms")

    def step_cumsum(state):
      k, acc = state
      c = jnp.cumsum(k)
      return k ^ (c[-1] & 1), acc + c[0]

    dt = _chain_time(step_cumsum, (keys0, jnp.int32(0)))
    print(f"cumsum         n={n:7d}: {dt*1e3:7.3f} ms")

    def step_scatter(state):
      p, acc = state
      idx = (p[:, 0] * n).astype(jnp.int32) % n
      q = jnp.zeros_like(p).at[idx].add(p)
      return q * 0.5 + p * 0.5, acc + q[0, 0]

    dt = _chain_time(step_scatter, (payload0, jnp.float32(0)))
    print(f"scatter-add (n,16) n={n:7d}: {dt*1e3:7.3f} ms")


def bench_mxu():
  """MXU candidate shapes for the binned-brute tracer: (R,16)@(16,4T)."""
  for r, t4 in ((1 << 16, 2048), (1 << 16, 8192), (1 << 14, 2048)):
    a0 = jnp.asarray(np.random.rand(r, 16).astype(np.float32))
    b0 = jnp.asarray(np.random.rand(16, t4).astype(np.float32))

    def step(state):
      a, acc = state
      out = jnp.dot(a, b0, precision=jax.lax.Precision.HIGHEST)
      return a + 0.0 * out[:, :16], acc + out[0, 0]

    dt = _chain_time(step, (a0, jnp.float32(0)))
    flops = 2 * r * 16 * t4
    print(f"matmul f32 ({r},16)@(16,{t4}): {dt*1e3:7.3f} ms "
          f"{flops/dt/1e12:6.2f} TFLOP/s")

    def step_ep(state):
      a, acc = state
      out = jnp.dot(a, b0, precision=jax.lax.Precision.HIGHEST)
      det = out[:, 0::4]
      u = out[:, 1::4]
      v = out[:, 2::4]
      tt = out[:, 3::4]
      s = jnp.sign(det)
      ok = (u * s >= 0) & (v * s >= 0) & ((u + v) * s <= det * s) & (
          jnp.abs(det) > 1e-9)
      t = jnp.where(ok, tt / jnp.where(det == 0, 1.0, det), jnp.inf)
      j = jnp.argmin(t, axis=-1)
      best = t[jnp.arange(r), j]
      return a + 0.0 * best[:, None], acc + jnp.sum(jnp.where(
          jnp.isfinite(best), best, 0.0))

    dt = _chain_time(step_ep, (a0, jnp.float32(0)))
    print(f"  +epilogue+argmin          : {dt*1e3:7.3f} ms "
          f"-> {r*(t4//4)/dt/1e9:6.2f} Gpairs/s")


def bench_dispatch():
  """Per-class cost of BSDF sample over a wavefront (what material sorting
  can save), measured as device time via chaining."""
  from benchmarks import scenes
  from etx_tracer_tpu.models import path_tracing
  from etx_tracer_tpu.render.bsdf import dispatch, lobes
  from etx_tracer_tpu.core import rng as rng_mod
  from etx_tracer_tpu.ops import trace as trace_ops
  from etx_tracer_tpu.core import spectrum as sp_mod

  scene, config = scenes.materials((256, 256)).build()
  state = path_tracing.make_payload(scene, config, 0)
  r = state.ray_o.shape[0]
  print(f"wavefront r={r} classes={config.material_classes} "
        f"spectral={config.spectral}")

  hit = trace_ops.trace_closest(scene, state.ray_o, state.ray_d,
                                state.t_min, state.t_max)
  pos, nrm, tan, btn, uv, bc, tri, trows = path_tracing._interpolate_hit(
      scene, hit, state.ray_d)
  mat = path_tracing._gather_mat(scene, trows.mat)
  sd = lobes.ShadingData(w_i=state.ray_d, nrm=nrm, tan=tan, btn=btn,
                         geo_n=trows.geo_n, tex=uv, wl=state.wl,
                         medium=state.medium, mat=mat)
  rng_state, rnd0 = rng_mod.next_n(state.rng_state, dispatch.NUM_SAMPLE_RND)
  sc = scene
  if config.spectral:
    sc = scene._replace(
        spec_at_wl=(state.wl, sp_mod.bank_at_wl(scene.spec_values, state.wl)))

  classes = config.material_classes

  def chain(fn):
    def step(state):
      rnd, acc = state
      out = fn(rnd)
      w = out.weight if hasattr(out, "weight") else out[0]
      return rnd + 0.0 * jnp.sum(w), acc + jnp.sum(w)
    return _chain_time(step, (rnd0, jnp.float32(0)), n_iter=5)

  dt = chain(lambda rnd: dispatch.sample(sc, sd, rnd, config.spectral, classes))
  print(f"sample all-classes      : {dt*1e3:7.2f} ms")
  for cls in classes:
    dt = chain(lambda rnd, cls=cls: dispatch.sample(
        sc, sd, rnd, config.spectral, (cls,)))
    print(f"sample class {int(cls):2d}         : {dt*1e3:7.2f} ms")
  dt = chain(lambda rnd: dispatch.evaluate(
      sc, sd, -state.ray_d, config.spectral, classes))
  print(f"evaluate all-classes    : {dt*1e3:7.2f} ms")


def bench_step(config_name="materials"):
  """Per-phase device-time breakdown of pt_step on a benchmark config."""
  from benchmarks import scenes
  from etx_tracer_tpu.models import path_tracing
  from etx_tracer_tpu.render.bsdf import dispatch, lobes
  from etx_tracer_tpu.core import rng as rng_mod
  from etx_tracer_tpu.ops import trace as trace_ops
  from etx_tracer_tpu.core import spectrum as sp_mod
  from etx_tracer_tpu.render import emitters as emitters_mod
  from etx_tracer_tpu.render import spectral as spx

  builder = getattr(scenes, config_name, None) or getattr(
      scenes, config_name + "_scene")
  scene, config = builder().build()
  state = path_tracing.make_payload(scene, config, 0)
  r = state.ray_o.shape[0]
  print(f"{config_name}: r={r} tris={scene.tri_v0.shape[0]} "
        f"classes={config.material_classes} spectral={config.spectral} "
        f"envs={config.num_env_emitters} media={config.has_media}")

  # full step
  def step_full(s):
    ns = path_tracing.pt_step(scene, config, s, deferred_nee=not config.has_media)
    return ns._replace(alive=s.alive)  # keep width/liveness stable

  dt = _chain_time(step_full, state, n_iter=16)
  print(f"pt_step full            : {dt*1e3:7.2f} ms")

  # pieces (each chained with a data dependency through ray_o)
  def piece(fn, label, st0=None):
    def step(carry):
      x, acc = carry
      out = fn(x)
      s = jnp.sum(out[0] if isinstance(out, tuple) else out)
      return x + _dep(s), acc + s
    dt = _chain_time(step, (state.ray_o if st0 is None else st0,
                            jnp.float32(0)), n_iter=16)
    print(f"{label:24s}: {dt*1e3:7.2f} ms")
    return dt

  piece(lambda o: trace_ops.trace_closest(
      scene, o, state.ray_d, state.t_min, state.t_max).t, "trace_closest")
  piece(lambda o: trace_ops.trace_occluded(
      scene, o, state.ray_d, state.t_min,
      jnp.full(r, 1e3)).astype(jnp.float32), "trace_occluded")

  if config.spectral:
    piece(lambda o: sp_mod.bank_at_wl(scene.spec_values,
                                      state.wl + 0.0 * o[:, 0]),
          "bank_at_wl")

  hit = trace_ops.trace_closest(scene, state.ray_o, state.ray_d,
                                state.t_min, state.t_max)

  def interp(o):
    h2 = trace_ops.Hit(hit.t, hit.tri, hit.u + 0.0 * o[:, 0], hit.v)
    pos, nrm, tan, btn, uv, bc, tri, trows = path_tracing._interpolate_hit(
        scene, h2, state.ray_d)
    mat = path_tracing._gather_mat(scene, trows.mat)
    return pos + nrm + tan, 0

  piece(lambda o: interp(o)[0], "interpolate+mat")

  pos, nrm, tan, btn, uv, bc, tri, trows = path_tracing._interpolate_hit(
      scene, hit, state.ray_d)
  mat = path_tracing._gather_mat(scene, trows.mat)
  sd = lobes.ShadingData(w_i=state.ray_d, nrm=nrm, tan=tan, btn=btn,
                         geo_n=trows.geo_n, tex=uv, wl=state.wl,
                         medium=state.medium, mat=mat)
  sc = scene
  if config.spectral:
    sc = scene._replace(
        spec_at_wl=(state.wl, sp_mod.bank_at_wl(scene.spec_values, state.wl)))
  rng_state, rnd0 = rng_mod.next_n(state.rng_state, dispatch.NUM_SAMPLE_RND)

  def emit_fn(o):
    rs = state.rng_state + (0.0 * o[:, 0]).astype(jnp.uint32)
    _, rnd_sel = rng_mod.next_float(rs)
    _, rnd_em = rng_mod.next_2d(rs)
    em_idx, _ = emitters_mod.sample_emitter_index(sc, rnd_sel)
    esmp = emitters_mod.sample_emitter(sc, em_idx, rnd_em, pos, state.wl,
                                       config.spectral,
                                       classes=config.emitter_classes)
    return esmp.value, 0

  piece(lambda o: emit_fn(o)[0], "sample_emitter(NEE)")

  if config.num_env_emitters > 0:
    piece(lambda o: emitters_mod.env_contribution(
        sc, state.ray_d + 0.0 * o, state.wl, state.path_length == 1,
        state.mis_flag, state.bsdf_pdf, config.num_env_emitters,
        config.spectral), "env_contribution")

  piece(lambda o: emitters_mod.area_radiance(
      sc, jnp.maximum(trows.emitter, 0), state.wl, o, pos, uv,
      state.path_length == 1, config.spectral)[0], "area_radiance")

  def samp(o):
    rnd = rnd0 + 0.0 * o[:, :dispatch.NUM_SAMPLE_RND]
    out = dispatch.sample(sc, sd, rnd, config.spectral,
                          config.material_classes, config.diffuse_variations)
    return out.weight, 0

  st7 = jnp.tile(state.ray_o, (1, 3))[:, :dispatch.NUM_SAMPLE_RND]
  piece(lambda o: samp(o)[0], "bsdf.sample", st0=st7)

  def ev(o):
    w_o = -state.ray_d + 0.0 * o[:, :3]
    b, p = dispatch.evaluate(sc, sd, w_o, config.spectral,
                             config.material_classes,
                             config.diffuse_variations)
    return b, 0

  piece(lambda o: ev(o)[0], "bsdf.evaluate", st0=st7)

  piece(lambda o: spx.to_film_rgb(
      jnp.abs(o[:, :1]), state.wl, config.spectral), "to_film_rgb")


if __name__ == "__main__":
  which = sys.argv[1] if len(sys.argv) > 1 else "trace"
  if which == "step":
    bench_step(sys.argv[2] if len(sys.argv) > 2 else "materials")
  else:
    dict(trace=bench_trace, trace_brute=bench_trace_brute,
         trace_sorted=bench_trace_sorted, sort=bench_sort,
         trace_oracle=bench_trace_oracle,
         dispatch=bench_dispatch, mxu=bench_mxu)[which]()
