"""Sharded rendering over a device mesh.

Strategy (SURVEY.md §2.7): data-parallel over pixels — the film's row axis
shards across the mesh 'pixels' axis, the scene replicates, RNG streams are
already per-pixel so no key plumbing is needed. Camera-path accumulation is
local to each shard; light-tracing splats (BDPT/VCM) go into per-device
film shards and are psum'd at commit (the XLA-collective replacement for
atomic_add_float, film.cxx:147-171).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from etx_tracer_tpu.models import path_tracing
from etx_tracer_tpu.render import film as film_mod


def make_mesh(devices=None, axis_name: str = "pixels") -> Mesh:
  import numpy as np
  devices = devices if devices is not None else jax.devices()
  return Mesh(np.asarray(devices).reshape(-1), (axis_name,))


def shard_film(film_state: film_mod.FilmState, mesh: Mesh) -> film_mod.FilmState:
  """Place film arrays with rows sharded across the mesh."""
  sharding = NamedSharding(mesh, P("pixels"))
  scalar = NamedSharding(mesh, P())

  def place(x):
    if x.ndim >= 2:
      return jax.device_put(x, sharding)
    return jax.device_put(x, scalar)

  return jax.tree_util.tree_map(place, film_state)


def replicate_scene(scene, mesh: Mesh):
  rep = NamedSharding(mesh, P())
  return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), scene)


def render_iteration_sharded(scene, config, film_state, iteration, mesh: Mesh):
  """One sharded film iteration: each device renders its row slice.

  Uses shard_map so each device traces only its own pixel rows; the scene
  is replicated. The per-shard config narrows the film height.
  """
  n_dev = mesh.devices.size
  h = config.film_height
  assert h % n_dev == 0, f"film height {h} must divide device count {n_dev}"
  local_config = dataclasses.replace(config, film_height=h // n_dev)

  def shard_fn(scene_rep, film_shard, it):
    axis = jax.lax.axis_index("pixels")
    # each shard renders rows [axis*local_h, (axis+1)*local_h) by offsetting
    # the pixel indices through the iteration seed's pixel id
    return _render_rows(scene_rep, local_config, film_shard, it,
                        axis * local_config.film_height, h)

  fn = jax.shard_map(
      shard_fn, mesh=mesh,
      in_specs=(P(), _film_spec(), P()),
      out_specs=_film_spec(),
      check_vma=False)
  return fn(scene, film_state, iteration)


def _film_spec():
  return film_mod.FilmState(
      camera=P("pixels"), variance_half=P("pixels"), normals=P("pixels"),
      albedo=P("pixels"), light=P("pixels"), light_iteration=P("pixels"),
      iteration=P())


def _render_rows(scene, config, film_state, iteration, row_offset, full_height):
  """Render a horizontal band of the film (rows [row_offset, +film_height))."""
  state = _make_band_payload(scene, config, iteration, row_offset, full_height)

  def cond(s):
    return jnp.any(s.alive)

  def body(s):
    return path_tracing.pt_step(scene, config, s)

  state = jax.lax.while_loop(cond, body, state)

  from etx_tracer_tpu.render import spectral as spx
  w, hh = config.film_width, config.film_height
  color = spx.to_film_rgb(state.accumulated, state.wl, config.spectral)
  albedo = spx.to_film_rgb(state.view_albedo, state.wl, config.spectral)
  colors = color.reshape(hh, w, 3)
  normals = state.view_normal.reshape(hh, w, 3)
  albedos = albedo.reshape(hh, w, 3)
  return film_mod.accumulate_camera(film_state, colors, normals, albedos)


def _make_band_payload(scene, config, iteration, row_offset, full_height):
  """make_payload with globally consistent per-pixel RNG seeds."""
  import jax.numpy as jnp
  from etx_tracer_tpu.core import rng
  from etx_tracer_tpu.core import spectrum as spmod
  from etx_tracer_tpu.render import camera as camera_mod
  from etx_tracer_tpu.render import spectral as spx

  w, hh = config.film_width, config.film_height
  r = w * hh
  local_index = jnp.arange(r, dtype=jnp.uint32)
  global_index = local_index + jnp.uint32(row_offset) * jnp.uint32(w)
  state = rng.seed(global_index, jnp.full(r, iteration, jnp.uint32))

  state, wl_rnd = rng.next_float(state)
  wl = spmod.sample_wavelength(wl_rnd) if config.spectral else jnp.zeros(r)

  px = (global_index % w).astype(jnp.int32)
  py = (global_index // w).astype(jnp.int32)
  state, jit_rnd = rng.next_2d(state)
  jitter = jnp.where(iteration == 0, 0.0,
                     camera_mod.blackman_harris_jitter(jit_rnd))
  uv = camera_mod.film_uv(px, py, w, full_height, jitter)
  state, lens_rnd = rng.next_2d(state)
  rays = camera_mod.generate_ray(scene.camera, uv, lens_rnd, scene=scene,
                                 equirectangular=config.equirectangular)

  c = spx.channels(config.spectral)
  return path_tracing.PTState(
      ray_o=rays.o, ray_d=rays.d, t_min=rays.t_min, t_max=rays.t_max,
      throughput=jnp.ones((r, c)), accumulated=jnp.zeros((r, c)),
      view_normal=jnp.zeros((r, 3)), view_albedo=jnp.zeros((r, c)),
      medium=jnp.full(r, scene.camera.medium_index, jnp.int32),
      path_length=jnp.ones(r, jnp.int32),
      eta=jnp.ones(r), bsdf_pdf=jnp.zeros(r),
      mis_flag=jnp.ones(r, bool),
      rng_state=state, wl=wl, alive=jnp.ones(r, bool),
      pixel=global_index.astype(jnp.int32),
      sample_iter=jnp.full(r, iteration, jnp.int32),
      rays_traced=jnp.zeros((), jnp.float32),
      psh_o=jnp.zeros((r, 3)), psh_d=jnp.zeros((r, 3)),
      psh_tmax=jnp.full(r, -1.0), psh_rgb=jnp.zeros((r, 3)),
      res_rgb=jnp.zeros((r, 3)), res_valid=jnp.zeros(r, bool))
