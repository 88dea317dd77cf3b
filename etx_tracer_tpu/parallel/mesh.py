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

  n_dev = mesh.devices.size

  def place(x):
    if x.ndim >= 2 and x.shape[0] % n_dev == 0:
      return jax.device_put(x, sharding)
    # uneven row counts are padded (and re-sharded) inside the render call
    return jax.device_put(x, scalar)

  return jax.tree_util.tree_map(place, film_state)


def replicate_scene(scene, mesh: Mesh):
  rep = NamedSharding(mesh, P())
  return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), scene)


def _pad_rows(film_state: film_mod.FilmState, h_pad: int) -> film_mod.FilmState:
  """Zero-pad film row axis to h_pad (uneven-shard support)."""
  def pad(x):
    if getattr(x, "ndim", 0) >= 2:
      return jnp.pad(x, [(0, h_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1))
    return x
  return jax.tree_util.tree_map(pad, film_state)


def _crop_rows(film_state: film_mod.FilmState, h: int) -> film_mod.FilmState:
  def crop(x):
    if getattr(x, "ndim", 0) >= 2:
      return x[:h]
    return x
  return jax.tree_util.tree_map(crop, film_state)


def render_iteration_sharded(scene, config, film_state, iteration, mesh: Mesh):
  """One sharded film iteration: each device renders its row slice.

  Uses shard_map so each device traces only its own pixel rows; the scene
  is replicated. The per-shard config narrows the film height. Film heights
  not divisible by the device count are zero-padded (padded rows render
  off-film rays whose results are cropped away).
  """
  n_dev = mesh.devices.size
  h = config.film_height
  h_pad = ((h + n_dev - 1) // n_dev) * n_dev
  if h_pad != h:
    # uneven shards: pad the film row axis; padded rows trace off-film rays
    # (v >= 1, still well-defined) whose results are cropped away. The TRUE
    # height keeps driving the camera UV mapping and the RNG pixel ids, so
    # visible rows match the unpadded render bitwise.
    film_state = shard_film(_pad_rows(film_state, h_pad), mesh)
  local_config = dataclasses.replace(config, film_height=h_pad // n_dev)

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
  out = fn(scene, film_state, iteration)
  return _crop_rows(out, h) if h_pad != h else out


def render_samples_sharded(scene, config, first_iteration, num_iterations: int,
                           mesh: Mesh, pool_size: int = 1 << 17):
  """Production pooled renderer (render_samples_static) over the mesh.

  Each device runs the full cascade pool on its film row band with GLOBAL
  per-pixel RNG seeds, so the result matches the single-device pool exactly.
  Returns (FilmSums over the full film, total rays traced — psum'd).
  """
  n_dev = mesh.devices.size
  w, h = config.film_width, config.film_height
  h_pad = ((h + n_dev - 1) // n_dev) * n_dev
  local_h = h_pad // n_dev
  local_config = dataclasses.replace(config, film_height=local_h)
  local_pool = min(pool_size, max(4096, local_h * w))

  def shard_fn(scene_rep):
    axis = jax.lax.axis_index("pixels")
    sums, rays = path_tracing.render_samples_static(
        scene_rep, local_config, first_iteration, num_iterations,
        pool_size=local_pool, row_offset=axis * local_h, full_height=h)
    return sums, jax.lax.psum(rays, "pixels")

  fn = jax.shard_map(
      shard_fn, mesh=mesh,
      in_specs=(P(),),
      out_specs=(path_tracing.FilmSums(table=P("pixels")), P()),
      check_vma=False)
  sums, rays = fn(scene)
  if h_pad != h:
    sums = path_tracing.FilmSums(table=sums.table[: h * w])
  return sums, rays


def vcm_render_iteration_sharded(scene, config, options, film_state,
                                 iteration: int, mesh: Mesh):
  """One sharded VCM iteration: light paths and camera pixels both shard
  across the mesh; light-tracing splats cross shards via a psum collective;
  the merge grid is built from an all_gather of every shard's light vertices.

  Mapping to the reference (SURVEY §2.7): the psum replaces
  atomic_add_float splats into the shared light image (film.cxx:147-171);
  the all_gather replaces every thread reading the one shared
  VCMSpatialGrid (vcm_shared.cxx:49-152). Lane-aligned vertex connections
  need no communication at all: camera pixel i connects to light path i
  (vcm_cpu.cxx light_paths[state.global_index]), and each shard traces
  exactly the light-path slice whose ids match its own camera band.

  Matches the single-device vcm.render_iteration estimator exactly: global
  RNG seeds, TRUE-film-pixel-count normalization, padded rows masked out.
  """
  from etx_tracer_tpu.models import vcm as vcm_mod

  n_dev = mesh.devices.size
  w, h = config.film_width, config.film_height
  h_pad = ((h + n_dev - 1) // n_dev) * n_dev
  local_h = h_pad // n_dev
  if h_pad != h:
    film_state = shard_film(_pad_rows(film_state, h_pad), mesh)
  local_config = dataclasses.replace(config, film_height=local_h)
  local_npix = local_h * w
  npix = w * h  # TRUE pixel count drives the estimator normalization

  # radius schedule: SHARED eager computation with the single-device path
  # (vcm.radius_schedule) — bitwise-identical weights keep the per-cell
  # photon subsample identical across both paths
  radius, vc_weight, vm_weight, vm_normalization = vcm_mod.radius_schedule(
      scene, config, options, iteration)

  def shard_fn(scene_rep, film_shard, it):
    axis = jax.lax.axis_index("pixels")
    offset = axis * local_npix

    verts, splat_img, l_state = vcm_mod.light_pass(
        scene_rep, local_config, options, it, local_npix,
        vc_weight, vm_weight, path_offset=offset, n_valid=npix,
        splat_shape=(h_pad, h))

    # cross-shard light-image reduction: every shard splats its own paths
    # into a full film, psum'd over the mesh (XLA lowers psum+slice to
    # reduce-scatter on ICI)
    splat_img = jax.lax.psum(splat_img, "pixels")
    band = jax.lax.dynamic_slice_in_dim(splat_img, axis * local_h, local_h, 0)

    grid = None
    if options.enable_merging:
      all_verts = jax.tree_util.tree_map(
          lambda x: jax.lax.all_gather(x, "pixels", axis=0, tiled=True), verts)
      wl_all = jax.lax.all_gather(l_state.wl, "pixels", axis=0, tiled=True)
      grid = vcm_mod.build_merge_grid(scene_rep, all_verts, wl_all,
                                      radius, config.spectral,
                                      cell_cap=options.max_photons_per_cell)

    camera_rgb = vcm_mod.camera_pass(
        scene_rep, local_config, options, it, verts, grid,
        radius, vc_weight, vm_weight, vm_normalization,
        pixel_offset=offset, full_height=h)

    fs = film_shard._replace(
        light_iteration=film_shard.light_iteration + band)
    fs = film_mod.commit_light_iteration(fs)
    colors = camera_rgb.reshape(local_h, w, 3)
    zero = jnp.zeros_like(colors)
    return film_mod.accumulate_camera(fs, colors, zero, zero)

  fn = jax.shard_map(
      shard_fn, mesh=mesh,
      in_specs=(P(), _film_spec(), P()),
      out_specs=_film_spec(),
      check_vma=False)
  out = fn(scene, film_state, jnp.asarray(iteration, jnp.int32))
  return _crop_rows(out, h) if h_pad != h else out


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
  jitter = camera_mod.pixel_jitter(config.pixel_filter, jit_rnd, iteration)
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
