"""Film: accumulation buffers as jnp arrays (render/host/film.cxx).

Layers mirror the reference's storage (film.cxx:17-28): progressive camera
mean, light-tracing splat image (+ per-iteration buffer), variance estimate
for adaptive sampling, normals and albedo for denoising. Accumulation is a
running mean (film.cxx:173-231); light splats are scatter-adds — the TPU
equivalent of atomic_add_float (film.cxx:147-171).

Row convention: row index py=0 is the BOTTOM of the image (NDC v=-1);
image IO flips at save.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FilmState(NamedTuple):
  camera: jnp.ndarray          # (H,W,3) running mean
  variance_half: jnp.ndarray   # (H,W,3) mean of every-other samples (noise estimate)
  normals: jnp.ndarray         # (H,W,3)
  albedo: jnp.ndarray          # (H,W,3)
  light: jnp.ndarray           # (H,W,3) averaged light-tracing image
  light_iteration: jnp.ndarray  # (H,W,3) current light iteration splats
  iteration: jnp.ndarray       # () int32 completed iterations


def allocate(width: int, height: int) -> FilmState:
  z = jnp.zeros((height, width, 3), jnp.float32)
  return FilmState(z, z, z, z, z, z, jnp.zeros((), jnp.int32))


def accumulate_camera(state: FilmState, colors, normals, albedos) -> FilmState:
  """Running-mean accumulation of one full-film iteration.

  colors/normals/albedos: (H,W,3) for this iteration's samples.
  """
  it = state.iteration
  t = 1.0 / (it.astype(jnp.float32) + 1.0)
  cam = state.camera + (colors - state.camera) * t
  nrm = state.normals + (normals - state.normals) * t
  alb = state.albedo + (albedos - state.albedo) * t
  # variance estimator: accumulate only even iterations at double weight
  use = (it % 2) == 0
  t2 = jnp.where(use, 2.0 / (it.astype(jnp.float32) + 2.0), 0.0)
  vh = state.variance_half + (colors - state.variance_half) * t2
  return state._replace(camera=cam, normals=nrm, albedo=alb,
                        variance_half=vh, iteration=it + 1)


def accumulate_camera_masked(state: FilmState, colors, counts, active):
  """Per-pixel running mean for adaptive passes (film.cxx:434-459 semantics:
  converged pixels receive no samples, so their mean and per-pixel tally
  freeze while neighbours keep accumulating).

  colors: (H,W,3) this iteration's samples (garbage where inactive);
  counts: (H,W) per-pixel samples folded so far; active: (H,W) bool.
  Returns (new_state, new_counts). The global iteration counter still
  advances — it drives the light-image average and RNG streams.
  """
  a = active.astype(jnp.float32)[..., None]
  c = counts[..., None]
  t = a / (c + 1.0)
  cam = state.camera + (colors - state.camera) * t
  even = ((counts % 2.0) == 0.0)[..., None]
  t2 = jnp.where(even, 2.0 / (c + 2.0), 0.0) * a
  vh = state.variance_half + (colors - state.variance_half) * t2
  new_state = state._replace(camera=cam, variance_half=vh,
                             iteration=state.iteration + 1)
  return new_state, counts + active.astype(jnp.float32)


def splat_light(state: FilmState, ndc_uv, values) -> FilmState:
  """Scatter-add light-tracing contributions into the iteration buffer.

  ndc_uv: (R,2) in [-1,1]; values: (R,3).
  """
  h, w, _ = state.light_iteration.shape
  uv = ndc_uv * 0.5 + 0.5
  x = (uv[..., 0] * w).astype(jnp.int32)
  y = (uv[..., 1] * h).astype(jnp.int32)
  ok = (x >= 0) & (x < w) & (y >= 0) & (y < h)
  x = jnp.clip(x, 0, w - 1)
  y = jnp.clip(y, 0, h - 1)
  vals = jnp.where(ok[..., None], values, 0.0)
  li = state.light_iteration.at[y, x].add(vals)
  return state._replace(light_iteration=li)


def commit_light_iteration(state: FilmState) -> FilmState:
  """Fold the per-iteration splat buffer into the averaged light image
  (film.cxx:332-343)."""
  it = state.iteration
  t = 1.0 / (it.astype(jnp.float32) + 1.0)
  light = state.light + (state.light_iteration - state.light) * t
  return state._replace(light=light,
                        light_iteration=jnp.zeros_like(state.light_iteration))


def result_image(state: FilmState) -> jnp.ndarray:
  """Camera + light layers combined (film.cxx:398-405)."""
  return state.camera + state.light


def noise_estimate(state: FilmState) -> jnp.ndarray:
  """Per-pixel relative deviation between the full and half accumulators
  (adaptive sampling driver, film.cxx:233-330)."""
  lum_full = jnp.sum(state.camera * jnp.array([0.212671, 0.715160, 0.072169]), axis=-1)
  lum_half = jnp.sum(state.variance_half * jnp.array([0.212671, 0.715160, 0.072169]), axis=-1)
  return jnp.abs(lum_full - lum_half) / jnp.maximum(jnp.abs(lum_full), 1e-4)


def dilate_mask(active: jnp.ndarray, k: int = 5) -> jnp.ndarray:
  """k x k block dilation of a (H,W) bool map (film.cxx:302-330 — the
  reference grows every unconverged pixel to a 5px block so neighbors keep
  sampling and block seams don't show)."""
  h, w = active.shape
  pad = k // 2
  act = jnp.pad(active, pad)
  out = jnp.zeros_like(active)
  for dy in range(k):
    for dx in range(k):
      out = out | act[dy:dy + h, dx:dx + w]
  return out


def _hsv_to_rgb(h, s, v):
  i = jnp.floor(h * 6.0)
  f = h * 6.0 - i
  p = v * (1.0 - s)
  q = v * (1.0 - f * s)
  t = v * (1.0 - (1.0 - f) * s)
  i = i.astype(jnp.int32) % 6
  r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                 [v, q, p, p, t, v])
  g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                 [t, v, v, q, p, p])
  b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                 [p, p, t, v, v, q])
  return jnp.stack([r, g, b], axis=-1)


def sample_heatmap(counts, min_samples: int = 4):
  """Debug layer: per-pixel sample-count heat map (film.cxx:387-397).

  counts: (H, W) per-pixel sample counts. Blue (hue 2/3) at min samples,
  red (hue 0) at the maximum.
  """
  counts = jnp.asarray(counts, jnp.float32)
  max_c = jnp.max(counts)
  valid = max_c > min_samples
  t = jnp.where(valid,
                jnp.clip((counts - min_samples)
                         / jnp.maximum(max_c - min_samples, 1e-6), 0.0, 1.0),
                0.0)
  hue = (2.0 / 3.0) * (1.0 - t)
  return _hsv_to_rgb(hue, jnp.ones_like(hue), jnp.ones_like(hue))
