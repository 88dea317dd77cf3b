"""Camera ray generation and film sampling (render/shared/scene_camera.hxx).

Pixel convention: pixel (px, py) with py=0 at the BOTTOM row of the film
arrays (matching the reference's NDC mapping u,v in [-1,1] with +v = up;
film.cxx flips rows on splat). Image IO flips to top-down at save time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from etx_tracer_tpu.core import math as em
import numpy as np


# Radial Blackman-Harris pixel filter (film.cxx:63-67): w(d) = BH window at
# 2*pi*(0.5 + d/2), sampled with pdf ~ w(d)*d on the unit disk. The inverse
# radial CDF is baked as a piecewise polynomial fit (max err ~1.5e-4 in d^2
# on [0,0.9], ~0.011 in d on the tail) so sampling is pure VPU math — a
# table gather here cost ~3x end-to-end throughput, and a one-hot matmul
# lookup ~20%.
_BH_SPLIT = 0.90
_BH_MAIN = np.array([19.85930973, -70.57191808, 105.75280208, -86.13626149,
                     41.3327709, -11.74788296, 1.97336551, -0.09055742,
                     0.16622468, -5.155e-05], np.float32)
_BH_TAIL = np.array([0.96960741, 3.9751558, -33.19148686, 109.26038337,
                     -170.57134179, 103.87089986], np.float32)


def blackman_harris_jitter(rnd2):
  """Pixel-filter jitter in [-1,1]^2 with the radial BH distribution
  (Film::sample + generate_filter_image, film.cxx:123-145)."""
  phi = 2.0 * em.kPi * rnd2[..., 0]
  t = rnd2[..., 1]
  # main branch: d^2 = poly(t)
  g = jnp.zeros_like(t)
  for c in _BH_MAIN:
    g = g * t + c
  d_main = jnp.sqrt(jnp.maximum(g, 0.0))
  # tail branch: 1-d = sum c_k * (1-t)^(k/3)
  s = jnp.maximum(1.0 - t, 0.0)
  s3 = jnp.cbrt(s)
  one_minus = (_BH_TAIL[0] * s3 + _BH_TAIL[1] * s3 * s3 + _BH_TAIL[2] * s
               + _BH_TAIL[3] * s * s3 + _BH_TAIL[4] * s * s3 * s3
               + _BH_TAIL[5] * s * s)
  d_tail = 1.0 - one_minus
  d = jnp.clip(jnp.where(t > _BH_SPLIT, d_tail, d_main), 0.0, 1.0)
  return jnp.stack([d * jnp.cos(phi), d * jnp.sin(phi)], axis=-1)


def pixel_jitter(pixel_filter: str, jit_rnd, iteration):
  """Per-sample in-pixel jitter for the configured reconstruction filter.

  "blackman-harris": radial BH importance sample; iteration 0 renders
  pixel centers (Film's empty filter on the first pass, film.cxx:63-67).
  "box": uniform jitter over the pixel. "center": always pixel centers.
  """
  if pixel_filter == "center":
    return jnp.zeros_like(jit_rnd)
  if pixel_filter == "box":
    return jit_rnd - 0.5
  it0 = (iteration == 0)
  if hasattr(it0, "ndim") and it0.ndim < jit_rnd.ndim:
    it0 = it0[..., None]
  return jnp.where(it0, 0.0, blackman_harris_jitter(jit_rnd))


def film_uv(px, py, width: int, height: int, jitter):
  """Pixel + jitter -> NDC uv in [-1,1] (film.cxx:137-145)."""
  u = (px.astype(jnp.float32) + 0.5 + jitter[..., 0]) / width * 2.0 - 1.0
  v = (py.astype(jnp.float32) + 0.5 + jitter[..., 1]) / height * 2.0 - 1.0
  return jnp.stack([u, v], axis=-1)


class RayBundle(NamedTuple):
  o: jnp.ndarray      # (R,3)
  d: jnp.ndarray      # (R,3)
  t_min: jnp.ndarray  # (R,)
  t_max: jnp.ndarray  # (R,)


def generate_ray(camera, uv: jnp.ndarray, lens_rnd: jnp.ndarray,
                 scene=None, equirectangular: bool = False) -> RayBundle:
  """Camera ray for NDC uv (scene_camera.hxx:26-62).

  equirectangular (static): panoramic mapping (Camera::Class, camera.hxx:9).
  scene: when given and the camera has a lens image, DOF samples the
  aperture shape through the image CDF (bokeh, scene_camera.hxx:43-49).
  """
  r = uv.shape[0]
  origin = jnp.broadcast_to(camera.position, (r, 3))

  if equirectangular:
    d = em.from_spherical(uv[..., 0] * em.kPi, uv[..., 1] * em.kHalfPi)
    return RayBundle(origin, d, jnp.full(r, em.kRayEpsilon), jnp.full(r, em.kMaxFloat))

  direction = camera.direction
  s = uv[..., 0:1] * camera.side
  u = uv[..., 1:2] * camera.up / camera.aspect
  w_o = em.normalize(camera.tan_half_fov * (s + u) + direction)

  # depth of field; aperture shape via the lens image when present
  use_dof = (camera.lens_radius > em.kEpsilon) & (camera.focal_distance > em.kEpsilon)
  sensor = em.sample_disk(lens_rnd)
  if scene is not None:
    from etx_tracer_tpu.render import images as images_mod
    if not images_mod.bank_is_empty(scene.images):
      has_lens = camera.lens_image >= 0
      img = jnp.maximum(camera.lens_image, 0)
      img_uv, _ = images_mod.sample(scene.images, jnp.full(r, img), lens_rnd)
      shaped = img_uv * 2.0 - 1.0
      sensor = jnp.where(has_lens, shaped, sensor)
  sensor = sensor * camera.lens_radius
  dof_origin = origin + camera.side * sensor[..., 0:1] + camera.up * sensor[..., 1:2]
  focal_t = camera.focal_distance / jnp.maximum(em.dot(w_o, direction), 1e-6)
  focus_p = camera.position + focal_t[..., None] * w_o
  dof_dir = em.normalize(focus_p - dof_origin)
  origin = jnp.where(use_dof, dof_origin, origin)
  w_o = jnp.where(use_dof, dof_dir, w_o)

  cos_t = em.dot(w_o, direction)
  t_near = jnp.where(camera.clip_near > 0.0, camera.clip_near / cos_t, em.kRayEpsilon)
  t_far = jnp.where(camera.clip_far > 0.0, camera.clip_far / cos_t, em.kMaxFloat)
  return RayBundle(origin, w_o, jnp.maximum(t_near, em.kRayEpsilon), t_far)


class FilmSample(NamedTuple):
  """Light->camera connection sample (scene_camera.hxx:64-118)."""
  position: jnp.ndarray
  normal: jnp.ndarray
  direction: jnp.ndarray
  uv: jnp.ndarray
  weight: jnp.ndarray
  pdf_dir: jnp.ndarray
  valid: jnp.ndarray


def sample_film(camera, from_point: jnp.ndarray, lens_rnd: jnp.ndarray) -> FilmSample:
  """Connect a world point to the camera (used by light tracing/BDPT/VCM)."""
  sensor = em.sample_disk(lens_rnd) * camera.lens_radius
  use_dof = (camera.lens_radius > em.kEpsilon) & (camera.focal_distance > em.kEpsilon)
  sensor = jnp.where(use_dof, sensor, 0.0)

  position = camera.position + sensor[..., 0:1] * camera.side + sensor[..., 1:2] * camera.up
  direction = position - from_point
  normal = camera.direction
  cos_t = -em.dot(direction, normal)
  dist2 = em.dot(direction, direction)
  dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
  direction = direction / dist[..., None]
  cos_t = cos_t / dist

  focal = jnp.where(use_dof, camera.focal_distance, 1.0)
  focus_point = position - direction * (focal / jnp.maximum(cos_t, 1e-6))[..., None]
  ph = jnp.concatenate([focus_point, jnp.ones_like(focus_point[..., :1])], axis=-1)
  projected = jnp.einsum("ij,...j->...i", camera.view_proj, ph)
  w = projected[..., 3]
  uv = projected[..., :2] / jnp.where(w == 0, 1.0, w)[..., None]

  in_frustum = (w > 0.0) & (jnp.abs(uv[..., 0]) <= 1.0) & (jnp.abs(uv[..., 1]) <= 1.0)
  valid = (cos_t > 0.0) & in_frustum

  lens_area = jnp.where(camera.lens_radius > em.kEpsilon, em.kPi * em.sqr(camera.lens_radius), 1.0)
  pdf_area = 1.0 / lens_area
  pdf_dir = pdf_area * dist2 / jnp.maximum(cos_t, 1e-9)
  pdf_dir_out = 1.0 / (camera.area * lens_area * jnp.maximum(cos_t, 1e-9) ** 3)
  importance = pdf_dir_out / jnp.maximum(cos_t, 1e-9)
  weight = importance / jnp.maximum(pdf_dir, 1e-30)
  return FilmSample(
      position=jnp.broadcast_to(position, from_point.shape),
      normal=jnp.broadcast_to(normal, from_point.shape),
      direction=direction, uv=uv,
      weight=jnp.where(valid, weight, 0.0),
      pdf_dir=jnp.where(valid, pdf_dir, 0.0),
      valid=valid)


def film_pdf_out(camera, to_point: jnp.ndarray) -> jnp.ndarray:
  w_i = em.normalize(to_point - camera.position)
  cos_t = em.dot(w_i, camera.direction)
  return 1.0 / jnp.abs(camera.area * cos_t ** 3)
