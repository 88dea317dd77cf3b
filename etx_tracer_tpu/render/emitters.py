"""Emitter sampling and radiance evaluation (render/shared/scene_emitters.hxx).

All emitter classes (Area per-triangle instances, Environment maps,
Directional sun disks) are evaluated branch-free over the wavefront; the
per-instance power CDF (build_emitters_distribution,
scene_representation.cxx:2460+) drives NEE emitter selection.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from etx_tracer_tpu.core import distribution as distlib
from etx_tracer_tpu.core import math as em
from etx_tracer_tpu.render import spectral as spx
from etx_tracer_tpu.scene.types import EmitterClass as EC


class EmitterSample(NamedTuple):
  """EmitterSample analogue (emitter.hxx:73-95)."""
  value: jnp.ndarray        # (R,C) radiance
  origin: jnp.ndarray       # (R,3) point on emitter (or bounding sphere)
  normal: jnp.ndarray       # (R,3)
  direction: jnp.ndarray    # (R,3) from shading point toward emitter
  pdf_sample: jnp.ndarray   # (R,) discrete selection pdf
  pdf_area: jnp.ndarray     # (R,)
  pdf_dir: jnp.ndarray      # (R,) solid-angle pdf
  pdf_dir_out: jnp.ndarray  # (R,)
  is_delta: jnp.ndarray     # (R,) bool
  emitter_index: jnp.ndarray  # (R,) int32
  triangle_index: jnp.ndarray  # (R,) int32


def collimation_to_exponent(c):
  t = em.saturate(c)
  return 1.0 / jnp.maximum(em.kEpsilon, em.sqr(em.sqr(1.0 - t)))


def _emission(scene, profile_idx, wl, spectral):
  if profile_idx.ndim == 0:
    spec = scene.emitter_profiles.emission_spec[profile_idx]
  else:
    from etx_tracer_tpu.ops import gather as gops
    spec = gops.take_rows(scene.prof_table[:, 1:2], profile_idx)[:, 0].astype(jnp.int32)
  return spx.query_spd(scene, spec, wl, spectral)


def sample_emitter_index(scene, rnd):
  """Power-CDF emitter selection (scene_emitters.hxx:209-214)."""
  idx, p = distlib.sample(scene.emitters.cdf, scene.emitters.pdf, rnd)
  return idx, p


def discrete_pdf(scene, emitter_index):
  """emitter_discrete_pdf (scene_emitters.hxx:205-207)."""
  if emitter_index.ndim == 0:
    w = scene.emitters.weight[emitter_index]
  else:
    from etx_tracer_tpu.ops import gather as gops
    w = gops.take_rows(scene.em_table[:, 3:4], emitter_index)[:, 0]
  return w / jnp.maximum(scene.emitters.total_weight, 1e-20)


def sample_emitter(scene, emitter_index, rnd2, from_point, wl, spectral: bool,
                   classes: tuple = (0, 1, 2)) -> EmitterSample:
  """emitter_sample_in over the wavefront (scene_emitters.hxx:139-203).

  Handles Area / Directional / Environment classes branch-free; `classes`
  (static) restricts which branches compile. All record lookups go through
  the packed tables (one-hot matmuls for small scenes).
  """
  from etx_tracer_tpu.ops import gather as gops
  from etx_tracer_tpu.scene import packed

  only_area = tuple(classes) == (EC.Area,)
  erows = packed.EmitterRows(gops.take_rows(scene.em_table, emitter_index))
  cls = erows.cls
  profile = erows.profile
  prows = packed.ProfileRows(gops.take_rows(scene.prof_table, profile))
  tri = jnp.maximum(erows.triangle, 0)
  trows = packed.TriRows(gops.take_rows(scene.tri_table, tri))
  r = from_point.shape[0]

  # ---- area emitters ----
  bc = em.random_barycentric(rnd2)
  tv = gops.take_rows(
      jnp.concatenate([scene.tri_v0, scene.tri_e1, scene.tri_e2], axis=1), tri)
  origin_area = tv[:, 0:3] + bc[..., 1:2] * tv[:, 3:6] + bc[..., 2:3] * tv[:, 6:9]
  normal_area = em.normalize(trows.n0 * bc[..., 0:1] + trows.n1 * bc[..., 1:2] + trows.n2 * bc[..., 2:3])
  dir_area = em.normalize(origin_area - from_point)
  geo_n = trows.geo_n
  collim = gops.take_rows(
      scene.mat_table[:, packed.mat_column("emission_collimation"):packed.mat_column("emission_collimation") + 1],
      trows.mat)[:, 0]

  # radiance + pdfs (emitter_get_radiance Area branch, scene_emitters.hxx:76-98)
  facing = em.dot(geo_n, origin_area - from_point) < 0.0
  pdf_area_a = 1.0 / jnp.maximum(erows.triangle_area, 1e-12)
  dp = from_point - origin_area
  dist2 = em.dot(dp, dp)
  cos_t = jnp.abs(em.dot(dp, geo_n)) / jnp.maximum(jnp.sqrt(dist2), 1e-12)
  exponent = collimation_to_exponent(collim)
  cos_tx = jnp.power(jnp.maximum(cos_t, 1e-9), exponent)
  has_dir = (dist2 > 0.0) & (cos_tx > em.kEpsilon)
  pdf_dir_a = jnp.where(has_dir, pdf_area_a * dist2 / jnp.maximum(cos_tx, 1e-12), 0.0)
  pdf_dir_out_a = jnp.where(has_dir, pdf_area_a * cos_tx * em.kInvPi, 0.0)
  emission = spx.query_spd(scene, prows.emission_spec, wl, spectral)
  value_a = jnp.where(facing[..., None], emission, 0.0)
  pdf_dir_a = jnp.where(facing, pdf_dir_a, 0.0)

  if only_area:
    return EmitterSample(
        value=value_a, origin=origin_area, normal=normal_area,
        direction=dir_area,
        pdf_sample=discrete_pdf(scene, emitter_index),
        pdf_area=pdf_area_a, pdf_dir=pdf_dir_a, pdf_dir_out=pdf_dir_out_a,
        is_delta=jnp.zeros(r, bool),
        emitter_index=emitter_index,
        triangle_index=erows.triangle)

  # ---- directional emitters (sun disk) ----
  pdir = prows.direction
  ang = prows.angular_size
  disk = prows.equivalent_disk_size
  u, v = em.orthonormal_basis(pdir)
  ds = em.sample_disk(rnd2)
  dir_d = em.normalize(pdir + u * (ds[..., 0:1] * 0.5 * disk[..., None])
                       + v * (ds[..., 1:2] * 0.5 * disk[..., None]))
  dir_d = jnp.where((ang > 0.0)[..., None], dir_d, pdir)
  pdf_area_d = 1.0 / (em.kPi * em.sqr(scene.bsphere_radius))
  origin_d = from_point + dir_d * em.distance_to_sphere(
      from_point, dir_d, scene.bsphere_center, scene.bsphere_radius)[..., None]
  value_d = emission

  # ---- environment: image-CDF importance sampling when a map is present,
  #      uniform sphere otherwise (scene_emitters.hxx:178-194) ----
  from etx_tracer_tpu.render import images as images_mod
  z = 1.0 - 2.0 * rnd2[..., 0]
  phi = em.kDoublePi * rnd2[..., 1]
  s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
  dir_uniform = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)
  pdf_uniform = jnp.full(rnd2.shape[0], 1.0 / (2.0 * em.kDoublePi))

  if images_mod.bank_is_empty(scene.images):
    dir_e = dir_uniform
    pdf_dir_e = pdf_uniform
    value_e = emission
  else:
    has_img = prows.emission_img >= 0
    img_safe = jnp.maximum(prows.emission_img, 0)
    img_uv, img_pdf = images_mod.sample(scene.images, img_safe, rnd2)
    off_u = scene.images.offset[img_safe, 0]
    usc = scene.images.scale_u[img_safe]
    dir_img = em.uv_to_direction(img_uv, off_u, usc)
    sin_t = jnp.maximum(jnp.sin(img_uv[..., 1] * em.kPi), em.kEpsilon)
    pdf_img = img_pdf / (2.0 * em.kPi * em.kPi * sin_t)
    img_rgb = images_mod.evaluate(scene.images, img_safe, img_uv)[:, :3]
    value_img = spx.apply_rgb(emission, img_rgb, wl, spectral)
    dir_e = jnp.where(has_img[..., None], dir_img, dir_uniform)
    pdf_dir_e = jnp.where(has_img, pdf_img, pdf_uniform)
    value_e = jnp.where(has_img[..., None], value_img, emission)
  origin_e = from_point + dir_e * em.distance_to_sphere(
      from_point, dir_e, scene.bsphere_center, scene.bsphere_radius)[..., None]

  is_area = cls == EC.Area
  is_dir = cls == EC.Directional
  is_env = cls == EC.Environment

  def pick(m, a, b):
    return jnp.where(m[..., None] if a.ndim > m.ndim else m, a, b)

  value = pick(is_area, value_a, pick(is_dir, value_d, jnp.where(is_env[..., None], value_e, 0.0)))
  origin = pick(is_area, origin_area, pick(is_dir, origin_d, origin_e))
  normal = pick(is_area, normal_area, pick(is_dir, -pdir, -dir_e))
  direction = pick(is_area, dir_area, pick(is_dir, dir_d, dir_e))
  pdf_area = jnp.where(is_area, pdf_area_a, pdf_area_d)
  pdf_dir = jnp.where(is_area, pdf_dir_a, jnp.where(is_dir, jnp.ones_like(pdf_dir_e), pdf_dir_e))
  pdf_dir_out = jnp.where(is_area, pdf_dir_out_a, pdf_dir * pdf_area_d)

  return EmitterSample(
      value=value, origin=origin, normal=normal, direction=direction,
      pdf_sample=discrete_pdf(scene, emitter_index),
      pdf_area=pdf_area, pdf_dir=pdf_dir, pdf_dir_out=pdf_dir_out,
      is_delta=is_dir,
      emitter_index=emitter_index,
      triangle_index=erows.triangle)


class EmissionSample(NamedTuple):
  """Light-path origin sample (sample_emission, scene_emitters.hxx:226-306)."""
  value: jnp.ndarray       # (R,C)
  origin: jnp.ndarray      # (R,3)
  normal: jnp.ndarray      # (R,3)
  direction: jnp.ndarray   # (R,3) emitted direction
  pdf_sample: jnp.ndarray  # (R,)
  pdf_area: jnp.ndarray    # (R,)
  pdf_dir: jnp.ndarray     # (R,)
  pdf_dir_out: jnp.ndarray  # (R,)
  is_delta: jnp.ndarray    # (R,)
  is_distant: jnp.ndarray  # (R,)
  triangle_index: jnp.ndarray  # (R,)
  medium_index: jnp.ndarray  # (R,)
  geo_n: jnp.ndarray       # (R,3) emitter triangle geometric normal


def sample_emission(scene, rnd_sel, rnd_pos, rnd_dir, wl, spectral: bool) -> EmissionSample:
  """Sample a light-path origin + direction over the wavefront."""
  from etx_tracer_tpu.ops import gather as gops
  from etx_tracer_tpu.scene import packed

  emitter_index, _ = sample_emitter_index(scene, rnd_sel)
  erows = packed.EmitterRows(gops.take_rows(scene.em_table, emitter_index))
  cls = erows.cls
  profile = erows.profile
  prows = packed.ProfileRows(gops.take_rows(scene.prof_table, profile))
  tri = jnp.maximum(erows.triangle, 0)
  trows = packed.TriRows(gops.take_rows(scene.tri_table, tri))
  r = rnd_sel.shape[0]
  pdf_sample = discrete_pdf(scene, emitter_index)
  emission = spx.query_spd(scene, prows.emission_spec, wl, spectral)

  # ---- area: cosine-power emission from a surface point ----
  bc = em.random_barycentric(rnd_pos)
  tv = gops.take_rows(
      jnp.concatenate([scene.tri_v0, scene.tri_e1, scene.tri_e2], axis=1), tri)
  origin_a = tv[:, 0:3] + bc[..., 1:2] * tv[:, 3:6] + bc[..., 2:3] * tv[:, 6:9]
  normal_a = em.normalize(trows.n0 * bc[..., 0:1] + trows.n1 * bc[..., 1:2] + trows.n2 * bc[..., 2:3])
  tan_a = em.normalize(trows.t0 * bc[..., 0:1] + trows.t1 * bc[..., 1:2] + trows.t2 * bc[..., 2:3])
  btn_a = em.normalize(trows.b0 * bc[..., 0:1] + trows.b1 * bc[..., 1:2] + trows.b2 * bc[..., 2:3])
  colc = packed.mat_column("emission_collimation")
  collim = gops.take_rows(scene.mat_table[:, colc:colc + 1], trows.mat)[:, 0]
  # emitter_external_medium_index (scene_emitters.hxx:10-20): light paths
  # start in the emitting material's exterior medium
  extc = packed.mat_column("ext_medium")
  em_medium = gops.take_rows(scene.mat_table[:, extc:extc + 1], trows.mat)[:, 0].astype(jnp.int32)
  em_medium = jnp.where(cls == EC.Area, em_medium, -1)
  exponent = collimation_to_exponent(collim)
  local = em.sample_cosine_distribution(rnd_dir, exponent)
  dir_a = tan_a * local[..., 0:1] + btn_a * local[..., 1:2] + normal_a * local[..., 2:3]
  # emitter_evaluate_out_local (scene_emitters.hxx:21-38)
  pdf_dir_a = jnp.maximum(0.0, em.dot(normal_a, dir_a)) * em.kInvPi
  pdf_area_a = 1.0 / jnp.maximum(erows.triangle_area, 1e-12)
  pdf_dir_out_a = pdf_dir_a * pdf_area_a

  # ---- directional: disk origin on the bounding sphere ----
  pdir = prows.direction
  to_scene = -pdir
  u, v = em.orthonormal_basis(to_scene)
  ps = em.sample_disk(rnd_pos)
  ds = em.sample_disk(rnd_dir)
  disk = prows.equivalent_disk_size
  dir_d = em.normalize(to_scene + u * (ds[..., 0:1] * 0.5 * disk[..., None])
                       + v * (ds[..., 1:2] * 0.5 * disk[..., None]))
  radius = scene.bsphere_radius
  origin_d = scene.bsphere_center + radius * (
      ps[..., 0:1] * u + ps[..., 1:2] * v - to_scene)
  origin_d = origin_d + dir_d * em.distance_to_sphere(
      origin_d, dir_d, scene.bsphere_center, radius)[..., None]
  pdf_area_sph = 1.0 / (em.kPi * em.sqr(radius))

  # ---- environment: uniform direction inward from the sphere ----
  z = 1.0 - 2.0 * rnd_dir[..., 0]
  phi = em.kDoublePi * rnd_dir[..., 1]
  s = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
  dir_env = -jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)
  ue, ve = em.orthonormal_basis(dir_env)
  origin_e = scene.bsphere_center + radius * (
      ps[..., 0:1] * ue + ps[..., 1:2] * ve - dir_env)
  origin_e = origin_e + dir_env * em.distance_to_sphere(
      origin_e, dir_env, scene.bsphere_center, radius)[..., None]
  pdf_dir_e = 1.0 / (2.0 * em.kDoublePi)

  is_area = cls == EC.Area
  is_dir = cls == EC.Directional
  is_env = cls == EC.Environment

  def pick3(a, b, c_):
    return jnp.where(is_area[..., None], a, jnp.where(is_dir[..., None], b, c_))

  value = emission
  origin = pick3(origin_a, origin_d, origin_e)
  normal = pick3(normal_a, to_scene, dir_env)
  direction = pick3(dir_a, dir_d, dir_env)
  pdf_area = jnp.where(is_area, pdf_area_a, pdf_area_sph)
  pdf_dir = jnp.where(is_area, pdf_dir_a, jnp.where(is_dir, 1.0, pdf_dir_e))
  pdf_dir_out = jnp.where(is_area, pdf_dir_out_a, pdf_dir * pdf_area_sph)

  return EmissionSample(
      value=value, origin=origin, normal=normal, direction=direction,
      pdf_sample=pdf_sample, pdf_area=pdf_area, pdf_dir=pdf_dir,
      pdf_dir_out=pdf_dir_out,
      is_delta=is_dir, is_distant=~is_area,
      triangle_index=erows.triangle,
      medium_index=em_medium,
      geo_n=trows.geo_n)


def area_radiance(scene, emitter_index, wl, ray_origin, hit_pos, uv, directly_visible,
                  spectral: bool):
  """emitter_get_radiance for a hit area emitter (scene_emitters.hxx:76-98).

  Returns (value (R,C), pdf_area, pdf_dir, pdf_dir_out); zero when
  emitter_index < 0 or back side.
  """
  from etx_tracer_tpu.ops import gather as gops
  from etx_tracer_tpu.scene import packed

  valid = emitter_index >= 0
  ei = jnp.maximum(emitter_index, 0)
  erows = packed.EmitterRows(gops.take_rows(scene.em_table, ei))
  profile = erows.profile
  tri = jnp.maximum(erows.triangle, 0)
  trows = packed.TriRows(gops.take_rows(scene.tri_table, tri))
  geo_n = trows.geo_n
  col = packed.mat_column("emission_collimation")
  collim = gops.take_rows(scene.mat_table[:, col:col + 1], trows.mat)[:, 0]

  facing = em.dot(geo_n, hit_pos - ray_origin) < 0.0
  pdf_area = 1.0 / jnp.maximum(erows.triangle_area, 1e-12)
  dp = ray_origin - hit_pos
  dist2 = em.dot(dp, dp)
  cos_t = jnp.abs(em.dot(dp, geo_n)) / jnp.maximum(jnp.sqrt(jnp.maximum(dist2, 1e-20)), 1e-12)
  exponent = collimation_to_exponent(collim)
  cos_tx = jnp.where(directly_visible, cos_t, jnp.power(jnp.maximum(cos_t, 1e-9), exponent))
  has = (dist2 > 0.0) & (cos_tx > em.kEpsilon)
  pdf_dir = jnp.where(has, pdf_area * dist2 / jnp.maximum(cos_tx, 1e-12), 0.0)
  pdf_dir_out = jnp.where(has, pdf_area * cos_tx * em.kInvPi, 0.0)

  value = _emission(scene, profile, wl, spectral)
  ok = valid & facing
  return (jnp.where(ok[..., None], value, 0.0),
          jnp.where(ok, pdf_area, 0.0),
          jnp.where(ok, pdf_dir, 0.0),
          jnp.where(ok, pdf_dir_out, 0.0))


def env_contribution(scene, direction, wl, directly_visible, mis_flag, bsdf_pdf,
                     num_env: int, spectral: bool):
  """Missed-ray contribution of all environment emitters with per-emitter
  MIS weights (handle_missed_ray, path_tracing_shared.hxx:464-483).

  num_env is the static env-emitter count (SceneConfig). Returns (R,C) to be
  multiplied by the path throughput by the caller.
  """
  r = direction.shape[0]
  c = 1 if spectral else 3
  total = jnp.zeros((r, c))

  for slot in range(num_env):
    ei = scene.emitters.env_indices[slot]
    ei_s = jnp.maximum(ei, 0)
    valid = ei >= 0
    cls = scene.emitters.cls[ei_s]
    profile = scene.emitters.profile[ei_s]
    value = _emission(scene, profile, wl, spectral)

    # directional sun disk: visible only directly and inside the disk; the
    # SPD cancels against direct_scale (scene_emitters.hxx:49-58)
    pdir = scene.emitter_profiles.direction[profile]
    ang_cos = scene.emitter_profiles.angular_size_cos[profile]
    ang = scene.emitter_profiles.angular_size[profile]
    cos_d = em.dot(direction, pdir)
    dir_ok = directly_visible & (ang > 0.0) & (cos_d >= ang_cos)
    disk_norm = 1.0 / (em.kDoublePi * jnp.maximum(1.0 - ang_cos, 1e-9))
    value_dir = jnp.full((r, c), 1.0) * disk_norm[..., None]
    pdf_dir_d = jnp.where(dir_ok, 1.0, 0.0)

    # environment: image radiance + CDF pdf when mapped, constant otherwise
    from etx_tracer_tpu.render import images as images_mod
    if images_mod.bank_is_empty(scene.images):
      value_env = value
      pdf_dir_e = jnp.full(r, 1.0 / (2.0 * em.kDoublePi))
    else:
      img = scene.emitter_profiles.emission_img[profile]
      has_img = img >= 0
      img_safe = jnp.maximum(img, 0)
      off_u = scene.images.offset[img_safe, 0]
      usc = scene.images.scale_u[img_safe]
      uv_env = em.direction_to_uv(direction, off_u, usc)
      img_rgb = images_mod.evaluate(scene.images, jnp.full(r, img_safe), uv_env)[:, :3]
      value_env_img = spx.apply_rgb(value, img_rgb, wl, spectral)
      sin_t = jnp.maximum(jnp.sin(uv_env[..., 1] * em.kPi), em.kEpsilon)
      ipdf = images_mod.pdf_at(scene.images, jnp.full(r, img_safe), uv_env)
      pdf_env_img = ipdf / (2.0 * em.kPi * em.kPi * sin_t)
      value_env = jnp.where(has_img, value_env_img, value)
      pdf_dir_e = jnp.where(has_img, pdf_env_img, jnp.full(r, 1.0 / (2.0 * em.kDoublePi)))

    is_dir = cls == EC.Directional
    v = jnp.where(is_dir[..., None], value_dir * pdf_dir_d[..., None], value_env)
    pdf_dir = jnp.where(is_dir, pdf_dir_d, pdf_dir_e)

    dscr = discrete_pdf(scene, ei_s)
    no_weight = (~mis_flag) | directly_visible
    weight = jnp.where(no_weight, 1.0, em.power_heuristic(bsdf_pdf, dscr * pdf_dir))
    contrib = v * weight[..., None]
    total = total + jnp.where((valid & (pdf_dir > 0.0))[..., None], contrib, 0.0)
  return total
