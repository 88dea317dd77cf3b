"""Packed row tables for MXU-friendly per-ray lookups.

Per-ray indexing of dozens of SoA fields costs one scalar-unit gather per
field on TPU; packing each logical record (material, triangle shading data,
emitter, profile) into one float row lets `ops.gather.take_rows` fetch the
whole record with a single one-hot matmul. Integer fields ride as exact
small floats and are cast back on unpack.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from etx_tracer_tpu.scene import types as st

# (field, width, is_int) in Materials order
MAT_LAYOUT = [
    ("cls", 1, True), ("reflectance_spec", 1, True), ("reflectance_img", 1, True),
    ("scattering_spec", 1, True), ("scattering_img", 1, True),
    ("roughness", 2, False), ("roughness_img", 1, True),
    ("metalness", 1, False), ("metalness_img", 1, True),
    ("transmission", 1, False), ("transmission_img", 1, True),
    ("int_ior_eta", 1, True), ("int_ior_k", 1, True), ("int_ior_cls", 1, True),
    ("ext_ior_eta", 1, True), ("ext_ior_k", 1, True),
    ("int_medium", 1, True), ("ext_medium", 1, True),
    ("normal_img", 1, True), ("normal_scale", 1, False),
    ("two_sided", 1, True), ("opacity", 1, False),
    ("emission_collimation", 1, False), ("diffuse_variation", 1, True),
    ("subsurface_cls", 1, True), ("subsurface_spec", 1, True),
    ("thinfilm_eta", 1, True), ("thinfilm_k", 1, True), ("thinfilm_img", 1, True),
    ("thinfilm_min", 1, False), ("thinfilm_max", 1, False),
]


def mat_column(name: str) -> int:
  ofs = 0
  for n, width, _ in MAT_LAYOUT:
    if n == name:
      return ofs
    ofs += width
  raise KeyError(name)


def pack_materials(materials: st.Materials) -> jnp.ndarray:
  cols = []
  for name, width, _ in MAT_LAYOUT:
    v = getattr(materials, name)
    v = v.astype(jnp.float32)
    cols.append(v if v.ndim == 2 else v[:, None])
  return jnp.concatenate(cols, axis=1)


def unpack_material_rows(rows: jnp.ndarray) -> st.Materials:
  out = {}
  ofs = 0
  for name, width, is_int in MAT_LAYOUT:
    v = rows[:, ofs:ofs + width]
    if width == 1:
      v = v[:, 0]
    if is_int:
      v = v.astype(jnp.int32)
    out[name] = v
    ofs += width
  return st.Materials(**out)


def build_tri_table(pos, nrm, tan, btn, uv, idx, geo_n, mat, emitter, area) -> np.ndarray:
  """Per-triangle shading record:
  [geo_n(3), mat, emitter, area, n0 n1 n2 (9), t0 t1 t2 (9), b0 b1 b2 (9),
   uv0 uv1 uv2 (6)] = 38 floats. Positions interpolate from tri_v0/e1/e2.
  """
  i0, i1, i2 = idx[:, 0], idx[:, 1], idx[:, 2]
  return np.concatenate([
      geo_n, mat[:, None].astype(np.float32), emitter[:, None].astype(np.float32),
      area[:, None],
      nrm[i0], nrm[i1], nrm[i2],
      tan[i0], tan[i1], tan[i2],
      btn[i0], btn[i1], btn[i2],
      uv[i0], uv[i1], uv[i2],
  ], axis=1).astype(np.float32)


class TriRows:
  """View over gathered tri_table rows."""

  def __init__(self, rows: jnp.ndarray):
    self.geo_n = rows[:, 0:3]
    self.mat = rows[:, 3].astype(jnp.int32)
    self.emitter = rows[:, 4].astype(jnp.int32)
    self.area = rows[:, 5]
    self.n0 = rows[:, 6:9]
    self.n1 = rows[:, 9:12]
    self.n2 = rows[:, 12:15]
    self.t0 = rows[:, 15:18]
    self.t1 = rows[:, 18:21]
    self.t2 = rows[:, 21:24]
    self.b0 = rows[:, 24:27]
    self.b1 = rows[:, 27:30]
    self.b2 = rows[:, 30:33]
    self.uv0 = rows[:, 33:35]
    self.uv1 = rows[:, 35:37]
    self.uv2 = rows[:, 37:39]


TRI_TABLE_WIDTH = 39


def build_emitter_table(emitters: st.Emitters) -> jnp.ndarray:
  """[cls, profile, triangle, weight, area, pdf] per instance."""
  return jnp.stack([
      emitters.cls.astype(jnp.float32),
      emitters.profile.astype(jnp.float32),
      emitters.triangle.astype(jnp.float32),
      emitters.weight,
      emitters.triangle_area,
      emitters.pdf,
  ], axis=1)


class EmitterRows:
  def __init__(self, rows):
    self.cls = rows[:, 0].astype(jnp.int32)
    self.profile = rows[:, 1].astype(jnp.int32)
    self.triangle = rows[:, 2].astype(jnp.int32)
    self.weight = rows[:, 3]
    self.triangle_area = rows[:, 4]
    self.pdf = rows[:, 5]


def build_profile_table(p: st.EmitterProfiles) -> jnp.ndarray:
  """[cls, spec, img, direction(3), angular, disk, cos]."""
  return jnp.concatenate([
      p.cls.astype(jnp.float32)[:, None],
      p.emission_spec.astype(jnp.float32)[:, None],
      p.emission_img.astype(jnp.float32)[:, None],
      p.direction,
      p.angular_size[:, None],
      p.equivalent_disk_size[:, None],
      p.angular_size_cos[:, None],
  ], axis=1)


class ProfileRows:
  def __init__(self, rows):
    self.cls = rows[:, 0].astype(jnp.int32)
    self.emission_spec = rows[:, 1].astype(jnp.int32)
    self.emission_img = rows[:, 2].astype(jnp.int32)
    self.direction = rows[:, 3:6]
    self.angular_size = rows[:, 6]
    self.equivalent_disk_size = rows[:, 7]
    self.angular_size_cos = rows[:, 8]
