"""Vectorized geometric math over batched jnp arrays.

Semantics mirror the reference's header-only math
(`/root/reference/sources/etx/render/shared/math.hxx`) but every function is
written for arrays with a trailing component axis (``[..., 3]`` vectors), so a
single call processes an entire wavefront of rays — the idiomatic TPU/VPU
formulation instead of per-ray scalar structs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Constants (math.hxx:100-114 in the reference).
kQuarterPi = 0.78539816339744830961
kHalfPi = 1.57079632679489661923
kPi = 3.14159265358979323846
kDoublePi = 6.28318530717958647692
kSqrt2 = 1.41421356237309504880
kInvPi = 0.31830988618379067153
kEpsilon = 1.192092896e-07
kMaxFloat = 3.402823466e+38
kMaxHalf = 65504.0
kInvMaxHalf = 1.0 / kMaxHalf
kRayEpsilon = 15.0 / (kMaxHalf - 1.0)
kDeltaAlphaThreshold = 1.0e-4

kInvalidIndex = jnp.uint32(0xFFFFFFFF)
kInvalidIndexI32 = jnp.int32(-1)


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
  """Dot product over the trailing axis, keeps batch shape."""
  return jnp.sum(a * b, axis=-1)


def length(v: jnp.ndarray) -> jnp.ndarray:
  return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v: jnp.ndarray) -> jnp.ndarray:
  return v * jax.lax.rsqrt(jnp.maximum(dot(v, v), 1e-30))[..., None]


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
  return jnp.cross(a, b)


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
  return v - (2.0 * dot(v, n))[..., None] * n


def lerp(a, b, t):
  return a * (1.0 - t) + b * t


def sqr(x):
  return x * x


def saturate(x):
  return jnp.clip(x, 0.0, 1.0)


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
  """Rec.709 luminance (math.hxx:729)."""
  return rgb[..., 0] * 0.212671 + rgb[..., 1] * 0.715160 + rgb[..., 2] * 0.072169


def orthonormalize(nrm: jnp.ndarray, tan: jnp.ndarray) -> jnp.ndarray:
  return normalize(tan - dot(tan, nrm)[..., None] * nrm)


def orthonormal_basis(n: jnp.ndarray):
  """Branch-free orthonormal basis matching math.hxx:737-746 semantics.

  The reference picks one of two constructions depending on component
  equality; we replicate with jnp.where so the whole wavefront vectorizes.
  """
  nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
  distinct = (nx != ny) | (nx != nz)
  a = jnp.where(
      distinct[..., None],
      jnp.stack([nz - ny, nx - nz, ny - nx], axis=-1),
      jnp.stack([nz - ny, nx + nz, -ny - nx], axis=-1),
  )
  u = normalize(a)
  v = normalize(cross(n, u))
  return u, v


def make_frame(tan, btn, nrm):
  """Local frame as a (...,3,3) row matrix [tan; btn; nrm]."""
  return jnp.stack([tan, btn, nrm], axis=-2)


def to_local(frame, v):
  """World->local with frame rows (tan,btn,nrm)."""
  return jnp.einsum("...ij,...j->...i", frame, v)


def from_local(frame, v):
  """Local->world: v.x*tan + v.y*btn + v.z*nrm."""
  return jnp.einsum("...i,...ij->...j", v, frame)


def sample_cosine_distribution(rnd: jnp.ndarray, exponent) -> jnp.ndarray:
  """Power-cosine hemisphere sample in local (+z) frame (math.hxx:748-752)."""
  cos_theta = jnp.power(jnp.maximum(rnd[..., 0], kEpsilon), 1.0 / (exponent + 1.0))
  sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
  phi = rnd[..., 1] * kDoublePi
  return jnp.stack([jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1)


def sample_cosine_distribution_n(rnd: jnp.ndarray, n: jnp.ndarray, exponent) -> jnp.ndarray:
  u, v = orthonormal_basis(n)
  l = sample_cosine_distribution(rnd, exponent)
  return u * l[..., 0:1] + v * l[..., 1:2] + n * l[..., 2:3]


def barycentrics(bc2: jnp.ndarray) -> jnp.ndarray:
  """(u,v) -> (1-u-v, u, v)."""
  u, v = bc2[..., 0], bc2[..., 1]
  return jnp.stack([1.0 - u - v, u, v], axis=-1)


def random_barycentric(rnd: jnp.ndarray) -> jnp.ndarray:
  r1 = jnp.sqrt(rnd[..., 0])
  return jnp.stack([1.0 - r1, r1 * (1.0 - rnd[..., 1]), r1 * rnd[..., 1]], axis=-1)


def sample_disk(rnd: jnp.ndarray) -> jnp.ndarray:
  """Concentric disk sampling (math.hxx:773-789), branch-free."""
  ox = 2.0 * rnd[..., 0] - 1.0
  oy = 2.0 * rnd[..., 1] - 1.0
  x_major = jnp.abs(ox) > jnp.abs(oy)
  r = jnp.where(x_major, ox, oy)
  safe_ox = jnp.where(ox == 0.0, 1.0, ox)
  safe_oy = jnp.where(oy == 0.0, 1.0, oy)
  theta = jnp.where(x_major, kQuarterPi * (oy / safe_ox), kHalfPi - kQuarterPi * (ox / safe_oy))
  zero = (ox == 0.0) & (oy == 0.0)
  out = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)
  return jnp.where(zero[..., None], 0.0, out)


def offset_ray(p: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
  """Self-intersection-safe origin offset (math.hxx:925-943, Wächter-Binder)."""
  int_scale = 256.0
  float_scale = 1.0 / 65536.0
  origin = 1.0 / 32.0

  of_i = (int_scale * n).astype(jnp.int32)
  p_i = jax.lax.bitcast_convert_type(p, jnp.int32)
  shifted = jnp.where(p > 0.0, p_i + of_i, p_i - of_i)
  p_adj = jax.lax.bitcast_convert_type(shifted, jnp.float32)
  return jnp.where(jnp.abs(p) < origin, p + float_scale * n, p_adj)


def power_heuristic(f: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
  f2 = f * f
  g2 = g * g
  denom = f2 + g2
  return jnp.where(denom > 0.0, saturate(f2 / jnp.maximum(denom, 1e-37)), 0.0)


def to_spherical(d: jnp.ndarray):
  r = length(d)
  phi = jnp.arctan2(d[..., 2], d[..., 0])
  theta = jnp.arcsin(jnp.clip(d[..., 1] / jnp.maximum(r, 1e-30), -1.0, 1.0))
  return phi, theta, r


def from_spherical(phi, theta):
  cos_t = jnp.cos(theta)
  return jnp.stack([jnp.cos(phi) * cos_t, jnp.sin(theta), jnp.sin(phi) * cos_t], axis=-1)


def uv_to_direction(uv: jnp.ndarray, offset_u=0.0, u_scale=1.0) -> jnp.ndarray:
  """Equirectangular uv -> direction (math.hxx:977-987)."""
  u = uv[..., 0]
  u = jnp.where(u_scale < 0.0, 1.0 - u, u)
  u = u - offset_u
  u = u - jnp.floor(u)
  phi = (u * 2.0 - 1.0) * kPi
  theta = (0.5 - uv[..., 1]) * kPi
  return from_spherical(phi, theta)


def direction_to_uv(d: jnp.ndarray, offset_u=0.0, u_scale=1.0) -> jnp.ndarray:
  phi, theta, _ = to_spherical(d)
  u = (phi / kPi + 1.0) / 2.0
  u = jnp.where(u_scale < 0.0, 1.0 - u, u)
  u = u + offset_u
  u = u - jnp.floor(u)
  v = 0.5 - theta / kPi
  return jnp.stack([u, v], axis=-1)


def distance_to_sphere(o: jnp.ndarray, d: jnp.ndarray, center: jnp.ndarray, radius) -> jnp.ndarray:
  """Positive ray-sphere hit distance, 0 on miss (math.hxx:1023-1034)."""
  e = o - center
  b = dot(d, e)
  disc = b * b - dot(e, e) + radius * radius
  s = jnp.sqrt(jnp.maximum(disc, 0.0))
  a0 = -b - s
  a1 = -b + s
  t = jnp.where(a0 < 0.0, jnp.where(a1 < 0.0, 0.0, a1), a0)
  return jnp.where(disc < 0.0, 0.0, t)


def gamma_to_linear(v):
  return jnp.where(v <= 0.04045, v / 12.92, jnp.power((jnp.maximum(v, 0.04045) + 0.055) / 1.055, 2.4))


def linear_to_gamma(v):
  return jnp.where(v <= 0.0031308, 12.92 * v, 1.055 * jnp.power(jnp.maximum(v, 0.0031308), 1.0 / 2.4) - 0.055)
