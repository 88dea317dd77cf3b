"""Participating media: HG phase, analytic + delta-tracking sampling.

Vectorized port of render/shared/scene_medium.hxx: homogeneous media sample
free paths analytically with spectral-channel MIS (:241-282); heterogeneous
media delta-track through the density grid (:284-346) with a bounded masked
`lax.while_loop` over the wavefront; transmittance mirrors :187-239.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from etx_tracer_tpu.core import math as em
from etx_tracer_tpu.core import rng
from etx_tracer_tpu.render import spectral as spx

_MAX_DELTA_STEPS = 256


def phase_hg(w_i, w_o, g):
  """Henyey-Greenstein phase function (scene_medium.hxx:125-129)."""
  cos_t = em.dot(w_i, w_o)
  d = 1.0 + g * g - 2.0 * g * cos_t
  return (1.0 / (4.0 * em.kPi)) * (1.0 - g * g) / jnp.maximum(d * jnp.sqrt(jnp.maximum(d, 1e-12)), 1e-12)


def sample_phase_hg(w_i, g, rnd2):
  """Sample HG phase (scene_medium.hxx:131-145). Returns w_o."""
  iso = jnp.abs(g) < 1e-3
  cos_iso = 1.0 - 2.0 * rnd2[..., 0]
  g_safe = jnp.where(iso, 0.5, g)
  sqr_term = (1.0 - g_safe * g_safe) / (1.0 + g_safe * (2.0 * rnd2[..., 0] - 1.0))
  cos_aniso = (1.0 + g_safe * g_safe - sqr_term * sqr_term) / (2.0 * g_safe)
  cos_theta = jnp.where(iso, cos_iso, cos_aniso)
  sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
  phi = em.kDoublePi * rnd2[..., 1]
  u, v = em.orthonormal_basis(w_i)
  return ((u * jnp.cos(phi)[..., None] + v * jnp.sin(phi)[..., None]) * sin_theta[..., None]
          - w_i * cos_theta[..., None])


def sample_spectrum_component(albedo, throughput, rnd, spectral: bool):
  """Channel-MIS pick for RGB mode (scene_medium.hxx:99-115).

  Returns (channel (R,) int32, pdf (R,C)).
  """
  r = albedo.shape[0]
  if spectral:
    return jnp.zeros(r, jnp.int32), jnp.ones((r, 1))
  at = albedo * throughput
  s = jnp.sum(at, axis=-1, keepdims=True)
  zero = s[..., 0] <= 0.0
  pdf = jnp.where(zero[..., None], 1.0 / 3.0, at / jnp.maximum(s, 1e-20))
  cum0 = pdf[..., 0]
  cum1 = pdf[..., 0] + pdf[..., 1]
  ch = 2 - (rnd < cum1).astype(jnp.int32) - (rnd < cum0).astype(jnp.int32)
  ch_zero = jnp.minimum((3.0 * rnd).astype(jnp.int32), 2)
  return jnp.where(zero, ch_zero, ch), pdf


def _component(v, channel, spectral: bool):
  if spectral:
    return v[..., 0]
  return jnp.take_along_axis(v, channel[..., None], axis=-1)[..., 0]


class MediumView(NamedTuple):
  """Per-ray medium properties gathered from the medium tables."""
  cls: jnp.ndarray          # (R,) 0 none / 1 homogeneous / 2 heterogeneous
  scattering: jnp.ndarray   # (R,C)
  absorption: jnp.ndarray   # (R,C)
  phase_g: jnp.ndarray      # (R,)
  max_sigma: jnp.ndarray    # (R,)
  bounds_min: jnp.ndarray   # (R,3)
  bounds_max: jnp.ndarray   # (R,3)
  grid_index: jnp.ndarray   # (R,) medium row (for grid lookups)
  explicit_connections: jnp.ndarray  # (R,) bool

  @property
  def extinction(self):
    return self.scattering + self.absorption

  @property
  def albedo(self):
    ext = self.extinction
    return jnp.where(ext > 0.0, self.scattering / jnp.maximum(ext, 1e-20), 0.0)

  @property
  def valid(self):
    return self.cls > 0


def gather_medium(scene, medium_idx, wl, spectral: bool) -> MediumView:
  m = scene.mediums
  safe = jnp.maximum(medium_idx, 0)
  valid = medium_idx >= 0
  scat = spx.query_spd(scene, m.scattering_spec[safe], wl, spectral)
  absorb = spx.query_spd(scene, m.absorption_spec[safe], wl, spectral)
  return MediumView(
      cls=jnp.where(valid, m.cls[safe], 0),
      scattering=scat, absorption=absorb,
      phase_g=m.phase_g[safe],
      max_sigma=m.max_sigma[safe],
      bounds_min=m.bounds_min[safe],
      bounds_max=m.bounds_max[safe],
      grid_index=safe,
      explicit_connections=m.explicit_connections[safe] > 0)


def sample_density(scene, mv: MediumView, world_pos):
  """Trilinear density lookup in the unit-local grid (scene_medium.hxx:58-95).

  TPU shape (r5): the naive form needs 8 per-lane 4D gathers per call, and
  sample_density sits INSIDE the ratio-tracking while_loops — XLA routes
  those through the scalar unit, which made heterogeneous transmittance
  the volumetric BDPT bottleneck (~88% of the step in the r5 ablation).
  For grids whose (D*gz*gy) fits the one-hot MXU gather budget, the
  (z, y)-plane rows are fetched as ONE weighted one-hot matmul
  (ops/gather.take_rows_weighted, 4 rows = the bilinear z/y corners) and
  the x interpolation is a masked 2-hot reduction over the row — no
  scalar-unit gathers anywhere. Larger grids keep the gather fallback.
  """
  grid = scene.mediums.grid  # (D, gz, gy, gx)
  nd, gz, gy, gx = grid.shape
  local = (world_pos - mv.bounds_min) / jnp.maximum(mv.bounds_max - mv.bounds_min, 1e-12)
  inside = jnp.all((local >= 0.0) & (local < 1.0), axis=-1)
  px = jnp.clip(local[..., 0] * gx - 0.5, 0.0, gx - 1.0)
  py = jnp.clip(local[..., 1] * gy - 0.5, 0.0, gy - 1.0)
  pz = jnp.clip(local[..., 2] * gz - 0.5, 0.0, gz - 1.0)
  ix = jnp.minimum(px.astype(jnp.int32), gx - 1)
  iy = jnp.minimum(py.astype(jnp.int32), gy - 1)
  iz = jnp.minimum(pz.astype(jnp.int32), gz - 1)
  nx = jnp.minimum(ix + 1, gx - 1)
  ny = jnp.minimum(iy + 1, gy - 1)
  nz = jnp.minimum(iz + 1, gz - 1)
  gi = mv.grid_index
  dx = px - jnp.floor(px)
  dy = py - jnp.floor(py)
  dz = pz - jnp.floor(pz)

  from etx_tracer_tpu.ops import gather as gather_ops
  n_rows = nd * gz * gy
  if n_rows <= gather_ops.ONEHOT_LIMIT:
    flat = grid.reshape(n_rows, gx)
    base = gi * (gz * gy)
    rows = gather_ops.take_rows_weighted(
        flat,
        jnp.stack([base + iz * gy + iy, base + iz * gy + ny,
                   base + nz * gy + iy, base + nz * gy + ny], axis=-1),
        jnp.stack([(1.0 - dz) * (1.0 - dy), (1.0 - dz) * dy,
                   dz * (1.0 - dy), dz * dy], axis=-1))      # (R, gx)
    cols = jnp.arange(gx, dtype=jnp.int32)
    wx = ((ix[..., None] == cols) * (1.0 - dx)[..., None]
          + (nx[..., None] == cols) * dx[..., None])
    val = jnp.sum(rows * wx, axis=-1)
    return jnp.where(inside, val, 0.0)

  def d(zz, yy, xx):
    return grid[gi, zz, yy, xx]

  bottom = em.lerp(em.lerp(d(iz, iy, ix), d(iz, iy, nx), dx),
                   em.lerp(d(iz, ny, ix), d(iz, ny, nx), dx), dy)
  top = em.lerp(em.lerp(d(nz, iy, ix), d(nz, iy, nx), dx),
                em.lerp(d(nz, ny, ix), d(nz, ny, nx), dx), dy)
  return jnp.where(inside, em.lerp(bottom, top, dz), 0.0)


def _bounds_range(mv: MediumView, pos, direction, max_t):
  """Ray/medium-AABB overlap [t_min, t_max] (scene_medium.hxx:12-56)."""
  safe_d = jnp.where(jnp.abs(direction) < 1e-12,
                     jnp.where(direction < 0, -1e-12, 1e-12), direction)
  t0 = (mv.bounds_min - pos) / safe_d
  t1 = (mv.bounds_max - pos) / safe_d
  tlo = jnp.minimum(t0, t1)
  thi = jnp.maximum(t0, t1)
  t_min = jnp.maximum(jnp.max(tlo, axis=-1), 0.0)
  t_max = jnp.minimum(jnp.min(thi, axis=-1), max_t)
  return t_min, t_max, t_min <= t_max


class MediumSample(NamedTuple):
  sampled: jnp.ndarray   # (R,) bool — scattering event inside the medium
  t: jnp.ndarray         # (R,) distance to the event
  pos: jnp.ndarray       # (R,3) event position
  weight: jnp.ndarray    # (R,C) transport weight (transmittance-based)


def sample_medium(scene, mv: MediumView, wl, throughput, rng_state, pos, w_i,
                  max_t, spectral: bool):
  """Free-path sampling (sample_medium, scene_medium.hxx:241-352).

  Returns (MediumSample, new rng_state). Lanes with no/invalid medium get
  sampled=False, weight=1.
  """
  r = pos.shape[0]
  c = spx.channels(spectral)

  # ---------------- homogeneous (analytic, channel MIS) ----------------
  rng_state, rnd_ch = rng.next_float(rng_state)
  rng_state, rnd_t = rng.next_float(rng_state)
  ext = mv.extinction
  channel, ch_pdf = sample_spectrum_component(mv.albedo, throughput, rnd_ch, spectral)
  sigma = _component(ext, channel, spectral)
  t_h = jnp.where(sigma > 0.0, -jnp.log(jnp.maximum(1.0 - rnd_t, 1e-10)) / jnp.maximum(sigma, 1e-20), max_t)
  t_h = jnp.minimum(jnp.maximum(t_h, em.kRayEpsilon), max_t)
  sampled_h = t_h < max_t
  tr = jnp.exp(-t_h[..., None] * ext)
  pdf_h = jnp.where(sampled_h[..., None], ch_pdf * tr * ext, ch_pdf * tr)
  pdf_sum = jnp.sum(pdf_h, axis=-1)
  num = jnp.where(sampled_h[..., None], tr * mv.scattering, tr)
  weight_h = jnp.where((pdf_sum > 0.0)[..., None], num / jnp.maximum(pdf_sum, 1e-30)[..., None], 0.0)

  # ---------------- heterogeneous (delta tracking) ----------------
  is_het = mv.cls == 2
  t_min, t_max, overlaps = _bounds_range(mv, pos, w_i, max_t)
  inv_sigma = 1.0 / jnp.maximum(mv.max_sigma, 1e-20)

  def cond(carry):
    rng_state, t, active, done, _, _, _ = carry
    return jnp.any(active)

  def body(carry):
    rng_state, t, active, scattered, acc_tr, prev_t, pdf_sum = carry
    rng_state, r1 = rng.next_float(rng_state)
    t_new = t - jnp.log(jnp.maximum(1.0 - r1, 1e-10)) * inv_sigma
    exited = t_new >= t_max
    t_new_clamped = jnp.minimum(t_new, t_max)
    dist = jnp.maximum(t_new_clamped, prev_t) - prev_t
    acc_tr = jnp.where(active[..., None], acc_tr * jnp.exp(-ext * dist[..., None]), acc_tr)
    density = sample_density(scene, mv, pos + w_i * t_new[..., None])
    rng_state, r2 = rng.next_float(rng_state)
    rng_state, r3 = rng.next_float(rng_state)
    # channel-MIS pdf at the scatter event (scene_medium.hxx:322-333)
    channel, ch_pdf = sample_spectrum_component(mv.albedo, mv.scattering, r2, spectral)
    sigma_t = _component(ext, channel, spectral)
    scatter_now = active & ~exited & (sigma_t > 0.0) & (r3 < density)
    pdf_sum = jnp.where(scatter_now, jnp.sum(ch_pdf, axis=-1), pdf_sum)
    scattered = scattered | scatter_now
    active = active & ~exited & ~scatter_now
    prev_t = jnp.where(active | scatter_now, t_new_clamped, prev_t)
    t = jnp.where(active | scatter_now, t_new, t)
    return rng_state, t, active, scattered, acc_tr, prev_t, pdf_sum

  active0 = is_het & overlaps & (mv.max_sigma > 0.0)
  acc0 = jnp.ones((r, c))
  carry = (rng_state, t_min, active0, jnp.zeros(r, bool), acc0, t_min, jnp.ones(r))
  rng_state, t_het, _, scattered_het, acc_tr, prev_t, pdf_sum_het = jax.lax.while_loop(cond, body, carry)
  # account for the tail segment when no scatter happened
  tail = jnp.maximum(t_max - prev_t, 0.0)
  acc_tr = jnp.where(scattered_het[..., None], acc_tr, acc_tr * jnp.exp(-ext * tail[..., None]))
  weight_het = jnp.where(
      scattered_het[..., None],
      mv.scattering * acc_tr / jnp.maximum(pdf_sum_het, 1e-20)[..., None],
      acc_tr)

  # ---------------- select by class ----------------
  is_hom = mv.cls == 1
  sampled = jnp.where(is_hom, sampled_h, jnp.where(is_het, scattered_het, False))
  t = jnp.where(is_hom, t_h, t_het)
  weight = jnp.where(is_hom[..., None], weight_h,
                     jnp.where(is_het[..., None], weight_het, 1.0))
  event_pos = pos + w_i * t[..., None]
  return MediumSample(sampled=sampled, t=t, pos=event_pos, weight=weight), rng_state


def transmittance(scene, mv: MediumView, wl, rng_state, pos, direction, distance,
                  spectral: bool):
  """Transmittance over a segment (medium_transmittance, :187-239).

  Homogeneous: analytic. Heterogeneous: ratio tracking with a bounded loop.
  Returns (tr (R,C), rng_state).
  """
  r = pos.shape[0]
  c = spx.channels(spectral)
  ext = mv.extinction
  tr_hom = jnp.exp(-ext * distance[..., None])

  is_het = mv.cls == 2
  t_min, t_max, overlaps = _bounds_range(mv, pos, direction, distance)
  inv_sigma = 1.0 / jnp.maximum(mv.max_sigma, 1e-20)

  def cond(carry):
    rng_state, t, tr, active = carry
    return jnp.any(active)

  def body(carry):
    rng_state, t, tr, active = carry
    rng_state, r1 = rng.next_float(rng_state)
    t_new = t - jnp.log(jnp.maximum(1.0 - r1, 1e-10)) * inv_sigma
    exited = t_new >= t_max
    density = sample_density(scene, mv, pos + direction * t_new[..., None])
    tr = jnp.where((active & ~exited)[..., None], tr * jnp.maximum(1.0 - density, 0.0)[..., None], tr)
    active = active & ~exited & (jnp.max(tr, axis=-1) > 1e-5)
    return rng_state, t_new, tr, active

  active0 = is_het & overlaps & (mv.max_sigma > 0.0)
  carry = (rng_state, t_min, jnp.ones((r, c)), active0)
  rng_state, _, tr_het, _ = jax.lax.while_loop(cond, body, carry)

  is_hom = mv.cls == 1
  tr = jnp.where(is_hom[..., None], tr_hom, jnp.where(is_het[..., None], tr_het, 1.0))
  return tr, rng_state
