"""Heitz multiple-scattering microfacet walks, vectorized.

Port of the reference's adapted "Multiple-Scattering Microfacet BSDFs with
the Smith Model" (render/shared/bsdf_external.hxx): height-correlated random
walks on the microsurface, bounded at kScatteringOrderMax=16, as masked
`lax.while_loop`s over the wavefront.

RNG: the walk derives a per-lane counter stream from the caller's random
columns (sample) or from direction bits (stochastic eval — the reference
also evaluates the MS term stochastically, with its sampler state; any
independent uniform stream preserves unbiasedness in expectation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from etx_tracer_tpu.core import math as em
from etx_tracer_tpu.core import rng
from etx_tracer_tpu.render.bsdf import common as mf

kOrderMax = 16


def _lambda(w, alpha):
  """RayInfo Lambda (bsdf_external.hxx:28-51)."""
  wz = jnp.clip(w[..., 2], -1.0, 1.0)
  sin2 = jnp.maximum(1.0 - wz * wz, 1e-12)
  inv_sin2 = 1.0 / sin2
  cos_phi2 = w[..., 0] ** 2 * inv_sin2
  sin_phi2 = w[..., 1] ** 2 * inv_sin2
  alpha_v = jnp.sqrt(cos_phi2 * alpha[..., 0] ** 2 + sin_phi2 * alpha[..., 1] ** 2)
  tan_theta = jnp.sqrt(sin2) / jnp.where(jnp.abs(wz) < 1e-9, 1e-9, wz)
  a = 1.0 / jnp.where(jnp.abs(tan_theta * alpha_v) < 1e-12, 1e-12, tan_theta * alpha_v)
  lam = 0.5 * (-1.0 + jnp.sign(a) * jnp.sqrt(1.0 + 1.0 / (a * a)))
  lam = jnp.where(wz > 0.9999, 0.0, lam)
  lam = jnp.where(wz < -0.9999, -1.0, lam)
  return lam


def _c1(h):
  return jnp.clip(0.5 * (h + 1.0), 0.0, 1.0)


def _g1(w, lam, c1):
  wz = w[..., 2]
  g = jnp.power(jnp.maximum(c1, 1e-12), jnp.maximum(lam, 0.0))
  g = jnp.where(wz > 0.9999, 1.0, jnp.where(wz <= 0.0, 0.0, g))
  return g


def _inv_c1(u):
  return jnp.clip(2.0 * u - 1.0, -1.0, 1.0)


def sample_height(w, lam, c1, g1, h, u):
  """sampleHeight (bsdf_external.hxx:75-103); kMaxFloat = escaped."""
  wz = w[..., 2]
  p1 = jnp.power(jnp.maximum(1.0 - u, 1e-12), 1.0 / jnp.where(jnp.abs(lam) < 1e-12, 1e-12, lam))
  u1 = c1 / jnp.maximum(p1, 1e-20)
  res_int = _inv_c1(u1)
  escaped = (u > 1.0 - g1) | (p1 <= 0.0)
  res = jnp.where(escaped, em.kMaxFloat, res_int)
  res = jnp.where(jnp.abs(wz) < 1e-4, h, res)
  res = jnp.where(wz < -0.9999, _inv_c1(u * c1), res)
  res = jnp.where(wz > 0.9999, em.kMaxFloat, res)
  return res


def _sample_p22_11(theta_i, rnd):
  """sampleP22_11 (bsdf_external.hxx:130-176)."""
  sin_t = jnp.sin(theta_i)
  cos_t = jnp.maximum(jnp.cos(theta_i), 1e-6)
  tan_t = sin_t / cos_t
  proj = 0.5 * (cos_t + 1.0)
  c = 1.0 / jnp.maximum(proj, 1e-6)
  a_ = 2.0 * rnd[..., 0] / cos_t / c - 1.0
  b_ = tan_t
  tmp = 1.0 / jnp.where(jnp.abs(a_ * a_ - 1.0) < 1e-12, 1e-12, a_ * a_ - 1.0)
  d_ = jnp.sqrt(jnp.maximum(b_ * b_ * tmp * tmp - (a_ * a_ - b_ * b_) * tmp, 0.0))
  sx1 = b_ * tmp - d_
  sx2 = b_ * tmp + d_
  slope_x = jnp.where((a_ < 0.0) | (sx2 > 1.0 / jnp.maximum(tan_t, 1e-9)), sx1, sx2)

  big = rnd[..., 1] > 0.5
  s = jnp.where(big, 1.0, -1.0)
  u2 = jnp.where(big, 2.0 * (rnd[..., 1] - 0.5), 2.0 * (0.5 - rnd[..., 1]))
  z = (u2 * (u2 * (u2 * 0.27385 - 0.73369) + 0.46341)) \
      / (u2 * (u2 * (u2 * 0.093073 + 0.309420) - 1.0) + 0.597999)
  slope_y = s * z * jnp.sqrt(1.0 + slope_x * slope_x)

  # near-normal incidence branch
  r = jnp.sqrt(rnd[..., 0] / jnp.maximum(1.0 - rnd[..., 0], 1e-9))
  phi = em.kDoublePi * rnd[..., 1]
  near = theta_i < 1e-4
  slope_x = jnp.where(near, r * jnp.cos(phi), slope_x)
  slope_y = jnp.where(near, r * jnp.sin(phi), slope_y)
  return jnp.stack([slope_x, slope_y], axis=-1)


def sample_microfacet_normal(wi, alpha, rnd):
  """sampleVNDF via slope space (bsdf_external.hxx:178-205)."""
  wi11 = em.normalize(jnp.stack(
      [alpha[..., 0] * wi[..., 0], alpha[..., 1] * wi[..., 1], wi[..., 2]], axis=-1))
  theta = jnp.arccos(jnp.clip(wi11[..., 2], -1.0, 1.0))
  s11 = _sample_p22_11(theta, rnd)
  phi = jnp.arctan2(wi11[..., 1], wi11[..., 0])
  sx = jnp.cos(phi) * s11[..., 0] - jnp.sin(phi) * s11[..., 1]
  sy = jnp.sin(phi) * s11[..., 0] + jnp.cos(phi) * s11[..., 1]
  sx = sx * alpha[..., 0]
  sy = sy * alpha[..., 1]
  wm = em.normalize(jnp.stack([-sx, -sy, jnp.ones_like(sx)], axis=-1))
  bad = ~jnp.isfinite(sx)
  fallback = jnp.where((wi[..., 2] > 0.0)[..., None],
                       jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), wm.shape),
                       em.normalize(jnp.stack([wi[..., 0], wi[..., 1], jnp.zeros_like(sx)], axis=-1)))
  return jnp.where(bad[..., None], fallback, wm)


def _mis_weight_conductor(wi, wo, alpha):
  wh = em.normalize(wi + wo)
  wh = wh * jnp.where(wh[..., 2] > 0, 1.0, -1.0)[..., None]
  d = mf.ggx_d(wh, alpha)
  same = jnp.all(jnp.abs(wi + wo) < 1e-6, axis=-1)
  return jnp.where(same, 1.0, d)


def _seed_from_floats(a, b):
  ba = jax.lax.bitcast_convert_type(a, jnp.uint32)
  bb = jax.lax.bitcast_convert_type(b, jnp.uint32)
  return rng.seed(ba, bb)


def conductor_sample_walk(fresnel_fn, w_i, alpha, rnd):
  """MS conductor sampling walk (ConductorBSDF::sample, bsdf_conductor.hxx:
  36-55). w_i local (z>0, away from surface). Returns (w_o, energy(R,C)).

  fresnel_fn(cos_theta) -> (R,C).
  """
  r = w_i.shape[0]
  state = _seed_from_floats(rnd[..., 3] + 0.123, rnd[..., 4] + 0.771)

  w0 = -w_i
  lam0 = _lambda(w0, alpha)
  energy0 = None

  def cond(carry):
    state, w, lam, h, energy, order, active, escaped = carry
    return jnp.any(active)

  def body(carry):
    state, w, lam, h, energy, order, active, escaped = carry
    c1 = _c1(h)
    g1 = _g1(w, lam, c1)
    state, u_h = rng.next_float(state)
    h_new = sample_height(w, lam, c1, g1, h, u_h)
    just_escaped = active & (h_new >= em.kMaxFloat * 0.5)
    escaped = escaped | just_escaped
    active = active & ~just_escaped

    state, rnd2 = rng.next_2d(state)
    slope_rnd = jnp.where((order == 0)[..., None], rnd[..., 0:2], rnd2)
    wm = sample_microfacet_normal(-w, alpha, slope_rnd)
    i_dot_m = em.dot(-w, wm)
    f = fresnel_fn(i_dot_m)
    w_new = em.normalize(w + 2.0 * wm * i_dot_m[..., None])

    too_many = active & (order + 1 > kOrderMax)
    nan_bad = active & (~jnp.isfinite(w_new[..., 2]) | ~jnp.isfinite(h_new))
    dead = too_many | nan_bad

    energy = jnp.where(active[..., None], energy * f, energy)
    energy = jnp.where(dead[..., None], 0.0, energy)
    w = jnp.where(active[..., None], w_new, w)
    lam = jnp.where(active, _lambda(w_new, alpha), lam)
    h = jnp.where(active, h_new, h)
    order = order + active.astype(jnp.int32)
    active = active & ~dead
    return state, w, lam, h, energy, order, active, escaped

  c = fresnel_fn(jnp.ones(r)).shape[-1]
  carry = (state, w0, lam0, jnp.ones(r), jnp.ones((r, c)),
           jnp.zeros(r, jnp.int32), jnp.ones(r, bool), jnp.zeros(r, bool))
  state, w, lam, h, energy, order, active, escaped = jax.lax.while_loop(cond, body, carry)
  # escaped lanes carry w as the outgoing direction
  return w, jnp.where(escaped[..., None], energy, 0.0)


def conductor_eval_walk(fresnel_fn, w_i, w_o, alpha, seed_a, seed_b):
  """Stochastic MS conductor eval (eval_conductor, bsdf_external.hxx:280-353).

  Returns bsdf-with-cosine folded: 0.5*singleScattering + multipleScattering
  (the reference's value is already multiplied by nothing further in
  ConductorBSDF::evaluate except the reflectance texture).
  """
  r = w_i.shape[0]
  state = _seed_from_floats(seed_a, seed_b)

  wh = em.normalize(w_i + w_o)
  d = mf.ggx_d(wh, alpha)
  lam_i = _lambda(-w_i, alpha)
  lam_o = _lambda(w_o, alpha)
  g2 = 1.0 / (1.0 + (-lam_i - 1.0) + lam_o)
  f_ss = fresnel_fn(em.dot(w_i, wh))
  single = f_ss * (d * g2 / jnp.maximum(4.0 * w_i[..., 2], 1e-9))[..., None]
  c = single.shape[-1]

  def phase_reflection(w, lam, wo):
    proj = jnp.where(w[..., 2] < -0.9999, 1.0, lam * w[..., 2])
    whr = em.normalize(-w + wo)
    wdh = em.dot(-w, whr)
    f = fresnel_fn(wdh)
    dv = mf.ggx_d(whr * jnp.where(whr[..., 2] > 0, 1.0, 1.0)[..., None], alpha)
    val = f * (dv / jnp.maximum(4.0 * proj, 1e-9))[..., None]
    ok = (proj >= em.kEpsilon) & (whr[..., 2] >= 0.0) & (wdh >= em.kEpsilon) & (w[..., 2] <= 0.9999)
    return jnp.where(ok[..., None], val, 0.0)

  def cond(carry):
    state, w, lam, h, energy, order, active, multiple, wi_mis = carry
    return jnp.any(active)

  def body(carry):
    state, w, lam, h, energy, order, active, multiple, wi_mis = carry
    c1 = _c1(h)
    g1 = _g1(w, lam, c1)
    state, u_h = rng.next_float(state)
    h_new = sample_height(w, lam, c1, g1, h, u_h)
    esc = active & (h_new >= em.kMaxFloat * 0.5)
    active2 = active & ~esc
    order_new = order + active2.astype(jnp.int32)

    # NEE on the microsurface (order > 1)
    lam_cur = lam
    phase = phase_reflection(w, lam_cur, w_o)
    c1_sh = _c1(h_new)
    g1_sh = _g1(w_o, lam_o, c1_sh)
    i_contrib = energy * phase * g1_sh[..., None]
    mis = wi_mis / jnp.maximum(wi_mis + _mis_weight_conductor(-w, w_o, alpha), 1e-20)
    add = active2 & (order_new > 1)
    multiple = multiple + jnp.where(add[..., None], i_contrib * mis[..., None], 0.0)

    # next direction
    state, rnd2 = rng.next_2d(state)
    wm = sample_microfacet_normal(-w, alpha, rnd2)
    i_dot_m = em.dot(-w, wm)
    f = fresnel_fn(i_dot_m)
    w_new = em.normalize(w + 2.0 * wm * i_dot_m[..., None])
    energy = jnp.where(active2[..., None], energy * f, energy)
    wi_mis = jnp.where(active2 & (order_new == 1),
                       _mis_weight_conductor(w_i, w_new, alpha), wi_mis)
    bad = active2 & ((order_new > kOrderMax) | ~jnp.isfinite(w_new[..., 2]) | ~jnp.isfinite(h_new))
    w = jnp.where(active2[..., None], w_new, w)
    lam = jnp.where(active2, _lambda(w_new, alpha), lam)
    h = jnp.where(active2, h_new, h)
    active = active2 & ~bad
    return state, w, lam, h, energy, order_new, active, multiple, wi_mis

  carry = (state, -w_i, lam_i, jnp.ones(r), jnp.ones((r, c)),
           jnp.zeros(r, jnp.int32), jnp.ones(r, bool), jnp.zeros((r, c)),
           jnp.zeros(r))
  state, w, lam, h, energy, order, active, multiple, wi_mis = \
      jax.lax.while_loop(cond, body, carry)

  ok = (w_i[..., 2] > 0.0) & (w_o[..., 2] > 0.0)
  return jnp.where(ok[..., None], 0.5 * single + multiple, 0.0)
