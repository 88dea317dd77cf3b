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


def conductor_sample_walk(fresnel_fn, w_i, alpha, rnd, active0=None):
  """MS conductor sampling walk (ConductorBSDF::sample, bsdf_conductor.hxx:
  36-55). w_i local (z>0, away from surface). Returns (w_o, energy(R,C)).

  fresnel_fn(cos_theta) -> (R,C). `active0` restricts the walk to the lanes
  whose dispatch actually consumes it (rough-conductor lanes): the while_loop
  exits as soon as those lanes finish — zero iterations when none exist at
  this bounce — instead of walking the whole wavefront.
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
  a0 = jnp.ones(r, bool) if active0 is None else active0
  carry = (state, w0, lam0, jnp.ones(r), jnp.ones((r, c)),
           jnp.zeros(r, jnp.int32), a0, jnp.zeros(r, bool))
  state, w, lam, h, energy, order, active, escaped = jax.lax.while_loop(cond, body, carry)
  # escaped lanes carry w as the outgoing direction
  return w, jnp.where(escaped[..., None], energy, 0.0)


def conductor_eval_walk(fresnel_fn, w_i, w_o, alpha, seed_a, seed_b,
                        active0=None):
  """Stochastic MS conductor eval (eval_conductor, bsdf_external.hxx:280-353).

  Returns bsdf-with-cosine folded: 0.5*singleScattering + multipleScattering
  (the reference's value is already multiplied by nothing further in
  ConductorBSDF::evaluate except the reflectance texture).
  `active0` restricts the walk to consuming lanes (see conductor_sample_walk).
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

  a0 = jnp.ones(r, bool) if active0 is None else active0
  carry = (state, -w_i, lam_i, jnp.ones(r), jnp.ones((r, c)),
           jnp.zeros(r, jnp.int32), a0, jnp.zeros((r, c)),
           jnp.zeros(r))
  state, w, lam, h, energy, order, active, multiple, wi_mis = \
      jax.lax.while_loop(cond, body, carry)

  ok = (w_i[..., 2] > 0.0) & (w_o[..., 2] > 0.0)
  return jnp.where(ok[..., None], 0.5 * single + multiple, 0.0)


# ---------------------------------------------------------------------------
# Heitz rough-diffuse multiple-scattering walk (bsdf_external.hxx:548-692)
# ---------------------------------------------------------------------------


def _sample_phase_diffuse(wm, rnd):
  """Cosine-lobe phase around wm (samplePhaseFunction_diffuse,
  bsdf_external.hxx:555-577)."""
  xy = em.sample_disk(rnd)
  x, y = xy[..., 0], xy[..., 1]
  z = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - y * y))
  u, v = em.orthonormal_basis(wm)
  return x[..., None] * u + y[..., None] * v + z[..., None] * wm


def diffuse_sample_walk(w_i, alpha, albedo, rnd, active0=None):
  """Rough-diffuse sampling walk (sample_diffuse, bsdf_external.hxx:660-692).

  w_i local (z>0, away from surface); albedo (R,C). Returns (w_o, energy).
  `active0` restricts the walk to consuming lanes (see conductor_sample_walk).
  """
  r = w_i.shape[0]
  c = albedo.shape[-1]
  state = _seed_from_floats(rnd[..., 3] + 0.377, rnd[..., 4] + 0.911)

  w0 = -w_i
  lam0 = _lambda(w0, alpha)

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
    state, rnd3 = rng.next_2d(state)
    w_new = _sample_phase_diffuse(wm, rnd3)

    too_many = active & (order + 1 > kOrderMax)
    nan_bad = active & (~jnp.isfinite(w_new[..., 2]) | ~jnp.isfinite(h_new))
    dead = too_many | nan_bad

    energy = jnp.where(active[..., None], energy * albedo, energy)
    energy = jnp.where(dead[..., None], 0.0, energy)
    w = jnp.where(active[..., None], w_new, w)
    lam = jnp.where(active, _lambda(w_new, alpha), lam)
    h = jnp.where(active, h_new, h)
    order = order + active.astype(jnp.int32)
    active = active & ~dead
    return state, w, lam, h, energy, order, active, escaped

  a0 = jnp.ones(r, bool) if active0 is None else active0
  carry = (state, w0, lam0, jnp.ones(r), jnp.ones((r, c)),
           jnp.zeros(r, jnp.int32), a0, jnp.zeros(r, bool))
  state, w, lam, h, energy, order, active, escaped = jax.lax.while_loop(cond, body, carry)
  return w, jnp.where(escaped[..., None], energy, 0.0)


def diffuse_eval_walk(w_i, w_o, alpha, albedo, seed_a, seed_b, active0=None):
  """Stochastic rough-diffuse eval (eval_diffuse, bsdf_external.hxx:580-628).

  Returns the bsdf with cosine folded in (the reference's eval.bsdf).
  `active0` restricts the walk to consuming lanes (see conductor_sample_walk).
  """
  r = w_i.shape[0]
  c = albedo.shape[-1]
  state = _seed_from_floats(seed_a, seed_b)

  lam_o = _lambda(w_o, alpha)

  def cond(carry):
    state, w, lam, h, energy, order, active, res = carry
    return jnp.any(active)

  def body(carry):
    state, w, lam, h, energy, order, active, res = carry
    c1 = _c1(h)
    g1 = _g1(w, lam, c1)
    state, u_h = rng.next_float(state)
    h_new = sample_height(w, lam, c1, g1, h, u_h)
    esc = active & (h_new >= em.kMaxFloat * 0.5)
    active2 = active & ~esc

    state, rnd2 = rng.next_2d(state)
    wm = sample_microfacet_normal(-w, alpha, rnd2)
    phase = energy * albedo * jnp.maximum(0.0, em.dot(wm, w_o))[..., None] * em.kInvPi

    # order 0: closed-form G2/G1; else shadowing G1(w_o) at current height
    g2_g1 = -lam / (lam_o - lam)
    first = active2 & (order == 0)
    res = res + jnp.where((first & (g2_g1 > 0))[..., None], phase * g2_g1[..., None], 0.0)
    c1_sh = _c1(h_new)
    g1_sh = _g1(w_o, lam_o, c1_sh)
    later = active2 & (order > 0)
    res = res + jnp.where(later[..., None], phase * g1_sh[..., None], 0.0)

    state, rnd3 = rng.next_2d(state)
    w_new = _sample_phase_diffuse(wm, rnd3)
    energy = jnp.where(active2[..., None], energy * albedo, energy)

    bad = active2 & ((order + 1 > kOrderMax) | ~jnp.isfinite(w_new[..., 2]) | ~jnp.isfinite(h_new))
    # reference zeroes the whole estimate on a bad walk
    res = jnp.where(bad[..., None], 0.0, res)
    w = jnp.where(active2[..., None], w_new, w)
    lam = jnp.where(active2, _lambda(w_new, alpha), lam)
    h = jnp.where(active2, h_new, h)
    order = order + active2.astype(jnp.int32)
    active = active2 & ~bad
    return state, w, lam, h, energy, order, active, res

  a0 = jnp.ones(r, bool) if active0 is None else active0
  carry = (state, -w_i, _lambda(-w_i, alpha), jnp.ones(r), jnp.ones((r, c)),
           jnp.zeros(r, jnp.int32), a0, jnp.zeros((r, c)))
  state, w, lam, h, energy, order, active, res = jax.lax.while_loop(cond, body, carry)
  return res


# ---------------------------------------------------------------------------
# vMF diffuse: "VMF Diffuse: A Unified Rough Diffuse BRDF" (d'Eon & Weidlich),
# analytic fit (bsdf_external.hxx:694-893)
# ---------------------------------------------------------------------------


def _erf(x):
  # Buermann series (bsdf_external.hxx:700-704)
  sqrt_pi = jnp.sqrt(em.kPi)
  e = jnp.exp(-x * x)
  return (jnp.sign(x) * 2.0 / sqrt_pi * jnp.sqrt(1.0 - e)
          * (sqrt_pi / 2.0 + 31.0 / 200.0 * e - 341.0 / 8000.0 * e * e))


def _fm(ui, uo, r, c):
  big_c = jnp.sqrt(jnp.maximum(1.0 - c, 0.0))
  ck = (1.0 - 0.5441615108674713 * big_c - 0.45302863761693374 * (1.0 - c)) / (
      1.0 + 1.4293127703064865 * big_c)
  ca = c / jnp.power(1.0075 + 1.16942 * big_c,
                     jnp.arctan((0.0225272 + (-0.264641 + r) * r) * _erf(c)))
  return jnp.maximum(
      0.0, 0.384016 * (-0.341969 + ca) * ca * ck
      * (-0.0578978 / (0.287663 + ui * uo) + jnp.abs(-0.0898863 + jnp.tanh(r))))


def _sigma_beckmann(u, m):
  m2 = jnp.maximum(m * m, 1e-12)
  u = jnp.clip(u, -1.0 + 1e-6, 1.0 - 1e-6)
  u2 = u * u
  expansion = -0.25 * m2 * (u + jnp.abs(u))
  t = (jnp.exp(u2 / (m2 * (-1.0 + u2))) * m * jnp.sqrt(1.0 - u2)) / jnp.sqrt(em.kPi)
  return (t + u * (1.0 + _erf(u / (m * jnp.sqrt(1.0 - u2))))) / 2.0 + expansion


def _coth(x):
  return 1.0 / jnp.tanh(x)


def _sigma_vmf(u, m):
  """vMF cross-section fit (sigmaVMF, bsdf_external.hxx:742-788)."""
  m2 = m * m
  m4 = m2 * m2
  m8 = m4 * m4
  u2 = u * u
  u4 = u2 * u2
  u6 = u2 * u4
  u8 = u4 * u4
  u10 = u6 * u4
  u12 = u6 * u6
  arg = jnp.minimum(2.0 / jnp.maximum(m2, 1e-6), 60.0)
  coth2m2 = _coth(arg)
  sinh2m2 = jnp.sinh(arg)
  exp2m2 = jnp.exp(arg)

  large = (0.25 - 0.25 * u * (m2 - 2.0 * coth2m2)
           + 0.0390625 * (-1.0 + 3.0 * u2) * (4.0 + 3.0 * m4 - 6.0 * m2 * coth2m2))

  q2 = (1.0132789611816406e-6 * (35.0 - 1260.0 * u2 + 6930.0 * u4 - 12012.0 * u6 + 6435.0 * u8)
        * (1.0 + coth2m2)
        * (-256.0 - 315.0 * m4 * (128.0 + 33.0 * m4 * (80.0 + 364.0 * m4 + 195.0 * m8))
           + 18.0 * m2 * (256.0 + 385.0 * m4 * (32.0 + 312.0 * m4 + 585.0 * m8)) * coth2m2)
        * sinh2m2)
  q1 = (9.12696123123169e-8 * (-63.0 + 3465.0 * u2 - 30030.0 * u4 + 90090.0 * u6 - 109395.0 * u8 + 46189.0 * u10)
        * (1.0 + coth2m2)
        * (-1024.0 - 495.0 * m4 * (768.0 + 91.0 * m4 * (448.0 + 15.0 * m4 * (448.0 + 1836.0 * m4 + 969.0 * m8)))
           + 110.0 * m2 * (256.0 + 117.0 * m4 * (256.0 + 21.0 * m4 * (336.0 + 85.0 * m4 * (32.0 + 57.0 * m4)))) * coth2m2)
        * sinh2m2)
  q0 = (4.3655745685100555e-9 * (231.0 - 18018.0 * u2 + 225225.0 * u4 - 1.02102e6 * u6 + 2.078505e6 * u8 - 1.939938e6 * u10 + 676039.0 * u12)
        * (1.0 + coth2m2)
        * (-4096.0 - 3003.0 * m4 * (1024.0 + 45.0 * m4 * (2560.0 + 51.0 * m4 * (1792.0 + 285.0 * m4 * (80.0 + 308.0 * m4 + 161.0 * m8))))
           + 78.0 * m2 * (2048.0 + 385.0 * m4 * (1280.0 + 153.0 * m4 * (512.0 + 57.0 * m4 * (192.0 + 35.0 * m4 * (40.0 + 69.0 * m4))))) * coth2m2)
        * sinh2m2)

  mid = (large
         - 0.000732421875 * (3.0 - 30.0 * u2 + 35.0 * u4)
         * (16.0 + 180.0 * m4 + 105.0 * m8 - 10.0 * m2 * (8.0 + 21.0 * m4) * coth2m2)
         + 0.000049591064453125 * (-5.0 + 105.0 * u2 - 315.0 * u4 + 231.0 * u6)
         * (64.0 + 105.0 * m4 * (32.0 + 180.0 * m4 + 99.0 * m8)
            - 42.0 * m2 * (16.0 + 240.0 * m4 + 495.0 * m8) * coth2m2)
         + q2 / exp2m2 - q1 / exp2m2 + q0 / exp2m2)

  return jnp.where(m < 0.25, _sigma_beckmann(u, m),
                   jnp.where(m > 0.9, large, mid))


def vmf_diffuse_brdf(w_i, w_o, alpha, albedo):
  """vMFdiffuseBRDF (bsdf_external.hxx:787-893). w_i/w_o local, z>0.

  Returns the BRDF value (no cosine), shape (R,C).
  """
  r = jnp.clip(jnp.sqrt(alpha[..., 0] * alpha[..., 1]), 0.0, 1.0 - 4.0 * em.kEpsilon)

  ui = jnp.clip(w_i[..., 2], 1e-5, 1.0)
  uo = jnp.clip(w_o[..., 2], 1e-5, 1.0)
  sin_i = jnp.sqrt(jnp.maximum(1.0 - ui * ui, 0.0))
  sin_o = jnp.sqrt(jnp.maximum(1.0 - uo * uo, 0.0))
  both = (sin_i > 0.0) & (sin_o > 0.0)
  safe_i = jnp.maximum(sin_i, 1e-9)
  safe_o = jnp.maximum(sin_o, 1e-9)
  cos_phi_diff = jnp.where(
      both,
      jnp.clip(jnp.clip(w_i[..., 0] / safe_i, -1, 1) * jnp.clip(w_o[..., 0] / safe_o, -1, 1)
               + jnp.clip(w_i[..., 1] / safe_i, -1, 1) * jnp.clip(w_o[..., 1] / safe_o, -1, 1),
               -1.0, 1.0), 0.0)
  phi = jnp.arccos(cos_phi_diff)

  m = -jnp.log(jnp.maximum(1.0 - jnp.sqrt(r), 1e-7))
  sigmai = _sigma_vmf(ui, m)
  sigmao = _sigma_vmf(uo, m)
  sigmano = _sigma_vmf(-uo, m)
  sigio = sigmai * sigmao
  sigdenom = jnp.maximum(uo * sigmai + ui * sigmano, 1e-9)

  r2 = r * r
  sqr = jnp.sqrt(r)
  r25 = r2 * sqr
  r3 = r * r2
  r4 = r2 * r2
  r45 = r4 * sqr
  r5 = r3 * r2
  ui2 = jnp.clip(ui * ui, 0.0, 1.0)
  uo2 = jnp.clip(uo * uo, 0.0, 1.0)
  sqrtuiuo = jnp.sqrt((1.0 - ui2) * (1.0 - uo2))
  uio = jnp.maximum(ui + uo, 1e-6)

  c100 = 1.0 + (-0.1 * r + 0.84 * r4) / (1.0 + 9.0 * r3)
  c101 = (0.0173 * r + 20.4 * r2 - 9.47 * r3) / (1.0 + 7.46 * r)
  c102 = (-0.927 * r + 2.37 * r2) / (1.24 + r2)
  c103 = (-0.110 * r - 1.54 * r2) / (1.0 - 1.05 * r + 7.1 * r2)
  f10 = ((c100 + c101 * ui * uo + c102 * ui2 * uo2 + c103 * (ui2 + uo2)) * sigio) / sigdenom

  c110 = (0.54 * r - 0.182 * r3) / (1.0 + 1.32 * r2)
  c111 = (-0.097 * r + 0.62 * r2 - 0.375 * r3) / (1.0 + 0.4 * r3)
  c112 = 0.283 + 0.862 * r - 0.681 * r2
  f11 = (sqrtuiuo * (c110 + c111 * ui * uo)) * jnp.power(jnp.maximum(sigio, 1e-12), c112) / sigdenom

  c120 = (2.25 * r + 5.1 * r2) / (1.0 + 9.8 * r + 32.4 * r2)
  c121 = (-4.32 * r + 6.0 * r3) / (1.0 + 9.7 * r + 287.0 * r3)
  f12 = ((1.0 - ui2) * (1.0 - uo2) * (c120 + c121 * uo) * (c120 + c121 * ui)) / uio

  c200 = (0.00056 * r + 0.226 * r2) / (1.0 + 7.07 * r2)
  c201 = (-0.268 * r + 4.57 * r2 - 12.04 * r3) / (1.0 + 36.7 * r3)
  c202 = (0.418 * r + 2.52 * r2 - 0.97 * r3) / (1.0 + 10.0 * r2)
  c203 = (0.068 * r - 2.25 * r2 + 2.65 * r3) / (1.0 + 21.4 * r3)
  c204 = (0.050 * r - 4.22 * r3) / (1.0 + 17.6 * r2 + 43.1 * r3)
  f20 = (c200 + c201 * ui * uo + c203 * ui2 * uo2 + c202 * (ui + uo) + c204 * (ui2 + uo2)) / uio

  c210 = (-0.049 * r - 0.027 * r3) / (1.0 + 3.36 * r2)
  c211 = (2.77 * r2 - 8.332 * r25 + 6.073 * r3) / (1.0 + 50.0 * r4)
  c212 = (-0.431 * r2 - 0.295 * r3) / (1.0 + 23.9 * r3)
  f21 = (sqrtuiuo * (c210 + c211 * ui * uo + c212 * (ui + uo))) / uio

  c300 = (-0.083 * r3 + 0.262 * r4) / (1.0 - 1.9 * r2 + 38.6 * r4)
  c301 = (-0.627 * r2 + 4.95 * r25 - 2.44 * r3) / (1.0 + 31.5 * r4)
  c302 = (0.33 * r2 + 0.31 * r25 + 1.4 * r3) / (1.0 + 20.0 * r3)
  c303 = (-0.74 * r2 + 1.77 * r25 - 4.06 * r3) / (1.0 + 215.0 * r5)
  c304 = (-1.026 * r3) / (1.0 + 5.81 * r2 + 13.2 * r3)
  f30 = (c300 + c301 * ui * uo + c303 * ui2 * uo2 + c302 * (ui + uo) + c304 * (ui2 + uo2)) / uio

  c310 = (0.028 * r2 - 0.0132 * r3) / (1.0 + 7.46 * r2 - 3.315 * r4)
  c311 = (-0.134 * r2 + 0.162 * r25 + 0.302 * r3) / (1.0 + 57.5 * r45)
  c312 = (-0.119 * r2 + 0.5 * r25 - 0.207 * r3) / (1.0 + 18.7 * r3)
  f31 = (sqrtuiuo * (c310 + c311 * ui * uo + c312 * (ui + uo))) / uio

  a = albedo
  t0 = a * jnp.maximum(0.0, f10 + f11 * jnp.cos(phi) * 2.0 + f12 * jnp.cos(2.0 * phi) * 2.0)[..., None]
  t1 = a * a * jnp.maximum(0.0, f20 + f21 * jnp.cos(phi) * 2.0)[..., None]
  t2 = a * a * a * jnp.maximum(0.0, f30 + f31 * jnp.cos(phi) * 2.0)[..., None]
  t4 = _fm(ui[..., None], uo[..., None], r[..., None], a)
  result = em.kInvPi * (t0 + t1 + t2) + t4
  return jnp.where((r > 0.0)[..., None], result, albedo * em.kInvPi)


# ---------------------------------------------------------------------------
# Heitz multiple-scattering DIELECTRIC walk (bsdf_external.hxx:355-556,
# DielectricBSDF::sample bsdf_dielectric.hxx:73-147)
# ---------------------------------------------------------------------------


def _refract_local(wi, wm, eta):
  """refract (bsdf_external.hxx:369-374); eta (R,)."""
  cos_i = em.dot(wi, wm)
  cos_t2 = 1.0 - (1.0 - cos_i * cos_i) / (eta * eta)
  cos_t = -jnp.sqrt(jnp.maximum(cos_t2, 0.0))
  return wm * (cos_i / eta + cos_t)[..., None] - wi / eta[..., None]


def _abgam(x):
  g = (1.0 / 12.0, 1.0 / 30.0, 53.0 / 210.0, 195.0 / 371.0,
       22999.0 / 22737.0, 29944523.0 / 19733142.0, 109535241009.0 / 48264275462.0)
  k = 0.918938518
  cont = g[6] / x
  for gi in (g[5], g[4], g[3], g[2], g[1]):
    cont = gi / (x + cont)
  return k - x + (x - 0.5) * jnp.log(x) + g[0] / (x + cont)


def _gamma_fn(x):
  return jnp.exp(_abgam(x + 5.0)) / (x * (x + 1.0) * (x + 2.0) * (x + 3.0) * (x + 4.0))


def _beta_fn(m, n):
  return _gamma_fn(m) * _gamma_fn(n) / jnp.maximum(_gamma_fn(m + n), 1e-20)


def dielectric_sample_walk(fresnel_fn, mono_fn, eta, w_i, alpha, rnd,
                           active0=None):
  """MS dielectric sampling walk. w_i local with z>0 (direction_scale folded
  by the caller); fresnel_fn(cos, outside_mask)->(R,C); mono_fn collapses a
  response to (R,); eta (R,) = int/ext for the walk's start orientation.

  Returns (w_o_local, weight (R,C), outside (R,) bool, escaped (R,) bool);
  w_o is in the walk frame — the caller re-applies direction_scale.
  `active0` restricts the walk to consuming lanes (see conductor_sample_walk).
  """
  r = w_i.shape[0]
  state = _seed_from_floats(rnd[..., 3] + 0.531, rnd[..., 4] + 0.207)
  c = fresnel_fn(jnp.ones(r), jnp.ones(r, bool)).shape[-1]

  w0 = -w_i
  lam0 = _lambda(w0, alpha)

  def cond(carry):
    state, w, lam, h, energy, outside, order, active, escaped = carry
    return jnp.any(active)

  def body(carry):
    state, w, lam, h, energy, outside, order, active, escaped = carry
    c1 = _c1(h)
    g1 = _g1(w, lam, c1)
    state, u_h = rng.next_float(state)
    h_new = sample_height(w, lam, c1, g1, h, u_h)
    just_escaped = active & (h_new >= em.kMaxFloat * 0.5)
    escaped = escaped | just_escaped
    active = active & ~just_escaped
    h = jnp.where(active, h_new, h)

    state, rnd2 = rng.next_2d(state)
    state, rnd_r = rng.next_float(state)
    slope_rnd = jnp.where((order == 0)[..., None], rnd[..., 0:2], rnd2)
    refl_rnd = jnp.where(order == 0, rnd[..., 2], rnd_r)

    wi_cur = -w
    wm = sample_microfacet_normal(wi_cur, alpha, slope_rnd)
    i_dot_m = em.dot(wi_cur, wm)
    f = fresnel_fn(i_dot_m, outside)
    f_mono = mono_fn(f)
    reflect = refl_rnd < f_mono

    eta_cur = jnp.where(outside, eta, 1.0 / eta)
    w_refl = -wi_cur + 2.0 * wm * i_dot_m[..., None]
    w_refr = em.normalize(_refract_local(wi_cur, wm, eta_cur))

    new_w = jnp.where(reflect[..., None], w_refl, -w_refr)
    energy = jnp.where(active[..., None],
                       energy * jnp.where(reflect[..., None], f, 1.0 - f), energy)
    h = jnp.where(active & ~reflect, -h, h)
    outside = outside ^ (active & ~reflect)

    too_many = active & (order + 1 > kOrderMax)
    nan_bad = active & (~jnp.isfinite(new_w[..., 2]) | ~jnp.isfinite(h))
    dead = too_many | nan_bad
    energy = jnp.where(dead[..., None], 0.0, energy)

    w = jnp.where(active[..., None], new_w, w)
    lam = jnp.where(active, _lambda(w, alpha), lam)
    order = order + active.astype(jnp.int32)
    active = active & ~dead
    return state, w, lam, h, energy, outside, order, active, escaped

  a0 = jnp.ones(r, bool) if active0 is None else active0
  carry = (state, w0, lam0, jnp.ones(r), jnp.ones((r, c)), jnp.ones(r, bool),
           jnp.zeros(r, jnp.int32), a0, jnp.zeros(r, bool))
  state, w, lam, h, energy, outside, order, active, escaped = \
      jax.lax.while_loop(cond, body, carry)
  w_o = jnp.where(outside[..., None], w, -w)
  return w_o, jnp.where(escaped[..., None], energy, 0.0), outside, escaped


def _phase_reflection_d(fresnel_fn, w, lam, wo, alpha, outside):
  """phase_function_reflection (bsdf_external.hxx:207-239)."""
  proj = jnp.where(w[..., 2] < -0.9999, 1.0, lam * w[..., 2])
  wh = em.normalize(-w + wo)
  wdh = em.dot(-w, wh)
  f = fresnel_fn(wdh, outside)
  d = mf.ggx_d(wh, alpha)
  val = f * (d / jnp.maximum(4.0 * proj, 1e-9))[..., None]
  ok = ((w[..., 2] <= 0.9999) & (proj >= em.kEpsilon)
        & (wh[..., 2] >= 0.0) & (wdh >= em.kEpsilon))
  return jnp.where(ok[..., None], val, 0.0)


def _phase_transmission_d(fresnel_fn, w, lam, wo, eta_rel, alpha, outside):
  """evalPhaseFunction_dielectric transmission branch (:386-404)."""
  proj = jnp.where(w[..., 2] < -0.9999, 1.0, lam * w[..., 2])
  wh = em.normalize(-w + wo * eta_rel[..., None])
  wh = wh * jnp.where(wh[..., 2] > 0, 1.0, -1.0)[..., None]
  i_dot_m = -em.dot(wh, w)
  o_dot_m = em.dot(wo, wh)
  d = mf.ggx_d(wh, alpha)
  scalar = (eta_rel * eta_rel * i_dot_m * jnp.maximum(0.0, -o_dot_m) * d
            / jnp.maximum(proj * em.sqr(i_dot_m + eta_rel * o_dot_m), 1e-12))
  f = fresnel_fn(i_dot_m, outside)
  val = (1.0 - f) * scalar[..., None]
  ok = (w[..., 2] <= 0.9999) & (proj >= em.kEpsilon) & (i_dot_m >= 0.0)
  return jnp.where(ok[..., None], val, 0.0)


def _mis_weight_dielectric(wi, wo, reflection, eta, alpha):
  """MISweight_dielectric (bsdf_external.hxx:457-468)."""
  wh_r = em.normalize(wi + wo)
  wh_t = em.normalize(wi + wo * eta[..., None])
  wh = jnp.where(reflection[..., None], wh_r, wh_t)
  wh = wh * jnp.where(wh[..., 2] > 0, 1.0, -1.0)[..., None]
  d = mf.ggx_d(wh, alpha)
  same = reflection & jnp.all(jnp.abs(wi + wo) < 1e-6, axis=-1)
  return jnp.where(same, 1.0, d)


def dielectric_eval_walk(fresnel_fn, mono_fn, eta, w_i, w_o, wo_outside,
                         alpha, seed_a, seed_b, active0=None):
  """Stochastic MS dielectric eval (eval_dielectric, bsdf_external.hxx:466-556).

  w_i local z>0; w_o local; wo_outside (R,) bool: True when w_o leaves on the
  incident side (reflection configs). Returns 0.5*single + multiple, the
  reference's estimator (:555).
  `active0` restricts the walk to consuming lanes (see conductor_sample_walk).
  """
  r = w_i.shape[0]
  state = _seed_from_floats(seed_a, seed_b)
  c = fresnel_fn(jnp.ones(r), jnp.ones(r, bool)).shape[-1]

  lam_sh = _lambda(jnp.where(wo_outside[..., None], w_o, -w_o), alpha)
  wo_sh = jnp.where(wo_outside[..., None], w_o, -w_o)

  single = jnp.zeros((r, c))
  multiple = jnp.zeros((r, c))

  def cond(carry):
    state, w, lam, h, energy, outside, order, active, single, multiple, wi_mis = carry
    return jnp.any(active)

  def body(carry):
    state, w, lam, h, energy, outside, order, active, single, multiple, wi_mis = carry
    c1 = _c1(h)
    g1 = _g1(w, lam, c1)
    state, u_h = rng.next_float(state)
    h_new = sample_height(w, lam, c1, g1, h, u_h)
    esc = active & (h_new >= em.kMaxFloat * 0.5)
    active2 = active & ~esc
    h = jnp.where(active2, h_new, h)
    order_new = order + active2.astype(jnp.int32)

    # --- next-event estimation toward w_o ---
    # ray is "outside" in its own frame when outside==True; target direction
    # and relative eta depend on side agreement (eval_dielectric :516-531)
    refl_cfg = outside == wo_outside   # same side -> reflection-type phase
    eta_out = eta                      # when walking outside
    eta_in = 1.0 / eta                 # when walking inside
    eta_rel = jnp.where(outside, eta_out, eta_in)
    wo_tgt = jnp.where(outside[..., None], w_o, -w_o)

    ph_r = _phase_reflection_d(fresnel_fn, w, lam, wo_tgt, alpha, outside)
    ph_t = _phase_transmission_d(fresnel_fn, w, lam, wo_tgt, eta_rel, alpha, outside)
    phase = jnp.where(refl_cfg[..., None], ph_r, ph_t)

    # single scattering: closed-form G2/G1 (order 1)
    lam_ray = lam
    g2_g1_refl = (1.0 + (-lam_ray - 1.0)) / (1.0 + (-lam_ray - 1.0) + lam_sh)
    g2_g1_tran = (1.0 + (-lam_ray - 1.0)) * _beta_fn(
        jnp.maximum(1.0 + (-lam_ray - 1.0), 1e-4), jnp.maximum(1.0 + lam_sh, 1e-4))
    g2_g1 = jnp.where(wo_outside, g2_g1_refl, g2_g1_tran)
    g2_g1 = jnp.where(jnp.isfinite(g2_g1), g2_g1, 0.0)
    is_first = active2 & (order_new == 1)
    single = jnp.where(is_first[..., None], phase * g2_g1[..., None], single)

    # multiple scattering: shadowing G1 + microsurface MIS (order > 1)
    mis_other = _mis_weight_dielectric(-w, wo_tgt, refl_cfg, eta_rel, alpha)
    mis = wi_mis / jnp.maximum(wi_mis + mis_other, 1e-20)
    h_sh = jnp.where(outside == wo_outside, h, -h)
    c1_sh = _c1(h_sh)
    g1_sh = _g1(wo_sh, lam_sh, c1_sh)
    later = active2 & (order_new > 1)
    multiple = multiple + jnp.where(later[..., None],
                                    phase * (g1_sh * mis)[..., None], 0.0)

    # --- next direction ---
    state, rnd2 = rng.next_2d(state)
    state, rnd_r = rng.next_float(state)
    wi_cur = -w
    wm = sample_microfacet_normal(wi_cur, alpha, rnd2)
    i_dot_m = em.dot(wi_cur, wm)
    f = fresnel_fn(i_dot_m, outside)
    reflect = rnd_r < mono_fn(f)
    eta_cur = jnp.where(outside, eta, 1.0 / eta)
    w_refl = -wi_cur + 2.0 * wm * i_dot_m[..., None]
    w_refr = em.normalize(_refract_local(wi_cur, wm, eta_cur))
    new_w = jnp.where(reflect[..., None], w_refl, -w_refr)
    h = jnp.where(active2 & ~reflect, -h, h)
    outside = outside ^ (active2 & ~reflect)

    wi_mis = jnp.where(active2 & (order_new == 1),
                       _mis_weight_dielectric(w_i, new_w, reflect, eta, alpha),
                       wi_mis)

    bad = active2 & ((order_new > kOrderMax) | ~jnp.isfinite(new_w[..., 2])
                     | ~jnp.isfinite(h) | (jnp.abs(new_w[..., 2]) <= em.kEpsilon))
    single = jnp.where(bad[..., None], 0.0, single)
    multiple = jnp.where(bad[..., None], 0.0, multiple)

    w = jnp.where(active2[..., None], new_w, w)
    lam = jnp.where(active2, _lambda(w, alpha), lam)
    active = active2 & ~bad
    return state, w, lam, h, energy, outside, order_new, active, single, multiple, wi_mis

  a0 = jnp.ones(r, bool) if active0 is None else active0
  carry = (state, -w_i, _lambda(-w_i, alpha), jnp.ones(r), jnp.ones((r, c)),
           jnp.ones(r, bool), jnp.zeros(r, jnp.int32), a0,
           single, multiple, jnp.zeros(r))
  out = jax.lax.while_loop(cond, body, carry)
  single, multiple = out[8], out[9]
  return 0.5 * single + multiple
