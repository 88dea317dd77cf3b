"""Shared microfacet + Fresnel machinery (render/shared/bsdf.hxx:113-377).

All functions operate in the local shading frame (z = normal) on batched
arrays. GGX follows the visible-NDF formulation; the pdf matches the
reference's `D/( (1+Lambda) * 4 cos_i ) + cos_o` convention used by the
multiple-scattering conductor/dielectric lobes (bsdf_conductor.hxx:63).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from etx_tracer_tpu.core import math as em
from etx_tracer_tpu.core import spectrum as sp

kMinAlpha = 1.0 / 256.0


def clamp_alpha(a):
  return jnp.maximum(a, kMinAlpha)


def ggx_d(m, alpha):
  """Anisotropic GGX NDF, local frame (bsdf.hxx:220-225). m: (...,3), alpha: (...,2)."""
  ax = alpha[..., 0]
  ay = alpha[..., 1]
  t = em.sqr(m[..., 0] / ax) + em.sqr(m[..., 1] / ay) + em.sqr(m[..., 2])
  return 1.0 / jnp.maximum(em.kPi * ax * ay * em.sqr(t), 1e-20)


def smith_lambda(w, alpha):
  """Smith Lambda for the height-correlated masking term.

  Matches external::RayInfo Lambda (bsdf_external.hxx:16-69): anisotropic
  alpha projected onto the direction.
  """
  wz = w[..., 2]
  inv_sin2 = em.sqr(wz) / jnp.maximum(1.0 - em.sqr(wz), 1e-12)
  cos_phi2 = em.sqr(w[..., 0]) / jnp.maximum(1.0 - em.sqr(wz), 1e-12)
  sin_phi2 = em.sqr(w[..., 1]) / jnp.maximum(1.0 - em.sqr(wz), 1e-12)
  alpha_proj2 = cos_phi2 * em.sqr(alpha[..., 0]) + sin_phi2 * em.sqr(alpha[..., 1])
  a2 = inv_sin2 / jnp.maximum(alpha_proj2, 1e-12)
  lam = 0.5 * (-1.0 + jnp.sqrt(1.0 + 1.0 / jnp.maximum(a2, 1e-12)))
  # downward directions mirror (used by the walk; for up directions this form holds)
  return jnp.where(jnp.abs(wz) >= 1.0, 0.0, lam)


def ggx_g1(w, m, alpha):
  """Smith masking G1 (bsdf.hxx:198-212)."""
  xy_alpha2 = em.sqr(alpha[..., 0] * w[..., 0]) + em.sqr(alpha[..., 1] * w[..., 1])
  tan2 = xy_alpha2 / jnp.maximum(em.sqr(w[..., 2]), 1e-12)
  g = 2.0 / (1.0 + jnp.sqrt(1.0 + tan2))
  g = jnp.where(xy_alpha2 == 0.0, 1.0, g)
  g = jnp.where(em.dot(w, m) * w[..., 2] <= 0.0, 0.0, g)
  return g


def sample_vndf(rnd, w_i, alpha):
  """Sample a visible normal (bsdf.hxx NormalDistribution::sample, :128-146).

  w_i: local incident direction with z>0 (pointing away from surface).
  """
  ax = alpha[..., 0:1]
  ay = alpha[..., 1:2]
  v_h = em.normalize(jnp.concatenate([ax * w_i[..., 0:1], ay * w_i[..., 1:2], w_i[..., 2:3]], axis=-1))
  len2 = em.sqr(v_h[..., 0]) + em.sqr(v_h[..., 1])
  u = jnp.where(
      (len2 > 0.0)[..., None],
      jnp.stack([-v_h[..., 1], v_h[..., 0], jnp.zeros_like(len2)], axis=-1)
      / jnp.sqrt(jnp.maximum(len2, 1e-20))[..., None],
      jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), v_h.shape))
  v = jnp.cross(v_h, u)
  r = jnp.sqrt(jnp.maximum(rnd[..., 0], 0.0))
  phi = em.kDoublePi * rnd[..., 1]
  t1 = r * jnp.cos(phi)
  t2 = r * jnp.sin(phi)
  s = 0.5 * (1.0 + v_h[..., 2])
  t2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - t1 * t1, 0.0)) + s * t2
  n_h = (t1[..., None] * u + t2[..., None] * v
         + jnp.sqrt(jnp.maximum(1.0 - t1 * t1 - t2 * t2, 0.0))[..., None] * v_h)
  m = em.normalize(jnp.concatenate(
      [ax * n_h[..., 0:1], ay * n_h[..., 1:2], jnp.maximum(n_h[..., 2:3], 0.0)], axis=-1))
  return m


def vndf_pdf(w_i, m, alpha):
  """pdf of sample_vndf: D(m) G1(w_i) |w_i.m| / cos_i (bsdf.hxx:173-188)."""
  d = ggx_d(m, alpha)
  g1 = ggx_g1(w_i, m, alpha)
  s = jnp.abs(em.dot(w_i, m)) / jnp.maximum(w_i[..., 2], 1e-9)
  return d * g1 * s


def ms_pdf(w_i, w_o, alpha):
  """Reference's conductor/dielectric reflection pdf:
  D_ggx(wh)/( (1+Lambda(w_i)) 4 cos_i ) + cos_o (bsdf_conductor.hxx:63)."""
  wh = em.normalize(w_i + w_o)
  d = ggx_d(wh, alpha)
  lam = smith_lambda(w_i, alpha)
  return d / ((1.0 + lam) * 4.0 * jnp.maximum(w_i[..., 2], 1e-9)) + jnp.maximum(w_o[..., 2], 0.0)


# ---------------------------------------------------------------------------
# Fresnel (bsdf.hxx:241-377). Per-channel complex arithmetic implemented on
# (re, im) float pairs — the TPU backend has no complex dtype, and real-pair
# math fuses cleanly on the VPU anyway.
# ---------------------------------------------------------------------------


def _cmul(a, b):
  return a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0]


def _cdiv(a, b):
  d = b[0] * b[0] + b[1] * b[1]
  d = jnp.where(d == 0.0, 1e-30, d)
  return (a[0] * b[0] + a[1] * b[1]) / d, (a[1] * b[0] - a[0] * b[1]) / d


def _csqrt(a):
  r = jnp.sqrt(jnp.maximum(a[0] * a[0] + a[1] * a[1], 0.0))
  re = jnp.sqrt(jnp.maximum(0.5 * (r + a[0]), 0.0))
  im = jnp.sqrt(jnp.maximum(0.5 * (r - a[0]), 0.0)) * jnp.where(a[1] < 0.0, -1.0, 1.0)
  return re, im


def _cabs2(a):
  return a[0] * a[0] + a[1] * a[1]


def _csub(a, b):
  return a[0] - b[0], a[1] - b[1]


def _cadd(a, b):
  return a[0] + b[0], a[1] + b[1]


def _cscale(a, s):
  return a[0] * s, a[1] * s


def _reflectance_c(ni, cos_i, nj, cos_j):
  """Complex rs/rp (bsdf.hxx:249-268)."""
  a = _cmul(ni, cos_i)
  b = _cmul(nj, cos_j)
  rs = _cdiv(_csub(a, b), _cadd(a, b))
  c = _cmul(nj, cos_i)
  e = _cmul(ni, cos_j)
  rp = _cdiv(_csub(c, e), _cadd(c, e))
  return rs, rp


def _transmittance_c(ni, cos_i, nj, cos_j):
  two_ni_ci = _cscale(_cmul(ni, cos_i), 2.0)
  ts = _cdiv(two_ni_ci, _cadd(_cmul(ni, cos_i), _cmul(nj, cos_j)))
  tp = _cdiv(two_ni_ci, _cadd(_cmul(ni, cos_j), _cmul(nj, cos_i)))
  return ts, tp


def fresnel_generic(cos_theta_i, ext_ior, int_ior):
  """|F| for complex IORs (bsdf.hxx:291-297).

  ext_ior/int_ior: (re, im) pairs of arrays; cos_theta_i real array.
  """
  cos_i = (cos_theta_i, jnp.zeros_like(cos_theta_i))
  ratio = _cdiv(ext_ior, int_ior)
  ratio2 = _cmul(ratio, ratio)
  one_minus_c2 = _csub((jnp.ones_like(cos_theta_i), jnp.zeros_like(cos_theta_i)),
                       _cmul(cos_i, cos_i))
  sin2_o = _cmul(ratio2, one_minus_c2)
  cos_o = _csqrt(_csub((jnp.ones_like(sin2_o[0]), jnp.zeros_like(sin2_o[0])), sin2_o))
  rs, rp = _reflectance_c(ext_ior, cos_i, int_ior, cos_o)
  f = 0.5 * (_cabs2(rs) + _cabs2(rp))
  same = (ext_ior[0] == int_ior[0]) & (ext_ior[1] == int_ior[1])
  return jnp.where(same, 0.0, f)


def fresnel_thinfilm(wavelength, cos_theta_0, ext_ior, film_ior, int_ior, thickness):
  """Thin-film interference Fresnel (bsdf.hxx:299-338), real-pair math."""
  one = (jnp.ones_like(cos_theta_0), jnp.zeros_like(cos_theta_0))
  cos0 = (cos_theta_0, jnp.zeros_like(cos_theta_0))

  r01 = _cdiv(ext_ior, film_ior)
  sin1_2 = _cmul(_cmul(r01, r01), _csub(one, _cmul(cos0, cos0)))
  cos1 = _csqrt(_csub(one, sin1_2))
  r12 = _cdiv(film_ior, int_ior)
  sin2_2 = _cmul(_cmul(r12, r12), _csub(one, _cmul(cos1, cos1)))
  cos2 = _csqrt(_csub(one, sin2_2))

  ratio = _cdiv(_cmul(int_ior, cos2), _cmul(ext_ior, cos0))

  delta10 = jnp.where(ext_ior[0] < film_ior[0], em.kPi, 0.0)
  delta21 = jnp.where(film_ior[0] < int_ior[0], em.kPi, 0.0)
  phase_shift = delta10 + delta21

  r01s, r01p = _reflectance_c(ext_ior, cos0, film_ior, cos1)
  t01s, t01p = _transmittance_c(ext_ior, cos0, film_ior, cos1)
  r12s, r12p = _reflectance_c(film_ior, cos1, int_ior, cos2)
  t12s, t12p = _transmittance_c(film_ior, cos1, int_ior, cos2)

  # phi = (4*pi*thickness*cos1 + phase_shift*film_ior) / wavelength (complex)
  phi = (em.kDoublePi * 2.0 * thickness * cos1[0] + phase_shift * film_ior[0],
         em.kDoublePi * 2.0 * thickness * cos1[1] + phase_shift * film_ior[1])
  phi = (phi[0] / wavelength, phi[1] / wavelength)
  # e = exp(i*phi) with complex phi: exp(i a - b) = e^{-b} (cos a + i sin a)
  amp = jnp.exp(-phi[1])
  e = (amp * jnp.cos(phi[0]), amp * jnp.sin(phi[0]))

  def lobe(t01, t12, r01x, r12x):
    num = _cmul(t01, t12)
    den = _csub(one, _cmul(_cmul(r01x, r12x), e))
    q = _cdiv(num, den)
    return _cmul(q, q)

  tp = lobe(t01p, t12p, r01p, r12p)
  ts = lobe(t01s, t12s, r01s, r12s)
  inner = _csub(one, _cmul(ratio, _cscale(_cadd(tp, ts), 0.5)))
  f = jnp.sqrt(jnp.maximum(_cabs2(inner), 0.0))
  tir = (sin1_2[0] >= 1.0) | (sin2_2[0] >= 1.0)
  f = jnp.where(tir, 1.0, f)
  return jnp.where(cos_theta_0 == 0.0, 0.0, f)


_RGB_LUM_SCALE = jnp.array([0.817660332, 1.05418909, 1.09945524])  # spectrum.hxx:450


def fresnel(cos_theta, ext_eta, ext_k, int_eta, int_k, spectral: bool,
            int_is_conductor=None, tf_thickness=None, tf_eta=None, tf_k=None,
            tf_wavelengths=None):
  """fresnel::calculate (bsdf.hxx:340-375): per-channel complex Fresnel.

  eta/k inputs are (R, C) responses. Returns (R, C). When a thin film is
  present (tf_thickness > 0 and tf_eta nonzero), interference is used.
  """
  cos_t = jnp.broadcast_to(jnp.abs(cos_theta)[..., None], ext_eta.shape)
  ni = (ext_eta, ext_k)
  nj = (int_eta, int_k)
  f = fresnel_generic(cos_t, ni, nj)
  if not spectral and int_is_conductor is not None:
    # reference converts per-channel conductor values as XYZ->RGB with the
    # luminance-basis scale (bsdf.hxx:363-365)
    conv = sp.xyz_to_rgb(f) * _RGB_LUM_SCALE
    f = jnp.where(int_is_conductor[..., None], conv, f)
  if tf_thickness is not None:
    nf = (tf_eta, tf_k)
    wl = tf_wavelengths  # (R, C)
    use_tf = (tf_thickness > 0.0)[..., None] & (jnp.max(jnp.abs(tf_eta), axis=-1, keepdims=True) > 0.0)
    # masked, NOT lax.cond: each cond instance on TPU costs a ~0.3 ms
    # kernel-launch floor plus operand copies, instantiated at EVERY
    # Fresnel call site (~20 per materials step = ~6 ms/step measured in
    # the r04 xplane trace), while the masked interference stack is ~60
    # fusable VPU flops/lane (<0.1 ms at 262k lanes)
    f = jnp.where(use_tf,
                  fresnel_thinfilm(wl, cos_t, ni, nf, nj,
                                   tf_thickness[..., None]), f)
  return em.saturate(f)
