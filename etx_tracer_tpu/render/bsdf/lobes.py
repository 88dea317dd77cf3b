"""Vectorized BSDF lobes.

Each lobe mirrors its reference namespace (bsdf_various.hxx, bsdf_plastic.hxx,
bsdf_conductor.hxx, bsdf_dielectric.hxx, bsdf_velvet.hxx,
bsdf_principled.hxx) but operates on whole wavefronts in one call.

Conventions:
- `w_i` points TOWARD the surface (reference BSDFData.w_i).
- the "normal frame" is flipped so the incident ray arrives from local +z
  (BSDFData::get_normal_frame, bsdf.hxx:33-36); `entering` records the flip.
- responses are (R, C) arrays, C=1 spectral / C=3 RGB (render/spectral.py).
- rough conductor and dielectric use the Heitz multiple-scattering walks
  (bsdf_external.hxx) for sampling and stochastic evaluation; delta lanes
  take exact closed forms.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from etx_tracer_tpu.core import math as em
from etx_tracer_tpu.core import spectrum as spmod
from etx_tracer_tpu.render import spectral as spx
from etx_tracer_tpu.render.bsdf import common as mf

kDeltaAlpha = em.kDeltaAlphaThreshold


class ShadingData(NamedTuple):
  """Per-ray shading inputs (BSDFData analogue, bsdf.hxx:20-42)."""
  w_i: jnp.ndarray        # (R,3) incident direction, toward surface
  nrm: jnp.ndarray        # (R,3) shading normal (unflipped)
  tan: jnp.ndarray        # (R,3)
  btn: jnp.ndarray        # (R,3)
  geo_n: jnp.ndarray      # (R,3)
  tex: jnp.ndarray        # (R,2)
  wl: jnp.ndarray         # (R,) wavelength (spectral mode)
  medium: jnp.ndarray     # (R,) int32 current medium
  mat: object             # Materials gathered per ray


class BSDFSampleR(NamedTuple):
  w_o: jnp.ndarray        # (R,3)
  weight: jnp.ndarray     # (R,C) bsdf*cos/pdf
  pdf: jnp.ndarray        # (R,)
  eta: jnp.ndarray        # (R,)
  is_delta: jnp.ndarray   # (R,) bool
  is_diffuse: jnp.ndarray  # (R,) bool
  is_reflection: jnp.ndarray  # (R,) bool
  medium: jnp.ndarray     # (R,) int32 medium after the event


def entering(sd: ShadingData):
  return em.dot(sd.nrm, sd.w_i) < 0.0


def normal_frame(sd: ShadingData):
  """Flipped frame rows (tan, btn, nrm); returns (frame(R,3,3), entering(R,))."""
  ent = entering(sd)
  s = jnp.where(ent, 1.0, -1.0)[..., None]
  return em.make_frame(sd.tan * s, sd.btn * s, sd.nrm * s), ent


def _scattering(scene, sd, spectral):
  """apply_image(scattering) — SPD x texture (scene.hxx:291-305)."""
  from etx_tracer_tpu.render import images as images_mod
  v = spx.query_spd(scene, sd.mat.scattering_spec, sd.wl, spectral)
  return images_mod.apply_rgb_image(scene, v, sd.mat.scattering_img, sd.tex, sd.wl, spectral)


def _reflectance(scene, sd, spectral):
  from etx_tracer_tpu.render import images as images_mod
  v = spx.query_spd(scene, sd.mat.reflectance_spec, sd.wl, spectral)
  return images_mod.apply_rgb_image(scene, v, sd.mat.reflectance_img, sd.tex, sd.wl, spectral)


def _ior(scene, sd, eta_idx, k_idx, spectral):
  eta = spx.query_spd(scene, eta_idx, sd.wl, spectral)
  eta = jnp.where((eta_idx >= 0)[..., None], eta, 1.0)
  k = spx.query_spd(scene, k_idx, sd.wl, spectral)
  return eta, k


def _fresnel_at(scene, sd, cos_theta, spectral, swap=None):
  """fresnel::calculate with the material's ext/int IOR pair.

  swap: optional (R,) bool — swap int/ext (exiting a dielectric).
  """
  ext_eta, ext_k = _ior(scene, sd, sd.mat.ext_ior_eta, sd.mat.ext_ior_k, spectral)
  int_eta, int_k = _ior(scene, sd, sd.mat.int_ior_eta, sd.mat.int_ior_k, spectral)
  if swap is not None:
    sw = swap[..., None]
    ext_eta, int_eta = jnp.where(sw, int_eta, ext_eta), jnp.where(sw, ext_eta, int_eta)
    ext_k, int_k = jnp.where(sw, int_k, ext_k), jnp.where(sw, ext_k, int_k)
  is_cond = sd.mat.int_ior_cls == spmod.SpectralDistribution.CLASS_CONDUCTOR
  tf_eta, tf_k = _ior(scene, sd, sd.mat.thinfilm_eta, sd.mat.thinfilm_k, spectral)
  tf_thick = 0.5 * (sd.mat.thinfilm_min + sd.mat.thinfilm_max)
  tf_active = (sd.mat.thinfilm_min * sd.mat.thinfilm_max) > 0.0
  tf_thick = jnp.where(tf_active, tf_thick, 0.0)
  if spectral:
    tf_wl = sd.wl[..., None]
  else:
    # RGB mode: jitter the per-channel wavelengths inside the channel bands
    # (evaluate_thinfilm, scene_bsdf.hxx:118-123; Thinfilm::kRGBWavelengths
    # material.hxx:20-21) to decorrelate interference banding. The draw is
    # derived from ray bits (deterministic per lane, varies per sample).
    from etx_tracer_tpu.core import rng as _rng
    import jax as _jax
    ba = _jax.lax.bitcast_convert_type(sd.w_i[..., 0] + sd.tex[..., 0], jnp.uint32)
    bb = _jax.lax.bitcast_convert_type(sd.w_i[..., 1] + sd.tex[..., 1], jnp.uint32)
    st_tf = _rng.seed(ba, bb)
    st_tf, j3 = _rng.next_n(st_tf, 3)
    base = jnp.array([610.0, 537.0, 450.0])
    span = jnp.array([45.0, 47.0, 23.5])
    tf_wl = base + span * (2.0 * j3 - 1.0)
  return mf.fresnel(cos_theta, ext_eta, ext_k, int_eta, int_k, spectral,
                    int_is_conductor=is_cond, tf_thickness=tf_thick,
                    tf_eta=tf_eta, tf_k=tf_k, tf_wavelengths=tf_wl)


def _eta_ratio(scene, sd, spectral):
  """Monochromatic int/ext eta ratio (dielectric refraction)."""
  ext_eta, _ = _ior(scene, sd, sd.mat.ext_ior_eta, sd.mat.ext_ior_k, spectral)
  int_eta, _ = _ior(scene, sd, sd.mat.int_ior_eta, sd.mat.int_ior_k, spectral)
  return spx.monochromatic(int_eta, spectral) / jnp.maximum(spx.monochromatic(ext_eta, spectral), 1e-6)


def _roughness(sd, scene=None):
  r = jnp.stack([sd.mat.roughness[..., 0], sd.mat.roughness[..., 1]], axis=-1)
  if scene is not None:
    from etx_tracer_tpu.render import images as images_mod
    s = images_mod.scalar_image(scene, sd.mat.roughness_img, sd.tex,
                                jnp.zeros_like(sd.mat.roughness_img), 1.0)
    r = r * s[..., None]
  return r


# ---------------------------------------------------------------------------
# Diffuse (bsdf_various.hxx:34-131)
# ---------------------------------------------------------------------------


def diffuse_sample(scene, sd, rnd, spectral, variations=(0,), mask=None):
  """DiffuseBSDF::sample (bsdf_various.hxx:74-102). `variations` is the
  static set of diffuse_variation values present: 0 Lambert, 1 Heitz
  rough-diffuse MS walk, 2 vMF analytic (d'Eon & Weidlich). `mask` marks
  the lanes whose result the caller consumes (walk start-mask)."""
  frame, ent = normal_frame(sd)
  local_w_o = em.sample_cosine_distribution(rnd[..., 0:2], 1.0)
  albedo = _scattering(scene, sd, spectral)
  weight = albedo
  pdf = em.kInvPi * local_w_o[..., 2]
  if 1 in variations or 2 in variations:
    from etx_tracer_tpu.render.bsdf import multiscatter as ms
    w_i_l = em.to_local(frame, -sd.w_i)
    w_i_l = em.normalize(jnp.concatenate(
        [w_i_l[..., :2], jnp.maximum(w_i_l[..., 2:3], 1e-4)], axis=-1))
    alpha = mf.clamp_alpha(_roughness(sd, scene))
    if 1 in variations:
      m_walk = sd.mat.diffuse_variation == 1
      if mask is not None:
        m_walk = m_walk & mask
      wo1, e1 = ms.diffuse_sample_walk(w_i_l, alpha, albedo, rnd,
                                       active0=m_walk)
      m1 = (sd.mat.diffuse_variation == 1)
      local_w_o = jnp.where(m1[..., None], wo1, local_w_o)
      weight = jnp.where(m1[..., None], e1, weight)
      pdf = jnp.where(m1, em.kInvPi * jnp.maximum(local_w_o[..., 2], 0.0), pdf)
    if 2 in variations:
      f2 = ms.vmf_diffuse_brdf(w_i_l, local_w_o, alpha, albedo)
      m2 = (sd.mat.diffuse_variation == 2)
      # bsdf*cos/pdf = f*cos / (cos/pi) = f*pi
      weight = jnp.where(m2[..., None], f2 * em.kPi, weight)
  w_o = em.from_local(frame, local_w_o)
  r = sd.w_i.shape[0]
  return BSDFSampleR(
      w_o=w_o, weight=weight, pdf=pdf, eta=jnp.ones(r),
      is_delta=jnp.zeros(r, bool), is_diffuse=jnp.ones(r, bool),
      is_reflection=jnp.ones(r, bool), medium=sd.medium)


def diffuse_evaluate(scene, sd, w_o, spectral, variations=(0,), mask=None):
  """DiffuseBSDF::evaluate via diffuse_layer (bsdf_various.hxx:36-72)."""
  frame, _ = normal_frame(sd)
  cos_o = em.to_local(frame, w_o)[..., 2]
  albedo = _scattering(scene, sd, spectral)
  valid = cos_o > em.kEpsilon
  bsdf = albedo * em.kInvPi * jnp.maximum(cos_o, 0.0)[..., None]
  if 1 in variations or 2 in variations:
    from etx_tracer_tpu.render.bsdf import multiscatter as ms
    w_i_l = em.to_local(frame, -sd.w_i)
    w_i_l = em.normalize(jnp.concatenate(
        [w_i_l[..., :2], jnp.maximum(w_i_l[..., 2:3], 1e-4)], axis=-1))
    w_o_l = em.to_local(frame, w_o)
    alpha = mf.clamp_alpha(_roughness(sd, scene))
    if 1 in variations:
      m_walk = sd.mat.diffuse_variation == 1
      if mask is not None:
        m_walk = m_walk & mask
      v1 = ms.diffuse_eval_walk(w_i_l, w_o_l, alpha, albedo,
                                w_o[..., 0] + sd.tex[..., 0],
                                w_o[..., 1] + sd.tex[..., 1],
                                active0=m_walk)
      m1 = (sd.mat.diffuse_variation == 1)
      bsdf = jnp.where(m1[..., None], v1, bsdf)
    if 2 in variations:
      f2 = ms.vmf_diffuse_brdf(w_i_l, w_o_l, alpha, albedo)
      m2 = (sd.mat.diffuse_variation == 2)
      bsdf = jnp.where(m2[..., None], f2 * jnp.maximum(cos_o, 0.0)[..., None], bsdf)
  pdf = em.kInvPi * jnp.maximum(cos_o, 0.0)
  return jnp.where(valid[..., None], bsdf, 0.0), jnp.where(valid, pdf, 0.0)


def diffuse_pdf(scene, sd, w_o, spectral):
  # pdf is cosine-hemisphere for all variations (bsdf_various.hxx:113-121)
  frame, _ = normal_frame(sd)
  cos_o = em.to_local(frame, w_o)[..., 2]
  return jnp.maximum(cos_o, 0.0) * em.kInvPi


# ---------------------------------------------------------------------------
# Translucent (bsdf_various.hxx:133-218)
# ---------------------------------------------------------------------------


def translucent_sample(scene, sd, rnd, spectral):
  frame, ent = normal_frame(sd)
  tr = _scattering(scene, sd, spectral)
  rf = _reflectance(scene, sd, spectral)
  tr_v = spx.monochromatic(tr, spectral)
  rf_v = spx.monochromatic(rf, spectral)
  total = tr_v + rf_v
  p_tr = jnp.where(total > 0, tr_v / jnp.maximum(total, 1e-20), 0.0)
  pick_tr = rnd[..., 2] < p_tr
  local_w_o = em.sample_cosine_distribution(rnd[..., 0:2], 1.0)
  w_up = em.from_local(frame, local_w_o)
  n_dot_o = jnp.abs(local_w_o[..., 2])
  w_o = jnp.where(pick_tr[..., None], -w_up, w_up)
  pdf = n_dot_o * em.kInvPi * jnp.where(pick_tr, p_tr, 1.0 - p_tr)
  weight = jnp.where(pick_tr[..., None], tr, rf)
  medium = jnp.where(pick_tr, jnp.where(ent, sd.mat.int_medium, sd.mat.ext_medium), sd.medium)
  r = sd.w_i.shape[0]
  return BSDFSampleR(
      w_o=w_o, weight=weight, pdf=jnp.where(total > 0, pdf, 0.0),
      eta=jnp.ones(r), is_delta=jnp.zeros(r, bool), is_diffuse=jnp.ones(r, bool),
      is_reflection=~pick_tr, medium=medium)


def translucent_evaluate(scene, sd, w_o, spectral):
  n = sd.nrm
  n_dot_i = -em.dot(n, sd.w_i)
  n_dot_o = em.dot(n, w_o)
  reflection = n_dot_o * n_dot_i > 0.0
  tr = _scattering(scene, sd, spectral)
  rf = _reflectance(scene, sd, spectral)
  tr_v = spx.monochromatic(tr, spectral)
  rf_v = spx.monochromatic(rf, spectral)
  total = tr_v + rf_v
  scale = jnp.where(total > 1.0, 1.0 / jnp.maximum(total, 1e-20), 1.0)
  a_o = jnp.abs(n_dot_o)
  func = jnp.where(reflection[..., None], rf, tr) * (scale * em.kInvPi)[..., None]
  bsdf = func * a_o[..., None]
  sel = jnp.where(reflection, rf_v, tr_v) / jnp.maximum(total, 1e-20)
  pdf = em.kInvPi * a_o * sel
  ok = total > 0
  return jnp.where(ok[..., None], bsdf, 0.0), jnp.where(ok, pdf, 0.0)


def translucent_pdf(scene, sd, w_o, spectral):
  _, pdf = translucent_evaluate(scene, sd, w_o, spectral)
  return pdf


# ---------------------------------------------------------------------------
# Mirror (bsdf_various.hxx:220-263)
# ---------------------------------------------------------------------------


def mirror_sample(scene, sd, rnd, spectral):
  frame, _ = normal_frame(sd)
  n = frame[..., 2, :]
  w_o = em.normalize(em.reflect(sd.w_i, n))
  weight = _scattering(scene, sd, spectral)
  r = sd.w_i.shape[0]
  return BSDFSampleR(
      w_o=w_o, weight=weight, pdf=jnp.ones(r), eta=jnp.ones(r),
      is_delta=jnp.ones(r, bool), is_diffuse=jnp.zeros(r, bool),
      is_reflection=jnp.ones(r, bool), medium=sd.medium)


def _zero_eval(scene, sd, w_o, spectral):
  r = sd.w_i.shape[0]
  c = spx.channels(spectral)
  return jnp.zeros((r, c)), jnp.zeros(r)


# ---------------------------------------------------------------------------
# Boundary (bsdf_various.hxx:265-295): medium interface pass-through
# ---------------------------------------------------------------------------


def boundary_sample(scene, sd, rnd, spectral):
  ent = entering(sd)
  r = sd.w_i.shape[0]
  medium = jnp.where(ent, sd.mat.int_medium, sd.mat.ext_medium)
  return BSDFSampleR(
      w_o=sd.w_i, weight=jnp.ones((r, spx.channels(spectral))),
      pdf=jnp.ones(r), eta=jnp.ones(r),
      is_delta=jnp.ones(r, bool), is_diffuse=jnp.zeros(r, bool),
      is_reflection=jnp.zeros(r, bool), medium=medium)


# ---------------------------------------------------------------------------
# Conductor (bsdf_conductor.hxx) — delta exact; rough = single-scatter VNDF
# ---------------------------------------------------------------------------


# Rough conductor/plastic multiple-scattering backend:
#   "lut"  — energy-compensation tables (render/bsdf/energy_lut.py): zero
#            loops, MXU/VPU-friendly; the TPU production default.
#   "walk" — the reference-faithful stochastic Heitz walk
#            (bsdf_external.hxx:281-466), kept as the semantics anchor;
#            tests bound lut-vs-walk deviation (tests/test_energy_lut.py).
MS_BACKEND = "lut"


def conductor_sample(scene, sd, rnd, spectral, mask=None):
  """MS-conductor sampling (bsdf_conductor.hxx:13-68): energy-compensated
  LUT lobe (or the Heitz walk, see MS_BACKEND) for rough lanes, exact
  delta reflection for smooth ones."""
  from etx_tracer_tpu.render.bsdf import multiscatter as ms

  frame, _ = normal_frame(sd)
  alpha = _roughness(sd, scene)
  delta = jnp.maximum(alpha[..., 0], alpha[..., 1]) <= kDeltaAlpha
  alpha_c = mf.clamp_alpha(alpha)
  w_i_l = em.to_local(frame, -sd.w_i)  # z > 0
  w_i_l = em.normalize(jnp.concatenate(
      [w_i_l[..., :2], jnp.maximum(w_i_l[..., 2:3], 1e-4)], axis=-1))

  def fres(cos_t):
    return _fresnel_at(scene, sd, cos_t, spectral)

  pdf_rough = None
  if MS_BACKEND == "lut":
    from etx_tracer_tpu.render.bsdf import energy_lut
    w_o_ms, energy, pdf_rough = energy_lut.conductor_sample_lut(
        fres, w_i_l, alpha_c, rnd)
  else:
    walk_mask = ~delta if mask is None else mask & ~delta
    w_o_ms, energy = ms.conductor_sample_walk(fres, w_i_l, alpha_c, rnd,
                                              active0=walk_mask)
  refl = _reflectance(scene, sd, spectral)

  # delta path: mirror reflection with normal-incidence-frame Fresnel
  w_o_delta = em.reflect(-w_i_l, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), w_i_l.shape))
  f_delta = fres(w_i_l[..., 2])

  w_o_l = jnp.where(delta[..., None], w_o_delta, w_o_ms)
  weight = refl * jnp.where(delta[..., None], f_delta, energy)
  ok = w_o_l[..., 2] > em.kEpsilon
  weight = jnp.where(ok[..., None], weight, 0.0)

  if pdf_rough is None:
    # reference pdf: D/( (1+Lambda) 4 cos_i ) + cos_o (bsdf_conductor.hxx:63)
    pdf_rough = mf.ms_pdf(w_i_l, w_o_l, alpha_c)
  pdf = jnp.where(delta, 1.0, pdf_rough)
  pdf = jnp.where(ok, pdf, 0.0)

  w_o = em.from_local(frame, w_o_l)
  r = sd.w_i.shape[0]
  return BSDFSampleR(
      w_o=em.normalize(w_o), weight=weight, pdf=pdf, eta=jnp.ones(r),
      is_delta=delta, is_diffuse=jnp.zeros(r, bool),
      is_reflection=jnp.ones(r, bool), medium=sd.medium)


def conductor_evaluate(scene, sd, w_o, spectral, mask=None):
  """MS conductor eval: energy-compensated closed form (lut) or the
  stochastic walk (eval_conductor), per MS_BACKEND; pdf matches the
  active backend's sampling density."""
  from etx_tracer_tpu.render.bsdf import multiscatter as ms

  frame, _ = normal_frame(sd)
  alpha = mf.clamp_alpha(_roughness(sd, scene))
  w_i_l = em.to_local(frame, -sd.w_i)
  w_o_l = em.to_local(frame, w_o)
  ok = (w_i_l[..., 2] > em.kEpsilon) & (w_o_l[..., 2] > em.kEpsilon)

  def fres(cos_t):
    return _fresnel_at(scene, sd, cos_t, spectral)

  if MS_BACKEND == "lut":
    from etx_tracer_tpu.render.bsdf import energy_lut
    value = energy_lut.conductor_eval_lut(fres, w_i_l, w_o_l, alpha)
    pdf = energy_lut.conductor_pdf_lut(w_i_l, w_o_l, alpha)
  else:
    rough_max = jnp.maximum(_roughness(sd, scene)[..., 0], _roughness(sd, scene)[..., 1])
    walk_mask = ok & (rough_max > kDeltaAlpha)
    if mask is not None:
      walk_mask = walk_mask & mask
    value = ms.conductor_eval_walk(fres, w_i_l, w_o_l, alpha,
                                   w_o[..., 0] + sd.tex[..., 0],
                                   w_o[..., 1] + sd.tex[..., 1],
                                   active0=walk_mask)
    pdf = mf.ms_pdf(w_i_l, w_o_l, alpha)
  refl = _reflectance(scene, sd, spectral)
  bsdf = refl * value
  delta = jnp.maximum(_roughness(sd, scene)[..., 0], _roughness(sd, scene)[..., 1]) <= kDeltaAlpha
  ok = ok & ~delta
  return jnp.where(ok[..., None], bsdf, 0.0), jnp.where(ok, pdf, 0.0)


def conductor_pdf(scene, sd, w_o, spectral):
  # analytic pdf matching the active backend's sampling density
  # (reference: bsdf_conductor.hxx:119-136 — no walk instantiation)
  frame, _ = normal_frame(sd)
  alpha = mf.clamp_alpha(_roughness(sd, scene))
  w_i_l = em.to_local(frame, -sd.w_i)
  w_o_l = em.to_local(frame, w_o)
  ok = (w_i_l[..., 2] > em.kEpsilon) & (w_o_l[..., 2] > em.kEpsilon)
  delta = jnp.maximum(_roughness(sd, scene)[..., 0], _roughness(sd, scene)[..., 1]) <= kDeltaAlpha
  if MS_BACKEND == "lut":
    from etx_tracer_tpu.render.bsdf import energy_lut
    pdf = energy_lut.conductor_pdf_lut(w_i_l, w_o_l, alpha)
  else:
    pdf = mf.ms_pdf(w_i_l, w_o_l, alpha)
  return jnp.where(ok & ~delta, pdf, 0.0)


# ---------------------------------------------------------------------------
# Dielectric (bsdf_dielectric.hxx) — delta exact; rough = single-scatter
# ---------------------------------------------------------------------------


def _dielectric_pdf_ref(scene, sd, w_i_l, w_o_l, ent, eta, alpha_c, spectral):
  """DielectricBSDF::pdf (bsdf_dielectric.hxx:148-249) in the flipped frame:
  visible-NDF prob x fresnel selection x |dwh/dwo| + |cos_o|."""
  reflection = w_o_l[..., 2] > 0.0
  m_r = em.normalize(w_i_l + w_o_l)
  m_t = em.normalize(w_i_l + w_o_l * eta[..., None])
  m = jnp.where(reflection[..., None], m_r, m_t)
  m = m * jnp.where(m[..., 2] >= 0.0, 1.0, -1.0)[..., None]
  om = em.dot(w_o_l, m)
  im = em.dot(w_i_l, m)
  dwh_r = 1.0 / jnp.maximum(4.0 * jnp.abs(om), 1e-9)
  sqrt_denom = im + eta * om
  dwh_t = em.sqr(eta) * jnp.abs(om) / jnp.maximum(em.sqr(sqrt_denom), 1e-12)
  dwh = jnp.where(reflection, dwh_r, dwh_t)
  d = mf.ggx_d(m, alpha_c)
  lam_i = mf.smith_lambda(w_i_l, alpha_c)
  prob = jnp.maximum(0.0, im * d / jnp.maximum(
      (1.0 + lam_i) * jnp.maximum(w_i_l[..., 2], 1e-6), 1e-9))
  f = spx.monochromatic(_fresnel_at(scene, sd, im, spectral, swap=~ent), spectral)
  prob = prob * jnp.where(reflection, f, 1.0 - f)
  return jnp.abs(prob * dwh) + jnp.abs(w_o_l[..., 2])


def dielectric_sample(scene, sd, rnd, spectral, mask=None):
  frame, ent = normal_frame(sd)
  alpha = _roughness(sd, scene)
  delta = jnp.maximum(alpha[..., 0], alpha[..., 1]) <= kDeltaAlpha
  alpha_c = mf.clamp_alpha(alpha)
  w_i_l = em.to_local(frame, -sd.w_i)
  w_i_l = jnp.concatenate([w_i_l[..., :2], jnp.maximum(w_i_l[..., 2:3], 1e-4)], axis=-1)

  # eta for this crossing (ratio of far side over near side)
  eta_io = _eta_ratio(scene, sd, spectral)       # int/ext
  eta = jnp.where(ent, eta_io, 1.0 / jnp.maximum(eta_io, 1e-6))

  m = mf.sample_vndf(rnd[..., 0:2], w_i_l, alpha_c)
  m = jnp.where(delta[..., None], jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), m.shape), m)

  cos_im = em.dot(w_i_l, m)
  f = _fresnel_at(scene, sd, cos_im, spectral, swap=~ent)
  f_mono = spx.monochromatic(f, spectral)

  pick_reflect = rnd[..., 2] < f_mono

  w_r = em.reflect(-w_i_l, m)
  # refraction through m with relative eta
  inv_eta = 1.0 / jnp.maximum(eta, 1e-6)
  c = cos_im
  sin2_t = (1.0 - c * c) * em.sqr(inv_eta)
  tir = sin2_t >= 1.0
  cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
  w_t = em.normalize((-w_i_l) * inv_eta[..., None] + (inv_eta * c - cos_t)[..., None] * m)

  pick_reflect = pick_reflect | tir
  w_o_l = jnp.where(pick_reflect[..., None], w_r, w_t)

  refl = _reflectance(scene, sd, spectral)
  scat = _scattering(scene, sd, spectral)

  g1 = mf.ggx_g1(w_i_l, m, alpha_c)
  g2_r = g1 * mf.ggx_g1(w_r, m, alpha_c)
  g2_t = g1 * mf.ggx_g1(jnp.concatenate([w_t[..., :2], -w_t[..., 2:3]], axis=-1), m, alpha_c)

  # radiance transport factor for refraction (camera paths): 1/eta^2
  factor = em.sqr(inv_eta)
  p_sel = jnp.where(pick_reflect, jnp.where(tir, 1.0, f_mono), 1.0 - f_mono)

  w_refl = refl * (f / jnp.maximum(f_mono, 1e-9)[..., None]) * jnp.where(delta, 1.0, g2_r / jnp.maximum(g1, 1e-9))[..., None]
  w_tran = scat * ((1.0 - f) / jnp.maximum(1.0 - f_mono, 1e-9)[..., None]) * factor[..., None] * jnp.where(delta, 1.0, g2_t / jnp.maximum(g1, 1e-9))[..., None]
  w_refl_tir = refl * jnp.where(delta, 1.0, g2_r / jnp.maximum(g1, 1e-9))[..., None]
  weight = jnp.where(pick_reflect[..., None], jnp.where(tir[..., None], w_refl_tir, w_refl), w_tran)

  ok_r = w_o_l[..., 2] > 0.0
  ok_t = w_o_l[..., 2] < 0.0
  ok = jnp.where(pick_reflect, ok_r, ok_t)
  weight = jnp.where(ok[..., None], weight, 0.0)

  if MS_BACKEND == "lut":
    # rough lanes keep the single-scatter VNDF reflect/refract sample above
    # (its weight g2/g1 IS f_ss/p_true) and gain the lost multiple-scatter
    # energy through the same 1/E(mu_i) compensation the eval applies —
    # sample weight and NEE eval stay the SAME scaled BSDF. No walk, no
    # while_loop on the hot path.
    from etx_tracer_tpu.render.bsdf import energy_lut
    a_iso = jnp.sqrt(alpha_c[..., 0] * alpha_c[..., 1])
    comp = energy_lut.dielectric_compensation(w_i_l[..., 2], a_iso, eta)
    weight = jnp.where(delta[..., None], weight, weight * comp[..., None])
  else:
    # rough lanes: the Heitz MS walk replaces the single-scatter sample
    # (DielectricBSDF::sample, bsdf_dielectric.hxx:73-147)
    from etx_tracer_tpu.render.bsdf import multiscatter as ms

    def fres_walk(cos_t, outside):
      return _fresnel_at(scene, sd, cos_t, spectral,
                         swap=jnp.logical_xor(ent, outside))

    def mono(v):
      return spx.monochromatic(v, spectral)

    walk_mask = ~delta if mask is None else mask & ~delta
    wo_walk, e_walk, out_walk, escaped = ms.dielectric_sample_walk(
        fres_walk, mono, eta, w_i_l, alpha_c, rnd, active0=walk_mask)
    refl_walk = out_walk
    e_mono = mono(e_walk)
    tint = e_walk / jnp.maximum(e_mono, 1e-9)[..., None]
    factor_w = em.sqr(1.0 / jnp.maximum(eta, 1e-6))
    w_walk = tint * jnp.where(refl_walk[..., None], refl, scat * factor_w[..., None])
    w_walk = jnp.where((escaped & (e_mono > 0.0))[..., None], w_walk, 0.0)

    use_walk = ~delta
    pick_reflect = jnp.where(use_walk, refl_walk, pick_reflect)
    w_o_l = jnp.where(use_walk[..., None], wo_walk, w_o_l)
    weight = jnp.where(use_walk[..., None], w_walk, weight)
    ok = jnp.where(use_walk,
                   escaped & (jnp.abs(wo_walk[..., 2]) > em.kEpsilon), ok)
    weight = jnp.where(ok[..., None], weight, 0.0)

  pdf_rough = _dielectric_pdf_ref(scene, sd, w_i_l, w_o_l, ent, eta, alpha_c, spectral)
  pdf = jnp.where(delta, p_sel, pdf_rough)
  pdf = jnp.where(ok, pdf, 0.0)

  w_o = em.normalize(em.from_local(frame, w_o_l))
  medium = jnp.where(pick_reflect, sd.medium,
                     jnp.where(ent, sd.mat.int_medium, sd.mat.ext_medium))
  out_eta = jnp.where(pick_reflect, 1.0, eta)
  r = sd.w_i.shape[0]
  return BSDFSampleR(
      w_o=w_o, weight=weight, pdf=pdf, eta=out_eta,
      is_delta=delta, is_diffuse=jnp.zeros(r, bool),
      is_reflection=pick_reflect, medium=medium)


def dielectric_evaluate(scene, sd, w_o, spectral, mask=None):
  """Rough dielectric eval (Walter 2007 conventions); delta -> zero."""
  frame, ent = normal_frame(sd)
  alpha = _roughness(sd, scene)
  delta = jnp.maximum(alpha[..., 0], alpha[..., 1]) <= kDeltaAlpha
  alpha_c = mf.clamp_alpha(alpha)
  w_i_l = em.to_local(frame, -sd.w_i)
  w_o_l = em.to_local(frame, w_o)
  cos_i = w_i_l[..., 2]
  cos_o = w_o_l[..., 2]
  reflection = cos_o > 0.0

  eta_io = _eta_ratio(scene, sd, spectral)
  eta = jnp.where(ent, eta_io, 1.0 / jnp.maximum(eta_io, 1e-6))

  # half vectors
  m_r = em.normalize(w_i_l + w_o_l)
  m_t = em.normalize(w_i_l + w_o_l * eta[..., None])
  m = jnp.where(reflection[..., None], m_r, m_t)
  m = m * jnp.where(m[..., 2] >= 0.0, 1.0, -1.0)[..., None]

  cos_im = em.dot(w_i_l, m)
  f = _fresnel_at(scene, sd, cos_im, spectral, swap=~ent)
  f_mono = spx.monochromatic(f, spectral)
  d = mf.ggx_d(m, alpha_c)
  g = mf.ggx_g1(w_i_l, m, alpha_c) * mf.ggx_g1(
      jnp.where(reflection[..., None], w_o_l, jnp.concatenate([w_o_l[..., :2], -w_o_l[..., 2:3]], axis=-1)), m, alpha_c)

  refl_alb = _reflectance(scene, sd, spectral)
  scat_alb = _scattering(scene, sd, spectral)

  if MS_BACKEND == "lut":
    # Walk-free energy-compensated eval: analytic Walter single-scatter
    # terms (Walter 2007 eq. 20/21, the deterministic limit of
    # eval_dielectric's first order, bsdf_dielectric.hxx:149-196) scaled by
    # the Turquin-style multiplicative compensation 1/E_d(eta, alpha, mu_i)
    # from the dedicated dielectric albedo table (energy_lut).
    # Deterministic, loop-free, and lower-variance than the stochastic
    # walk; reciprocity of the compensation factor is approximate
    # (documented deviation, bounded by tests/test_energy_lut.py against
    # the walk).
    from etx_tracer_tpu.render.bsdf import energy_lut
    im = cos_im
    om = em.dot(w_o_l, m)
    sqrt_denom = im + eta * om
    # reflection: func = F D G2 / (4 cos_i |cos_o|)
    f_refl = f * (d * g / jnp.maximum(
        4.0 * cos_i * jnp.abs(cos_o), 1e-9))[..., None]
    # transmission: func = |im om| eta^2 (1-F) D G2
    #               / (cos_i |cos_o| (im + eta om)^2), times the 1/eta^2
    # radiance transport factor (camera convention, matching the sampler's
    # `factor`) — the eta^2 pair cancels.
    f_tran = (1.0 - f) * (jnp.abs(im * om) * d * g / jnp.maximum(
        cos_i * jnp.abs(cos_o) * em.sqr(sqrt_denom), 1e-9))[..., None]
    func = jnp.where(reflection[..., None],
                     refl_alb * f_refl, scat_alb * f_tran)
    a_iso = jnp.sqrt(alpha_c[..., 0] * alpha_c[..., 1])
    comp = energy_lut.dielectric_compensation(
        jnp.maximum(cos_i, 1e-6), a_iso, eta)
    bsdf = func * (comp * jnp.abs(cos_o))[..., None]
  else:
    # stochastic MS eval (eval_dielectric via the walk;
    # DielectricBSDF::evaluate bsdf_dielectric.hxx:149-196:
    # bsdf-with-cos = 2*walk * image * |cos_o|)
    from etx_tracer_tpu.render.bsdf import multiscatter as ms

    def fres_walk(cos_t, outside):
      return _fresnel_at(scene, sd, cos_t, spectral,
                         swap=jnp.logical_xor(ent, outside))

    def mono(v):
      return spx.monochromatic(v, spectral)

    wo_outside = reflection
    walk_mask = (cos_i > em.kEpsilon) & ~delta
    if mask is not None:
      walk_mask = walk_mask & mask
    value = ms.dielectric_eval_walk(
        fres_walk, mono, eta, w_i_l, w_o_l, wo_outside, alpha_c,
        w_o[..., 0] + sd.tex[..., 0], w_o[..., 1] + sd.tex[..., 1],
        active0=walk_mask)
    func = 2.0 * value * jnp.where(reflection[..., None], refl_alb, scat_alb)
    bsdf = func * jnp.abs(cos_o)[..., None]  # eval.bsdf = func*|cos| (:193)

  pdf = _dielectric_pdf_ref(scene, sd, w_i_l, w_o_l, ent, eta, alpha_c, spectral)

  ok = (cos_i > em.kEpsilon) & (jnp.abs(cos_o) > em.kEpsilon) & ~delta
  return jnp.where(ok[..., None], bsdf, 0.0), jnp.where(ok, pdf, 0.0)


def dielectric_pdf(scene, sd, w_o, spectral):
  # analytic pdf (DielectricBSDF::pdf) — no walk instantiation
  frame, ent = normal_frame(sd)
  alpha = _roughness(sd, scene)
  delta = jnp.maximum(alpha[..., 0], alpha[..., 1]) <= kDeltaAlpha
  alpha_c = mf.clamp_alpha(alpha)
  w_i_l = em.to_local(frame, -sd.w_i)
  w_o_l = em.to_local(frame, w_o)
  eta_io = _eta_ratio(scene, sd, spectral)
  eta = jnp.where(ent, eta_io, 1.0 / jnp.maximum(eta_io, 1e-6))
  pdf = _dielectric_pdf_ref(scene, sd, w_i_l, w_o_l, ent, eta, alpha_c, spectral)
  ok = (w_i_l[..., 2] > em.kEpsilon) & (jnp.abs(w_o_l[..., 2]) > em.kEpsilon) & ~delta
  return jnp.where(ok, pdf, 0.0)


# ---------------------------------------------------------------------------
# Thinfilm slab (bsdf_dielectric.hxx:3-59): delta reflect-or-pass
# ---------------------------------------------------------------------------


def thinfilm_sample(scene, sd, rnd, spectral):
  frame, ent = normal_frame(sd)
  n = frame[..., 2, :]
  cos_i = em.dot(sd.w_i, sd.nrm)
  f = _fresnel_at(scene, sd, cos_i, spectral)
  f_mono = spx.monochromatic(f, spectral)
  pick_refl = rnd[..., 2] <= f_mono
  w_r = em.normalize(em.reflect(sd.w_i, n))
  w_o = jnp.where(pick_refl[..., None], w_r, sd.w_i)
  refl = _reflectance(scene, sd, spectral)
  scat = _scattering(scene, sd, spectral)
  w_reflect = refl * f / jnp.maximum(f_mono, 1e-9)[..., None]
  w_trans = scat * (1.0 - f) / jnp.maximum(1.0 - f_mono, 1e-9)[..., None]
  weight = jnp.where(pick_refl[..., None], w_reflect, w_trans)
  pdf = jnp.where(pick_refl, f_mono, 1.0 - f_mono)
  medium = jnp.where(pick_refl, sd.medium, jnp.where(ent, sd.mat.int_medium, sd.mat.ext_medium))
  r = sd.w_i.shape[0]
  return BSDFSampleR(
      w_o=w_o, weight=weight, pdf=pdf, eta=jnp.ones(r),
      is_delta=jnp.ones(r, bool), is_diffuse=jnp.zeros(r, bool),
      is_reflection=pick_refl, medium=medium)


# ---------------------------------------------------------------------------
# Plastic (bsdf_plastic.hxx): Fresnel-weighted specular over diffuse
# ---------------------------------------------------------------------------


def plastic_evaluate(scene, sd, w_o, spectral, mask=None):
  frame, ent = normal_frame(sd)
  w_i_l = em.to_local(frame, -sd.w_i)
  w_o_l = em.to_local(frame, w_o)
  cos_i = w_i_l[..., 2]
  cos_o = w_o_l[..., 2]
  ok = (cos_i > em.kEpsilon) & (cos_o > em.kEpsilon)

  alpha = mf.clamp_alpha(_roughness(sd, scene))
  m = em.normalize(w_i_l + w_o_l)
  f = _fresnel_at(scene, sd, em.dot(w_i_l, m), spectral)
  f_mono = spx.monochromatic(f, spectral)

  diffuse = _scattering(scene, sd, spectral)
  specular = _reflectance(scene, sd, spectral)

  if MS_BACKEND == "lut":
    # specular layer via the energy-compensated reflection lobe
    # (energy_lut.conductor_eval_lut with the material's DIELECTRIC Fresnel
    # closure): same single-scatter term as the walk's first order plus the
    # reciprocal Kulla-Conty compensation lobe whose F_ms geometric series
    # runs on the dielectric F_avg. Walk-free hot path; the walk remains
    # the anchor under MS_BACKEND="walk".
    from etx_tracer_tpu.render.bsdf import energy_lut

    def fres_refl(cos_t):
      return _fresnel_at(scene, sd, cos_t, spectral)

    spec_bsdf = energy_lut.conductor_eval_lut(
        fres_refl, w_i_l, w_o_l, alpha) * specular
  else:
    # specular layer = Heitz MS dielectric walk restricted to the
    # reflection side: specular_func = 2*eval_dielectric(...)*reflectance
    # (bsdf_plastic.hxx:14-36); the walk value carries the output cosine
    from etx_tracer_tpu.render.bsdf import multiscatter as ms

    def fres_walk(cos_t, outside):
      return _fresnel_at(scene, sd, cos_t, spectral,
                         swap=jnp.logical_xor(ent, outside))

    def mono(v):
      return spx.monochromatic(v, spectral)

    eta_io = _eta_ratio(scene, sd, spectral)
    eta = jnp.where(ent, eta_io, 1.0 / jnp.maximum(eta_io, 1e-6))
    walk_mask = ok if mask is None else ok & mask
    walk = ms.dielectric_eval_walk(
        fres_walk, mono, eta, w_i_l, w_o_l, jnp.ones_like(ok),
        alpha, w_o[..., 0] + sd.tex[..., 0], w_o[..., 1] + sd.tex[..., 1],
        active0=walk_mask)
    spec_bsdf = 2.0 * walk * specular
  diff_bsdf = diffuse * (1.0 - f) * (em.kInvPi * jnp.maximum(cos_o, 0.0))[..., None]
  bsdf = diff_bsdf + spec_bsdf

  spec_pdf = mf.vndf_pdf(w_i_l, m, alpha) / jnp.maximum(4.0 * jnp.abs(em.dot(w_o_l, m)), 1e-9)
  pdf = em.kInvPi * jnp.maximum(cos_o, 0.0) * (1.0 - f_mono) + f_mono * spec_pdf
  return jnp.where(ok[..., None], bsdf, 0.0), jnp.where(ok, pdf, 0.0)


def plastic_sample(scene, sd, rnd, spectral, mask=None):
  frame, _ = normal_frame(sd)
  alpha = mf.clamp_alpha(_roughness(sd, scene))
  w_i_l = em.to_local(frame, -sd.w_i)
  w_i_l = jnp.concatenate([w_i_l[..., :2], jnp.maximum(w_i_l[..., 2:3], 1e-4)], axis=-1)
  m = mf.sample_vndf(rnd[..., 0:2], w_i_l, alpha)
  f = _fresnel_at(scene, sd, em.dot(w_i_l, m), spectral)
  f_mono = spx.monochromatic(f, spectral)

  pick_spec = rnd[..., 2] <= f_mono
  w_spec_l = em.reflect(-w_i_l, m)
  pick_spec = pick_spec & (w_spec_l[..., 2] > em.kEpsilon)
  w_diff_l = em.sample_cosine_distribution(rnd[..., 3:5], 1.0)
  w_o_l = jnp.where(pick_spec[..., None], w_spec_l, w_diff_l)
  w_o = em.from_local(frame, w_o_l)

  bsdf, pdf = plastic_evaluate(scene, sd, w_o, spectral, mask=mask)
  weight = jnp.where(pdf[..., None] > 0, bsdf / jnp.maximum(pdf, 1e-20)[..., None], 0.0)
  r = sd.w_i.shape[0]
  return BSDFSampleR(
      w_o=w_o, weight=weight, pdf=pdf, eta=jnp.ones(r),
      is_delta=jnp.zeros(r, bool), is_diffuse=~pick_spec,
      is_reflection=jnp.ones(r, bool), medium=sd.medium)


def plastic_pdf(scene, sd, w_o, spectral):
  """PlasticBSDF::pdf (bsdf_plastic.hxx:155-177) — walk-free analytic."""
  frame, _ = normal_frame(sd)
  w_i_l = em.to_local(frame, -sd.w_i)
  w_o_l = em.to_local(frame, w_o)
  cos_i = w_i_l[..., 2]
  cos_o = w_o_l[..., 2]
  ok = (cos_i > em.kEpsilon) & (cos_o > em.kEpsilon)
  alpha = mf.clamp_alpha(_roughness(sd, scene))
  m = em.normalize(w_i_l + w_o_l)
  f_mono = spx.monochromatic(
      _fresnel_at(scene, sd, em.dot(w_i_l, m), spectral), spectral)
  spec_pdf = mf.vndf_pdf(w_i_l, m, alpha) / jnp.maximum(4.0 * jnp.abs(em.dot(w_o_l, m)), 1e-9)
  pdf = em.kInvPi * jnp.maximum(cos_o, 0.0) * (1.0 - f_mono) + f_mono * spec_pdf
  return jnp.where(ok, pdf, 0.0)


# ---------------------------------------------------------------------------
# Velvet (bsdf_velvet.hxx): sheen with the analytic L-curve masking
# ---------------------------------------------------------------------------


def _lambda_velvet_l(r, x):
  x = jnp.maximum(x, 0.0)

  def lerp_x(a, b, t):
    return em.sqr(1.0 - t) * a + (1.0 - em.sqr(1.0 - t)) * b

  a = lerp_x(25.3245, 21.5473, r)
  b = lerp_x(3.32435, 3.82987, r)
  c = lerp_x(0.16801, 0.19823, r)
  d = lerp_x(-1.27393, -1.97760, r)
  e = lerp_x(-4.85967, -4.32054, r)
  return a / (1.0 + b * jnp.power(jnp.maximum(x, 1e-9), c)) + d * x + e


def _lambda_velvet(r, cos_t):
  return jnp.where(
      cos_t < 0.5,
      jnp.exp(_lambda_velvet_l(r, cos_t)),
      jnp.exp(2.0 * _lambda_velvet_l(r, 0.5) - _lambda_velvet_l(r, 1.0 - cos_t)))


def velvet_evaluate(scene, sd, w_o, spectral):
  frame, _ = normal_frame(sd)
  n = frame[..., 2, :]
  n_dot_o = jnp.maximum(0.0, em.dot(w_o, n))
  n_dot_i = jnp.maximum(0.0, -em.dot(sd.w_i, n))
  m = em.normalize(w_o - sd.w_i)
  m_dot_o = jnp.maximum(0.0, em.dot(w_o, m))
  m_dot_i = jnp.maximum(0.0, -em.dot(sd.w_i, m))
  ok = (n_dot_o > em.kEpsilon) & (n_dot_i > em.kEpsilon) & (m_dot_o > em.kEpsilon) & (m_dot_i > em.kEpsilon)

  rough = _roughness(sd, scene)
  alpha = 0.5 * (rough[..., 0] + rough[..., 1])
  inv_alpha = 1.0 / (em.kEpsilon + alpha)
  m_dot_n = em.dot(m, n)
  sin_t = jnp.maximum(1.0 - m_dot_n * m_dot_n, 0.0)
  d = (2.0 + inv_alpha) * jnp.power(jnp.maximum(sin_t, 1e-12), 0.5 * inv_alpha) / em.kDoublePi
  l_i = _lambda_velvet(alpha, n_dot_i)
  l_o = _lambda_velvet(alpha, n_dot_o)
  g = 1.0 / (1.0 + l_i + l_o)
  spec_scale = jnp.where(alpha > em.kEpsilon, 0.25 * d * g / jnp.maximum(n_dot_i, 1e-9), 0.0)

  diffuse = _scattering(scene, sd, spectral)
  specular = _reflectance(scene, sd, spectral)

  f90 = 0.5 + 2.0 * alpha * m_dot_o * m_dot_o

  def fres_approx(f0, f90v, cos_t):
    return f0 + (f90v - f0) * jnp.power(jnp.maximum(1.0 - cos_t, 0.0), 5.0)

  diff_scale = fres_approx(1.0, f90, n_dot_o) * fres_approx(1.0, f90, n_dot_i) * em.kInvPi

  bsdf = diffuse * (diff_scale * n_dot_o)[..., None] + specular * spec_scale[..., None]
  pdf = jnp.full(n_dot_o.shape, 1.0 / em.kDoublePi)
  return jnp.where(ok[..., None], bsdf, 0.0), jnp.where(ok, pdf, 0.0)


def velvet_sample(scene, sd, rnd, spectral):
  frame, _ = normal_frame(sd)
  n = frame[..., 2, :]
  # uniform hemisphere (cosine distribution with exponent 0)
  w_o = em.sample_cosine_distribution_n(rnd[..., 0:2], n, 0.0)
  bsdf, pdf = velvet_evaluate(scene, sd, w_o, spectral)
  weight = jnp.where(pdf[..., None] > 0, bsdf / jnp.maximum(pdf, 1e-20)[..., None], 0.0)
  r = sd.w_i.shape[0]
  return BSDFSampleR(
      w_o=w_o, weight=weight, pdf=pdf, eta=jnp.ones(r),
      is_delta=jnp.zeros(r, bool), is_diffuse=jnp.ones(r, bool),
      is_reflection=jnp.ones(r, bool), medium=sd.medium)


def velvet_pdf(scene, sd, w_o, spectral):
  _, pdf = velvet_evaluate(scene, sd, w_o, spectral)
  return pdf
