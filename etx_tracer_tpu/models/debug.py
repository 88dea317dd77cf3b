"""Debug integrator: single-bounce AOV visualizations.

Counterpart of CPUDebugIntegrator (rt/integrators/debug.cxx:28-46) — the
geometry/shading oracle used to validate loaders and shading frames.
One camera trace per pixel, no light transport.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from etx_tracer_tpu.core import math as em
from etx_tracer_tpu.core import rng
from etx_tracer_tpu.models import path_tracing as pt
from etx_tracer_tpu.ops import trace as trace_ops
from etx_tracer_tpu.render import bsdf as bsdf_mod
from etx_tracer_tpu.render import spectral as spx
from etx_tracer_tpu.render.bsdf import dispatch as bsdf_dispatch
from etx_tracer_tpu.render.bsdf.lobes import ShadingData


class DebugMode:
  Barycentrics = 0
  Normals = 1
  Tangents = 2
  Bitangents = 3
  TexCoords = 4
  GeometricNormals = 5
  FaceOrientation = 6
  Depth = 7
  MaterialIndex = 8
  Albedo = 9
  Fresnel = 10
  EmitterIndex = 11
  TransmittanceColor = 12
  ReflectanceColor = 13
  IOR = 14
  Random = 15
  Spectrums = 16
  ThinfilmCurve = 17
  Count = 18


def _render_spectrums(config):
  """Spectral-pipeline validation plot (debug.cxx Mode::Spectrums): 9
  horizontal bands of canonical SPDs (blackbody series, D65, constant,
  RGB-upsampled reflectance/luminance), each normalized to unit luminance;
  LEFT half = one-wavelength spectral estimate per pixel (sech^2 sampler,
  /pdf, CIE->RGB), RIGHT half = the RGB integration path. The two halves
  must agree visually — a live end-to-end check of the spectral stack."""
  import numpy as np

  from etx_tracer_tpu.core import rng as rng_mod
  from etx_tracer_tpu.core import spectrum as sp
  from etx_tracer_tpu.scene import spectral_data

  w, h = config.film_width, config.film_height
  spds = [
      sp.SpectralDistribution.from_normalized_black_body(2700.0),
      sp.SpectralDistribution.from_normalized_black_body(4000.0),
      sp.SpectralDistribution.from_normalized_black_body(6500.0),
      sp.SpectralDistribution.from_normalized_black_body(12000.0),
      sp.SpectralDistribution.from_normalized_black_body(20000.0),
      spectral_data.d65(),
      sp.SpectralDistribution.constant(0.5),
      sp.SpectralDistribution.rgb_reflectance((0.5, 0.5, 0.5)),
      sp.SpectralDistribution.rgb_luminance((0.5, 0.5, 0.5)),
  ]
  bank, rgbs = [], []
  for s in spds:
    lum = max(s.luminance(), 1e-9)
    vals = np.asarray(s.values, np.float32) / lum
    bank.append(vals)
    rgbs.append(sp.SpectralDistribution(vals, s.cls).integrated_rgb())
  bank = jnp.asarray(np.stack(bank))        # (9, S)
  rgbs = jnp.asarray(np.stack(rgbs), jnp.float32)  # (9, 3)

  pix = jnp.arange(w * h, dtype=jnp.int32)
  x = pix % w
  y = pix // w
  band = jnp.clip((9 * (h - 1 - y)) // h, 0, 8)
  # 8 stratified wavelength samples per pixel: the reference accumulates
  # this plot progressively; a one-shot AOV needs a readable estimate
  st = rng_mod.seed(pix.astype(jnp.uint32),
                    jnp.zeros_like(pix).astype(jnp.uint32))
  spectral_rgb = jnp.zeros((w * h, 3))
  n_s = 8
  for i in range(n_s):
    st, rnd = rng_mod.next_float(st)
    wl = sp.sample_wavelength((i + rnd) / n_s)
    spec_v = sp.query_bank(bank, band, wl)[..., 0]
    spectral_rgb = spectral_rgb + sp.xyz_to_rgb(sp.spectral_to_xyz(
        spec_v / sp.sampling_pdf(wl), wl))
  spectral_rgb = spectral_rgb / n_s
  rgb_v = rgbs[band]
  img = jnp.where((x < w // 2)[..., None], spectral_rgb, rgb_v)
  return img.reshape(h, w, 3)


def _render_thinfilm_curve(config):
  """Thin-film interference response plot (debug.cxx Mode::Thinfilm):
  x -> cos(theta) from 1 (left) to 0 (right), y -> film thickness 0..2500nm;
  per-pixel spectral sample through the production fresnel_thinfilm
  (air outside, film eta 1.4, glass base eta 1.5), CIE->RGB."""
  from etx_tracer_tpu.core import rng as rng_mod
  from etx_tracer_tpu.core import spectrum as sp
  from etx_tracer_tpu.render.bsdf import common as bsdf_common

  w, h = config.film_width, config.film_height
  pix = jnp.arange(w * h, dtype=jnp.int32)
  x = pix % w
  y = pix // w
  cos_theta = 1.0 - (x.astype(jnp.float32) + 0.5) / w
  thickness = (y.astype(jnp.float32) + 0.5) / h * 2500.0
  st = rng_mod.seed(pix.astype(jnp.uint32),
                    jnp.zeros_like(pix).astype(jnp.uint32))

  def ior(eta):
    return (jnp.full_like(cos_theta, eta), jnp.zeros_like(cos_theta))

  rgb = jnp.zeros((w * h, 3))
  n_s = 8
  for i in range(n_s):
    st, rnd = rng_mod.next_float(st)
    wl = sp.sample_wavelength((i + rnd) / n_s)
    f = bsdf_common.fresnel_thinfilm(wl, cos_theta, ior(1.0), ior(1.4),
                                     ior(1.5), thickness)
    rgb = rgb + sp.xyz_to_rgb(sp.spectral_to_xyz(f / sp.sampling_pdf(wl), wl))
  return (rgb / n_s).reshape(h, w, 3)


@functools.partial(jax.jit, static_argnames=("config", "mode"))
def render_debug(scene, config, mode: int = DebugMode.Normals):
  """Render one AOV image (H, W, 3)."""
  w, h = config.film_width, config.film_height
  if mode == DebugMode.Spectrums:
    return _render_spectrums(config)
  if mode == DebugMode.ThinfilmCurve:
    return _render_thinfilm_curve(config)
  state = pt.make_lane_payload(scene, config,
                               jnp.arange(w * h, dtype=jnp.int32), w * h)
  hit = trace_ops.trace_closest(scene, state.ray_o, state.ray_d, state.t_min, state.t_max)
  found = hit.found
  pos, nrm, tan, btn, uv, bc, tri, trows = pt._interpolate_hit(scene, hit, state.ray_d)
  mat = pt._gather_mat(scene, trows.mat)

  if mode == DebugMode.Barycentrics:
    img = bc
  elif mode == DebugMode.Normals:
    img = nrm * 0.5 + 0.5
  elif mode == DebugMode.Tangents:
    img = tan * 0.5 + 0.5
  elif mode == DebugMode.Bitangents:
    img = btn * 0.5 + 0.5
  elif mode == DebugMode.TexCoords:
    img = jnp.concatenate([uv, jnp.zeros_like(uv[..., :1])], axis=-1)
  elif mode == DebugMode.GeometricNormals:
    img = trows.geo_n * 0.5 + 0.5
  elif mode == DebugMode.FaceOrientation:
    front = em.dot(trows.geo_n, state.ray_d) < 0.0
    base = 0.5 + 0.5 * jnp.abs(em.dot(trows.geo_n, state.ray_d))
    img = jnp.where(front[..., None],
                    jnp.stack([base * 0.2, base, base * 0.2], axis=-1),
                    jnp.stack([base, base * 0.2, base * 0.2], axis=-1))
  elif mode == DebugMode.Depth:
    d = jnp.where(found, hit.t, 0.0)
    img = jnp.stack([d, d, d], axis=-1) / jnp.maximum(2.0 * scene.bsphere_radius, 1e-6)
  elif mode == DebugMode.MaterialIndex:
    mi = trows.mat.astype(jnp.float32)
    img = jnp.stack([jnp.sin(mi * 2.1) * 0.5 + 0.5,
                     jnp.sin(mi * 3.7 + 1.0) * 0.5 + 0.5,
                     jnp.sin(mi * 5.3 + 2.0) * 0.5 + 0.5], axis=-1)
  elif mode == DebugMode.Albedo:
    sd = ShadingData(w_i=state.ray_d, nrm=nrm, tan=tan, btn=btn,
                     geo_n=trows.geo_n, tex=uv, wl=state.wl,
                     medium=state.medium, mat=mat)
    alb = bsdf_dispatch.albedo(scene, sd, config.spectral)
    img = spx.to_film_rgb(alb, state.wl, config.spectral)
  elif mode == DebugMode.Fresnel:
    from etx_tracer_tpu.render.bsdf.lobes import _fresnel_at
    sd = ShadingData(w_i=state.ray_d, nrm=nrm, tan=tan, btn=btn,
                     geo_n=trows.geo_n, tex=uv, wl=state.wl,
                     medium=state.medium, mat=mat)
    f = _fresnel_at(scene, sd, em.dot(state.ray_d, nrm), config.spectral)
    img = spx.to_film_rgb(f, state.wl, config.spectral)
  elif mode == DebugMode.EmitterIndex:
    e = (trows.emitter >= 0).astype(jnp.float32)
    img = jnp.stack([e, e, jnp.zeros_like(e)], axis=-1)
  elif mode == DebugMode.TransmittanceColor:
    # apply_image(scattering) (debug.cxx Mode::TransmittanceColor)
    from etx_tracer_tpu.render.bsdf.lobes import _scattering
    sd = ShadingData(w_i=state.ray_d, nrm=nrm, tan=tan, btn=btn,
                     geo_n=trows.geo_n, tex=uv, wl=state.wl,
                     medium=state.medium, mat=mat)
    img = spx.to_film_rgb(_scattering(scene, sd, config.spectral), state.wl,
                          config.spectral)
  elif mode == DebugMode.ReflectanceColor:
    from etx_tracer_tpu.render.bsdf.lobes import _reflectance
    sd = ShadingData(w_i=state.ray_d, nrm=nrm, tan=tan, btn=btn,
                     geo_n=trows.geo_n, tex=uv, wl=state.wl,
                     medium=state.medium, mat=mat)
    img = spx.to_film_rgb(_reflectance(scene, sd, config.spectral), state.wl,
                          config.spectral)
  elif mode == DebugMode.IOR:
    # eta at the hit, grayscale mapped over [1, 3] (debug.cxx Mode::IOR idea)
    from etx_tracer_tpu.render.bsdf.lobes import _eta_ratio
    sd = ShadingData(w_i=state.ray_d, nrm=nrm, tan=tan, btn=btn,
                     geo_n=trows.geo_n, tex=uv, wl=state.wl,
                     medium=state.medium, mat=mat)
    eta = _eta_ratio(scene, sd, config.spectral)
    g = jnp.clip((eta - 1.0) / 2.0, 0.0, 1.0)
    img = jnp.stack([g, g, g], axis=-1)
  elif mode == DebugMode.Random:
    # RNG stream visualization (debug.cxx Mode::Random)
    st2, r0 = rng.next_float(state.rng_state)
    st2, r1 = rng.next_float(st2)
    st2, r2 = rng.next_float(st2)
    img = jnp.stack([r0, r1, r2], axis=-1)
    img = jnp.where(jnp.ones_like(found)[..., None], img, img)  # shown everywhere
    return img.reshape(h, w, 3)
  else:
    img = jnp.zeros((w * h, 3))

  img = jnp.where(found[..., None], img, 0.0)
  return img.reshape(h, w, 3)
