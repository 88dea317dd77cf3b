"""Per-ray spectral response helpers.

The reference's SpectralResponse keeps a single-wavelength value and an RGB
triple in one struct and branches per call (spectrum.hxx:242-434). Here the
mode is static per render: responses are (..., C) arrays with C=1 (spectral,
wavelength carried per ray) or C=3 (RGB), so XLA compiles exactly one path
with no per-lane branching.
"""

from __future__ import annotations

import jax.numpy as jnp

from etx_tracer_tpu.core import math as em
from etx_tracer_tpu.core import spectrum as sp


def channels(spectral: bool) -> int:
  return 1 if spectral else 3


def const(value, shape_like: jnp.ndarray, spectral: bool) -> jnp.ndarray:
  """Constant response broadcast over a wavefront; shape_like is (R,...)."""
  r = shape_like.shape[0]
  return jnp.full((r, channels(spectral)), value, jnp.float32)


def query_spd(scene, spec_index, wl, spectral: bool) -> jnp.ndarray:
  """Query SPD bank -> (R, C). Negative index yields zero."""
  safe = jnp.maximum(spec_index, 0)
  if spectral:
    cache = getattr(scene, "spec_at_wl", None)
    # the cache applies only to queries at the step's own wavelength array
    # (object identity — derived wavelengths fall back to the gather path)
    if cache is not None and cache[0] is wl and safe.ndim == 1:
      table = cache[1]  # (R, S)
      ids = jnp.arange(table.shape[1], dtype=safe.dtype)[None, :]
      v = jnp.sum(jnp.where(ids == safe[:, None], table, 0.0),
                  axis=-1, keepdims=True)
    else:
      v = sp.query_bank(scene.spec_values, safe, wl)
  elif safe.ndim == 1:
    from etx_tracer_tpu.ops import gather as gops
    v = gops.take_rows(scene.spec_rgb, safe)
  else:
    v = scene.spec_rgb[safe]
  return jnp.where((spec_index >= 0)[..., None], v, 0.0)


def apply_rgb(response, rgb, wl, spectral: bool) -> jnp.ndarray:
  """Scale a response by an RGB value (scene.hxx:250-261).

  In spectral mode the RGB is upsampled through the basis at the ray's
  wavelength; in RGB mode it's a plain multiply.
  """
  if spectral:
    return response * sp.rgb_response(wl, rgb)
  return response * rgb


def maximum(v: jnp.ndarray) -> jnp.ndarray:
  return jnp.max(v, axis=-1)


def monochromatic(v: jnp.ndarray, spectral: bool) -> jnp.ndarray:
  """'Gray' scalar used for lobe selection (spectrum.hxx:303-305)."""
  if spectral:
    return v[..., 0]
  return em.luminance(v)


def is_zero(v: jnp.ndarray) -> jnp.ndarray:
  return jnp.max(v, axis=-1) <= em.kEpsilon


def to_film_rgb(v: jnp.ndarray, wl, spectral: bool) -> jnp.ndarray:
  """Convert accumulated response to film RGB.

  Spectral: divide by the wavelength sampling pdf and project through the
  CIE curves -> XYZ -> RGB (path_tracing.cxx:69-71 semantics).
  """
  if not spectral:
    return v
  scaled = v[..., 0] / sp.sampling_pdf(wl)
  xyz = sp.spectral_to_xyz(scaled, wl)
  return sp.xyz_to_rgb(xyz)
