"""Feature-guided denoiser (the OIDN role, render/host/denoiser.cxx).

The reference routes film layers through Intel OIDN (albedo + normal
prefilters, HDR beauty filter). Here: an edge-avoiding a-trous wavelet
filter (Dammertz et al.) guided by the film's normal and albedo AOVs —
pure JAX, runs on the same chip as the renderer, no external dependency.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


_KERNEL = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _shift2d(img, dy, dx):
  return jnp.roll(img, (dy, dx), axis=(0, 1))


@functools.partial(jax.jit, static_argnames=("iterations",))
def denoise(color, normals, albedo, iterations: int = 5,
            sigma_color: float = 0.25, sigma_normal: float = 0.3,
            sigma_albedo: float = 0.15):
  """Denoise (H,W,3) color using normal/albedo guides."""
  lum_w = jnp.array([0.212671, 0.715160, 0.072169])

  out = color
  for it in range(iterations):
    step = 1 << it
    acc = jnp.zeros_like(out)
    wsum = jnp.zeros(out.shape[:2])
    center_l = jnp.sum(out * lum_w, axis=-1)
    for ky in range(5):
      for kx in range(5):
        dy = (ky - 2) * step
        dx = (kx - 2) * step
        w_k = float(_KERNEL[ky] * _KERNEL[kx])
        c = _shift2d(out, dy, dx)
        n = _shift2d(normals, dy, dx)
        a = _shift2d(albedo, dy, dx)
        # relative luminance distance: HDR-robust (bright pixels would
        # otherwise zero all weights and disable filtering)
        d_l = (jnp.sum(c * lum_w, axis=-1) - center_l) / (jnp.abs(center_l) + 0.2)
        w_c = jnp.exp(-(d_l * d_l) / (2.0 * sigma_color * sigma_color))
        d_n = jnp.sum((n - normals) ** 2, axis=-1)
        w_n = jnp.exp(-d_n / (2.0 * sigma_normal * sigma_normal))
        d_a = jnp.sum((a - albedo) ** 2, axis=-1)
        w_a = jnp.exp(-d_a / (2.0 * sigma_albedo * sigma_albedo))
        wgt = w_k * w_c * w_n * w_a
        acc = acc + c * wgt[..., None]
        wsum = wsum + wgt
    out = acc / jnp.maximum(wsum, 1e-8)[..., None]
  return out


def denoise_film(film_state, iterations: int = 5):
  """Denoise the film's combined result using its AOV layers
  (Film::denoise semantics, film.cxx + denoiser.cxx:60-141)."""
  from etx_tracer_tpu.render import film as film_mod
  color = film_mod.result_image(film_state)
  return denoise(color, film_state.normals, film_state.albedo,
                 iterations=iterations)
