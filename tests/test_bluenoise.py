"""Blue-noise mask quality (VERDICT round-1 item 9): spectral test (low
frequencies suppressed vs white noise) + first-bounce variance reduction
on Cornell at low spp."""

import dataclasses

import numpy as np
import pytest


def test_mask_spectrum_is_blue():
  """Void-and-cluster construction: the 10%-threshold binary pattern's
  radially-averaged power spectrum must have a deep low-frequency deficit
  relative to white noise."""
  from etx_tracer_tpu.core import bluenoise

  n = 32
  mask = bluenoise.generate_mask(n)
  assert mask.shape == (n, n)
  # ranks are a permutation: every value appears exactly once
  assert np.unique(mask).size == n * n

  rng = np.random.default_rng(0)
  low_ratios = []
  for pattern in (mask < 0.1, rng.random((n, n)) < 0.1):
    b = pattern.astype(np.float64)
    b -= b.mean()
    p = np.abs(np.fft.fft2(b)) ** 2
    p[0, 0] = 0.0
    fy = np.minimum(np.arange(n), n - np.arange(n))
    f = np.sqrt(fy[:, None] ** 2 + fy[None, :] ** 2)
    # principal frequency of a 10% pattern ~ sqrt(0.1)*n
    f_cut = 0.5 * np.sqrt(0.1) * n
    low = p[(f > 0) & (f < f_cut)].mean()
    total = p[f > 0].mean()
    low_ratios.append(low / total)
  blue, white = low_ratios
  # white noise is flat (ratio ~1); blue noise suppresses low frequencies
  assert white > 0.5, f"white-noise baseline ratio {white}"
  assert blue < 0.35 * white, f"low-frequency ratio {blue} vs white {white}"


def test_shipped_mask_exists_and_is_blue():
  from etx_tracer_tpu.core import bluenoise
  import os
  if not os.path.exists(bluenoise._MASK_PATH):
    pytest.skip("shipped mask not generated yet")
  mask = bluenoise._blue_noise_mask()
  n = mask.shape[0]
  assert n == 128
  b = (mask < 0.1).astype(np.float64)
  b -= b.mean()
  p = np.abs(np.fft.fft2(b)) ** 2
  p[0, 0] = 0.0
  fy = np.minimum(np.arange(n), n - np.arange(n))
  f = np.sqrt(fy[:, None] ** 2 + fy[None, :] ** 2)
  f_cut = 0.5 * np.sqrt(0.1) * n
  ratio = p[(f > 0) & (f < f_cut)].mean() / p[f > 0].mean()
  assert ratio < 0.25, f"shipped mask low-frequency ratio {ratio}"


def test_first_bounce_variance_reduction():
  """Cornell at 4 spp: blue-noise first-bounce sampling must not increase
  (and should reduce) the pixel error vs the plain RNG."""
  from etx_tracer_tpu.models import path_tracing
  from etx_tracer_tpu.scene import cornell

  def render(blue, iters):
    scene, config = cornell.build_cornell_box(
        film_size=(20, 20), diffuse_only=True, max_path_length=4).build()
    config = dataclasses.replace(config, blue_noise=blue)
    sums, _ = path_tracing.render_samples_static(scene, config, 0, iters,
                                                 pool_size=20 * 20 * 8)
    return np.asarray(path_tracing.finalize_film(sums, iters, 20).camera)

  ref = render(False, 256)
  mse_white = float(((render(False, 4) - ref) ** 2).mean())
  mse_blue = float(((render(True, 4) - ref) ** 2).mean())
  assert mse_blue < mse_white * 1.02, (mse_blue, mse_white)
