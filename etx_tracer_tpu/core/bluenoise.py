"""Blue-noise-distributed low-discrepancy samples for first-bounce dims.

The reference ships precomputed 128x128 progressive blue-noise tables
(thirdparty/bluenoise, used at path_tracing.cxx:173-178). We generate a
void-and-cluster blue-noise mask at import (cached) and combine it with the
R2 additive-recurrence sequence via Cranley-Patterson rotation: per-pixel
decorrelation with blue-noise error distribution, no shipped data tables.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

_MASK_SIZE = 64
# R2 sequence constants (generalized golden ratio, plastic constant based)
_R2_ALPHA = np.array([0.7548776662466927, 0.5698402909980532])


@functools.lru_cache(maxsize=1)
def _blue_noise_mask() -> np.ndarray:
  """Void-and-cluster rank mask, values in [0,1)."""
  n = _MASK_SIZE
  rs = np.random.RandomState(0x5EED)
  sigma = 1.9

  yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")

  def energy_kernel():
    d = np.minimum(np.abs(np.arange(n)), n - np.abs(np.arange(n))).astype(np.float64)
    dx2 = d[None, :] ** 2
    dy2 = d[:, None] ** 2
    return np.exp(-(dx2 + dy2) / (2 * sigma * sigma))

  kern = energy_kernel()
  kern_f = np.fft.rfft2(kern)

  def blur(binary):
    return np.fft.irfft2(np.fft.rfft2(binary) * kern_f, s=(n, n))

  # initial pattern: 10% ones, relaxed
  count = n * n // 10
  binary = np.zeros((n, n))
  ones = rs.choice(n * n, count, replace=False)
  binary.flat[ones] = 1.0
  for _ in range(40):
    e = blur(binary)
    # move tightest cluster to largest void
    cluster = np.argmax(np.where(binary > 0, e, -np.inf))
    binary.flat[cluster] = 0.0
    e = blur(binary)
    void = np.argmin(np.where(binary > 0, np.inf, e))
    if void == cluster:
      binary.flat[cluster] = 1.0
      break
    binary.flat[void] = 1.0

  rank = np.zeros((n, n), np.int64)
  # phase 1: remove ones, rank descending
  b = binary.copy()
  for r in range(count - 1, -1, -1):
    e = blur(b)
    i = np.argmax(np.where(b > 0, e, -np.inf))
    b.flat[i] = 0.0
    rank.flat[i] = r
  # phase 2: add to the voids
  b = binary.copy()
  for r in range(count, n * n):
    e = blur(b)
    i = np.argmin(np.where(b > 0, np.inf, e))
    b.flat[i] = 1.0
    rank.flat[i] = r
  return ((rank.astype(np.float64) + 0.5) / (n * n)).astype(np.float32)


def mask_array() -> jnp.ndarray:
  return jnp.asarray(_blue_noise_mask())


def sample_2d(pixel_x, pixel_y, sample_index, dimension: int = 0):
  """Blue-noise-rotated R2 point for (pixel, sample, dimension) -> (R,2).

  Mirrors sample_blue_noise's role (path_tracing_shared.hxx:236): stable
  per-pixel low-discrepancy first-bounce samples.
  """
  mask = mask_array()
  mx = (pixel_x + 31 * dimension) % _MASK_SIZE
  my = (pixel_y + 17 * dimension) % _MASK_SIZE
  offset = mask[my, mx]
  offset2 = mask[(my + 29) % _MASK_SIZE, (mx + 43) % _MASK_SIZE]
  s = sample_index.astype(jnp.float32) + 1.0
  u = jnp.mod(s * _R2_ALPHA[0] + offset, 1.0)
  v = jnp.mod(s * _R2_ALPHA[1] + offset2, 1.0)
  return jnp.stack([u, v], axis=-1)
