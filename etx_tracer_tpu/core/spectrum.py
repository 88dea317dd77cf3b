"""Full-spectral pipeline: wavelength sampling, CIE conversion, SPDs.

TPU-native counterpart of the reference spectral system
(`/root/reference/sources/etx/render/shared/spectrum.hxx` and
`render/host/spectrum.cxx`):

- single-wavelength spectral sampling with the same sech^2 importance
  distribution (spectrum.hxx:219-239),
- runtime spectral/RGB switching: responses are arrays with a trailing
  channel axis of size 1 (spectral, per-ray wavelength carried separately)
  or 3 (RGB) — chosen statically per render so XLA compiles one tight path,
- SPDs stored as a dense bank sampled on a regular 1nm grid 390..830nm, so
  a spectral query is a gather + lerp (O(1), fully vectorized) instead of
  the reference's per-entry binary search (spectrum.hxx:475-487),
- CIE XYZ colour matching via the published analytic multi-lobe Gaussian
  fits (Wyman, Sloan & Shirley, JCGT 2013) instead of a baked table,
- RGB->spectral upsampling basis solved numerically at import against our
  own CIE curves (self-consistent; mirrors the role of the reference's
  rgb_response table, spectrum.cxx:399+).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from etx_tracer_tpu.core import math as em

kShortestWavelength = 390.0
kLongestWavelength = 830.0
kWavelengthCount = 441
kUndefinedWavelength = -1.0

# ---------------------------------------------------------------------------
# CIE XYZ colour matching (analytic fits, Wyman/Sloan/Shirley 2013).
# ---------------------------------------------------------------------------


def _piecewise_gauss(x, alpha, mu, s1, s2):
  s = jnp.where(x < mu, s1, s2)
  t = (x - mu) * s
  return alpha * jnp.exp(-0.5 * t * t)


def xyz_bar(wl):
  """CIE 1931 2-deg colour matching functions at wavelength(s) wl [nm]."""
  x = (_piecewise_gauss(wl, 0.362, 442.0, 0.0624, 0.0374)
       + _piecewise_gauss(wl, 1.056, 599.8, 0.0264, 0.0323)
       + _piecewise_gauss(wl, -0.065, 501.1, 0.0490, 0.0382))
  y = (_piecewise_gauss(wl, 0.821, 568.8, 0.0213, 0.0247)
       + _piecewise_gauss(wl, 0.286, 530.9, 0.0613, 0.0322))
  z = (_piecewise_gauss(wl, 1.217, 437.0, 0.0845, 0.0278)
       + _piecewise_gauss(wl, 0.681, 459.0, 0.0385, 0.0725))
  return jnp.stack([x, y, z], axis=-1)


def _xyz_bar_np(wl):
  def g(x, alpha, mu, s1, s2):
    s = np.where(x < mu, s1, s2)
    t = (x - mu) * s
    return alpha * np.exp(-0.5 * t * t)

  x = g(wl, 0.362, 442.0, 0.0624, 0.0374) + g(wl, 1.056, 599.8, 0.0264, 0.0323) + g(wl, -0.065, 501.1, 0.0490, 0.0382)
  y = g(wl, 0.821, 568.8, 0.0213, 0.0247) + g(wl, 0.286, 530.9, 0.0613, 0.0322)
  z = g(wl, 1.217, 437.0, 0.0845, 0.0278) + g(wl, 0.681, 459.0, 0.0385, 0.0725)
  return np.stack([x, y, z], axis=-1)


GRID = np.arange(kWavelengthCount, dtype=np.float64) + kShortestWavelength
_XYZ_GRID = _xyz_bar_np(GRID)
Y_INTEGRAL = float(_XYZ_GRID[:, 1].sum())

# sRGB D65 matrices — same published constants the reference uses
# (spectrum.hxx:142-165).
XYZ_TO_RGB = np.array([
    [3.2404542, -1.5371385, -0.4985314],
    [-0.9692660, 1.8760108, 0.0415560],
    [0.0556434, -0.2040259, 1.0572252],
], dtype=np.float32)

RGB_TO_XYZ = np.array([
    [0.4124564, 0.3575760, 0.1804375],
    [0.2126729, 0.7151521, 0.0721750],
    [0.0193339, 0.1191920, 0.9503041],
], dtype=np.float32)


def xyz_to_rgb(xyz):
  return jnp.einsum("ij,...j->...i", jnp.asarray(XYZ_TO_RGB), xyz)


def rgb_to_xyz(rgb):
  return jnp.einsum("ij,...j->...i", jnp.asarray(RGB_TO_XYZ), rgb)


# ---------------------------------------------------------------------------
# Wavelength importance sampling (spectrum.hxx:219-239).
# ---------------------------------------------------------------------------

_SAMPLE_OFFSET = float.fromhex("0x1.35ce7a0000000p-5")
_SAMPLE_SCALE = 1.0 - _SAMPLE_OFFSET

# The reference's sampling_pdf constant (spectrum.hxx:220) is the density of
# the *untruncated* tanh map; the actual draw is truncated to [390, 830] by
# _SAMPLE_OFFSET, so the true pdf is sampling_pdf()/kSpectralTruncation.
# We keep the reference constant for output parity (its spectral estimator
# carries the same 1/0.9622 scale).
kSpectralTruncation = _SAMPLE_SCALE


def sample_wavelength(rnd):
  """Importance-sample a wavelength with the sech^2-shaped pdf."""
  x = rnd * _SAMPLE_SCALE + _SAMPLE_OFFSET
  return 538.0 - 138.888889 * jnp.arctanh(0.85691062 - 1.82750197 * x)


def sampling_pdf(wl):
  """pdf of sample_wavelength (1.0 in RGB mode is handled by callers)."""
  return 0.0039398042 / em.sqr(jnp.cosh(0.0072 * (wl - 538.0)))


def spectral_to_xyz(value, wl):
  """Single-wavelength response -> XYZ (spectrum.hxx to_xyz, :271-289)."""
  in_range = (wl >= kShortestWavelength) & (wl <= kLongestWavelength)
  xyz = xyz_bar(wl) * (value / Y_INTEGRAL)[..., None]
  return jnp.where(in_range[..., None], xyz, 0.0)


# ---------------------------------------------------------------------------
# Blackbody (spectrum.hxx:167-189).
# ---------------------------------------------------------------------------


def black_body_radiation_maximum_wavelength(t_kelvins):
  return 2.8977729e6 / t_kelvins


def black_body_radiation(wavelength_nm, t_kelvins):
  scale = 1.0 / 1000.0
  lc1 = 3.7417712e5
  lc2 = 1.4387752e4
  w = wavelength_nm * scale
  wl5 = w * (w * w) * (w * w)
  e0 = jnp.exp(lc2 / (w * t_kelvins))
  d = wl5 * (e0 - 1.0)
  return jnp.where(jnp.isinf(d) | (d <= 0.0), 0.0, lc1 / jnp.maximum(d, 1e-30))


def _black_body_np(wavelength_nm, t_kelvins):
  scale = 1.0 / 1000.0
  lc1 = 3.7417712e5
  lc2 = 1.4387752e4
  w = wavelength_nm * scale
  wl5 = w * (w * w) * (w * w)
  with np.errstate(over="ignore"):
    e0 = np.exp(lc2 / (w * t_kelvins))
  d = wl5 * (e0 - 1.0)
  out = np.where(np.isinf(d) | (d <= 0.0), 0.0, lc1 / np.maximum(d, 1e-30))
  return out


# ---------------------------------------------------------------------------
# RGB -> spectral upsampling basis.
#
# Solved once at import: three smooth non-negative spectra B_r/B_g/B_b on the
# 1nm grid such that integrating c.B(lambda) against the CIE curves recovers
# (approximately) the XYZ of c for any rgb c.  Regularized least squares with
# non-negativity projection.  Plays the role of the reference's rgb_response
# basis table (render/host/spectrum.cxx:399+) but is derived, not copied.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _rgb_basis_np() -> np.ndarray:
  n = kWavelengthCount
  m = (_XYZ_GRID / Y_INTEGRAL).T  # (3, N): maps spectrum -> XYZ
  targets = RGB_TO_XYZ.astype(np.float64)  # columns? rows: xyz of e_r/e_g/e_b are columns
  # target XYZ for unit red/green/blue reflectance under our estimator
  t = targets  # t[:, i] = xyz of primary i
  # Second-difference smoothness operator.
  d2 = np.zeros((n - 2, n))
  for i in range(n - 2):
    d2[i, i] = 1.0
    d2[i, i + 1] = -2.0
    d2[i, i + 2] = 1.0
  alpha = 2e-5
  a = m.T @ m + alpha * (d2.T @ d2) + 1e-9 * np.eye(n)
  basis = np.linalg.solve(a, m.T @ t)  # (N, 3)
  # Project to non-negative and re-fit the scale a few times.
  for _ in range(8):
    basis = np.maximum(basis, 0.0)
    cur = m @ basis  # (3,3) achieved xyz
    scale, *_ = np.linalg.lstsq(cur, t, rcond=None)
    basis = basis @ scale
  basis = np.maximum(basis, 0.0)
  return basis.astype(np.float32)  # (N, 3)


def rgb_basis() -> jnp.ndarray:
  return jnp.asarray(_rgb_basis_np())


def rgb_response(wl, rgb):
  """Evaluate the RGB-upsampled reflectance at wavelength(s) wl.

  Mirrors `rgb_response` (render/host/spectrum.cxx): used to apply RGB
  texture/albedo values to a single-wavelength spectral response.
  Returns shape rgb[..., :1] evaluated at wl.
  """
  basis = rgb_basis()
  idx_f = jnp.clip(wl - kShortestWavelength, 0.0, kWavelengthCount - 1.000001)
  i0 = idx_f.astype(jnp.int32)
  frac = idx_f - i0.astype(jnp.float32)
  b0 = basis[i0]  # (..., 3)
  b1 = basis[jnp.minimum(i0 + 1, kWavelengthCount - 1)]
  b = b0 * (1.0 - frac[..., None]) + b1 * frac[..., None]
  return jnp.sum(b * rgb, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Host-side SpectralDistribution: dense regular-grid SPD.
# ---------------------------------------------------------------------------


class SpectralDistribution:
  """Host-side SPD on the dense 1nm grid + integrated RGB value.

  Mirrors the reference SpectralDistribution (spectrum.hxx:449-555) but
  resampled onto the regular grid at construction so device queries are a
  single gather+lerp.
  """

  CLASS_INVALID = 0
  CLASS_REFLECTANCE = 1
  CLASS_CONDUCTOR = 2
  CLASS_DIELECTRIC = 3
  CLASS_ILLUMINANT = 4

  def __init__(self, grid_values: np.ndarray, cls: int = CLASS_REFLECTANCE):
    assert grid_values.shape == (kWavelengthCount,)
    self.values = grid_values.astype(np.float32)
    self.cls = cls

  # -- constructors -------------------------------------------------------

  @staticmethod
  def null() -> "SpectralDistribution":
    return SpectralDistribution(np.zeros(kWavelengthCount), SpectralDistribution.CLASS_INVALID)

  @staticmethod
  def constant(value: float, cls: int = CLASS_REFLECTANCE) -> "SpectralDistribution":
    return SpectralDistribution(np.full(kWavelengthCount, value), cls)

  @staticmethod
  def from_samples(wavelengths: np.ndarray, powers: np.ndarray, cls: int = CLASS_REFLECTANCE) -> "SpectralDistribution":
    """Piecewise-linear resample onto the dense grid (zero outside range)."""
    wavelengths = np.asarray(wavelengths, dtype=np.float64)
    powers = np.asarray(powers, dtype=np.float64)
    order = np.argsort(wavelengths)
    wavelengths, powers = wavelengths[order], powers[order]
    vals = np.interp(GRID, wavelengths, powers, left=0.0, right=0.0)
    # match reference query semantics: zero outside the sampled range
    vals[GRID < wavelengths[0]] = 0.0
    vals[GRID > wavelengths[-1]] = 0.0
    return SpectralDistribution(vals, cls)

  @staticmethod
  def from_black_body(temperature: float, scale: float = 1.0) -> "SpectralDistribution":
    vals = _black_body_np(GRID, temperature) * scale
    return SpectralDistribution(vals, SpectralDistribution.CLASS_ILLUMINANT)

  @staticmethod
  def from_normalized_black_body(temperature: float, scale: float = 1.0) -> "SpectralDistribution":
    """Blackbody normalized to unit luminance then scaled (spectrum.cxx)."""
    sd = SpectralDistribution.from_black_body(temperature, 1.0)
    lum = sd.luminance()
    if lum > 0:
      sd.values *= scale / lum
    return sd

  @staticmethod
  def rgb_reflectance(rgb) -> "SpectralDistribution":
    basis = _rgb_basis_np()  # (N, 3)
    vals = basis @ np.asarray(rgb, dtype=np.float32)
    sd = SpectralDistribution(vals, SpectralDistribution.CLASS_REFLECTANCE)
    sd._integrated = np.asarray(rgb, dtype=np.float32)
    return sd

  @staticmethod
  def rgb_luminance(rgb) -> "SpectralDistribution":
    sd = SpectralDistribution.rgb_reflectance(rgb)
    sd.cls = SpectralDistribution.CLASS_ILLUMINANT
    sd._integrated = np.asarray(rgb, dtype=np.float32)
    return sd

  # -- queries ------------------------------------------------------------

  _integrated: np.ndarray | None = None

  def integrate_to_xyz(self) -> np.ndarray:
    return (_XYZ_GRID * self.values[:, None]).sum(axis=0) / Y_INTEGRAL

  def integrated_rgb(self) -> np.ndarray:
    """RGB value used in RGB-mode rendering."""
    if self._integrated is not None:
      return self._integrated
    xyz = self.integrate_to_xyz()
    return (XYZ_TO_RGB @ xyz.astype(np.float32))

  def luminance(self) -> float:
    return float(self.integrate_to_xyz()[1])

  def maximum_power(self) -> float:
    return float(self.values.max())

  def scale(self, factor: float):
    self.values *= factor
    if self._integrated is not None:
      self._integrated = self._integrated * factor
    return self


# ---------------------------------------------------------------------------
# Device-side bank query.
# ---------------------------------------------------------------------------


def bank_at_wl(bank_values: jnp.ndarray, wl) -> jnp.ndarray:
  """Every SPD of the (S,441) bank evaluated at each lane's wavelength.

  Returns (R, S). Built as lerp-weight one-hot rows x bank — one MXU matmul
  per wavefront step instead of per-lane dynamic gathers per query (TPU
  gathers are the spectral hot spot; see render/spectral.query_spd).
  """
  import jax
  idx_f = jnp.clip(wl - kShortestWavelength, 0.0, kWavelengthCount - 1.000001)
  i0 = idx_f.astype(jnp.int32)
  frac = (idx_f - i0.astype(jnp.float32))[:, None]
  cols = jnp.arange(kWavelengthCount, dtype=jnp.int32)[None, :]
  w = (jnp.where(cols == i0[:, None], 1.0 - frac, 0.0)
       + jnp.where(cols == i0[:, None] + 1, frac, 0.0))
  return jnp.matmul(w, bank_values.T, precision=jax.lax.Precision.HIGHEST)


def query_bank(bank_values: jnp.ndarray, index, wl):
  """Query SPD `index` of a dense bank (S, 441) at wavelength(s) wl.

  Returns shape wl[..., None] (single spectral channel).
  """
  idx_f = jnp.clip(wl - kShortestWavelength, 0.0, kWavelengthCount - 1.000001)
  i0 = idx_f.astype(jnp.int32)
  frac = idx_f - i0.astype(jnp.float32)
  v0 = bank_values[index, i0]
  v1 = bank_values[index, jnp.minimum(i0 + 1, kWavelengthCount - 1)]
  return (v0 * (1.0 - frac) + v1 * frac)[..., None]
