"""Measured-data-backed spectral library.

Replaces the coarse visible-range approximations in `scene/ior.py` for the
core conductor set with full-range complex-IOR curves from the
Lorentz-Drude oscillator model with the parameters published by
Rakic, Djurisic, Elazar & Majewski, "Optical properties of metallic films
for vertical-cavity optoelectronic devices", Applied Optics 37/22 (1998),
Table 1 — the standard renderer-grade parametrization of noble-metal
optics. The model is evaluated on the engine's native wavelength grid, so
n/k are smooth and defined over the whole sampled range (not clamped at
400/700 nm like the fallback tables).

Counterpart of the reference's measured .spd library
(bin/spectrum/conductor/*.spd, loaded by render/shared/ior_database.hxx:
47-189); the data here is *derived from the published model*, not copied.

Also provides the CIE D65 standard illuminant (published 1nm table
decimated to 20 nm, normalized 100 @ 560nm) and an `.spd` writer so a
user-visible spectrum library directory (ETX_SPECTRUM_PATH) can be
generated offline.

tests/test_spectral_data.py validates gold/silver/copper/aluminium n/k
against Johnson & Christy (1972) / Rakic anchor values — an independent
measurement set — and the D65 white point against the CIE 1931 chromaticity
(0.3127, 0.3290).
"""

from __future__ import annotations

import os

import numpy as np

from etx_tracer_tpu.core import spectrum as sp

# ---------------------------------------------------------------------------
# Lorentz-Drude model (Rakic et al. 1998, Table 1).
# epsilon(w) = 1 - f0 wp^2 / (w (w + i G0))
#             + sum_j f_j wp^2 / ((w_j^2 - w^2) - i w G_j)
# with photon energy w in eV. N = sqrt(eps), n = Re N, k = Im N.
# ---------------------------------------------------------------------------

# metal -> (wp_eV, [(f_j, Gamma_j_eV, omega_j_eV)]) ; j=0 is the Drude term
# (omega_0 = 0).
_LD_PARAMS = {
    "gold": (9.03, [
        (0.760, 0.053, 0.0),
        (0.024, 0.241, 0.415),
        (0.010, 0.345, 0.830),
        (0.071, 0.870, 2.969),
        (0.601, 2.494, 4.304),
        (4.384, 2.214, 13.32),
    ]),
    "silver": (9.01, [
        (0.845, 0.048, 0.0),
        (0.065, 3.886, 0.816),
        (0.124, 0.452, 4.481),
        (0.011, 0.065, 8.185),
        (0.840, 0.916, 9.083),
        (5.646, 2.419, 20.29),
    ]),
    "copper": (10.83, [
        (0.575, 0.030, 0.0),
        (0.061, 0.378, 0.291),
        (0.104, 1.056, 2.957),
        (0.723, 3.213, 5.300),
        (0.638, 4.305, 11.18),
    ]),
    "aluminium": (14.98, [
        (0.523, 0.047, 0.0),
        (0.227, 0.333, 0.162),
        (0.050, 0.312, 1.544),
        (0.166, 1.351, 1.808),
        (0.030, 3.382, 3.473),
    ]),
}

_EV_NM = 1239.84193  # photon energy (eV) * wavelength (nm)


def lorentz_drude_nk(metal: str, wavelengths_nm=None):
  """Complex IOR for `metal` on `wavelengths_nm` (default: engine grid).

  Returns (wavelengths, n, k) float64 arrays.
  """
  key = metal.lower()
  if key not in _LD_PARAMS:
    raise KeyError(f"no Lorentz-Drude parameters for {metal!r}")
  wp, osc = _LD_PARAMS[key]
  wl = np.asarray(wavelengths_nm if wavelengths_nm is not None else sp.GRID,
                  np.float64)
  w = _EV_NM / wl  # eV
  eps = np.ones_like(w, np.complex128)
  for (f, g, w0) in osc:
    if w0 == 0.0:
      eps -= f * wp * wp / (w * (w + 1j * g))
    else:
      eps += f * wp * wp / ((w0 * w0 - w * w) - 1j * w * g)
  n_c = np.sqrt(eps)
  # principal root with positive imaginary part (absorbing medium)
  n_c = np.where(n_c.imag < 0, -n_c, n_c)
  return wl, n_c.real.copy(), n_c.imag.copy()


def conductor_spectra(metal: str):
  """(eta, k) SpectralDistributions for a Lorentz-Drude metal."""
  wl, n, k = lorentz_drude_nk(metal)
  cls = sp.SpectralDistribution.CLASS_CONDUCTOR
  return (sp.SpectralDistribution.from_samples(wl, n, cls),
          sp.SpectralDistribution.from_samples(wl, k, cls))


LD_METALS = tuple(_LD_PARAMS)
LD_ALIASES = {"au": "gold", "ag": "silver", "cu": "copper",
              "al": "aluminium", "aluminum": "aluminium"}


# ---------------------------------------------------------------------------
# CIE standard illuminant D65: published relative SPD (CIE 15:2004 table,
# decimated to 20 nm), normalized to 100 at 560 nm.
# ---------------------------------------------------------------------------

_D65_WL = np.arange(380, 781, 20, dtype=np.float64)
_D65_V = np.array([
    49.98, 82.75, 93.43, 104.86, 117.01, 115.92, 109.35, 104.79, 104.41,
    100.00, 95.79, 90.01, 87.70, 83.70, 80.21, 78.27, 71.61, 61.60,
    75.09, 46.42, 63.38,
], np.float64)
assert _D65_WL.shape == _D65_V.shape


def d65() -> sp.SpectralDistribution:
  # hold the table ends so the engine grid (390-830) has no hard cliff
  wl = np.concatenate([[sp.kShortestWavelength - 1.0], _D65_WL,
                       [sp.kLongestWavelength + 1.0]])
  v = np.concatenate([[_D65_V[0]], _D65_V, [_D65_V[-1]]])
  return sp.SpectralDistribution.from_samples(
      wl, v / 100.0, sp.SpectralDistribution.CLASS_ILLUMINANT)


# ---------------------------------------------------------------------------
# .spd asset writer (user-facing spectrum library generation)
# ---------------------------------------------------------------------------


def write_spd_library(folder: str):
  """Write the derived conductor/illuminant library as .spd files compatible
  with the scanner in scene/ior.py (and the reference's on-disk format:
  `#class:` header + `wavelength eta k` rows)."""
  cdir = os.path.join(folder, "conductor")
  edir = os.path.join(folder, "emission")
  os.makedirs(cdir, exist_ok=True)
  os.makedirs(edir, exist_ok=True)
  written = []
  for metal in LD_METALS:
    wl, n, k = lorentz_drude_nk(metal, np.arange(360.0, 831.0, 5.0))
    path = os.path.join(cdir, f"{metal}.spd")
    with open(path, "w") as f:
      f.write(f"#class: conductor\n#title: {metal} (Lorentz-Drude, "
              "Rakic et al. 1998)\n")
      for i in range(wl.shape[0]):
        f.write(f"{wl[i]:.1f} {n[i]:.6f} {k[i]:.6f}\n")
    written.append(path)
  path = os.path.join(edir, "d65.spd")
  with open(path, "w") as f:
    f.write("#class: illuminant\n#title: CIE standard illuminant D65\n")
    for i in range(_D65_WL.shape[0]):
      f.write(f"{_D65_WL[i]:.1f} {_D65_V[i]:.2f}\n")
  written.append(path)
  return written
