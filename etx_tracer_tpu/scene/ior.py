"""Refractive-index database: .spd files + built-in approximations.

Counterpart of the reference IORDatabase (render/shared/ior_database.hxx:
47-189) and the SPD parser (render/host/spectrum.cxx:156-300). Scans a
directory tree for `.spd` files (`#class:` header, `wavelength eta [k]`
rows, wavelengths auto-scaled x10 until >= 100 so um become nm) named by
material. Search path: the ETX_SPECTRUM_PATH environment variable.

When no .spd library is available, a compact built-in set provides common
conductors (coarse published-curve approximations of n/k for Au, Ag, Cu,
Al) and dielectrics (Cauchy/constant fits) so scenes referencing e.g.
`int_ior silver` still load.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from etx_tracer_tpu.core import spectrum as sp

_CLASS_MAP = {
    "conductor": sp.SpectralDistribution.CLASS_CONDUCTOR,
    "dielectric": sp.SpectralDistribution.CLASS_DIELECTRIC,
    "illuminant": sp.SpectralDistribution.CLASS_ILLUMINANT,
}


def parse_spd(text: str):
  """Parse .spd content -> (cls, title, wavelengths, v0, v1)."""
  cls = sp.SpectralDistribution.CLASS_INVALID
  title = ""
  wl, v0, v1 = [], [], []
  for line in text.splitlines():
    line = line.strip()
    if not line:
      continue
    if line.startswith("#"):
      if line.startswith("#class"):
        name = line.split(":", 1)[-1].strip().split()[0] if ":" in line else ""
        cls = _CLASS_MAP.get(name, sp.SpectralDistribution.CLASS_REFLECTANCE if name else cls)
      elif line.startswith("#title"):
        title = line.split(":", 1)[-1].strip()
      continue
    parts = line.split()
    if len(parts) >= 2:
      try:
        w = float(parts[0])
        a = float(parts[1])
        b = float(parts[2]) if len(parts) >= 3 else 0.0
      except ValueError:
        continue
      wl.append(w)
      v0.append(a)
      v1.append(b)
  if not wl:
    return cls, title, None, None, None
  wl = np.asarray(wl, np.float64)
  order = np.argsort(wl)
  wl = wl[order]
  v0 = np.asarray(v0, np.float64)[order]
  v1 = np.asarray(v1, np.float64)[order]
  # wavelength auto-scale (spectrum.cxx:256-261): um -> nm
  scale = 1.0
  mn = wl[0]
  while mn < 100.0:
    mn *= 10.0
    scale *= 10.0
  wl = wl * scale
  return cls, title, wl, v0, v1


def load_spd_file(path: str):
  """Returns (cls, eta SpectralDistribution, k SpectralDistribution)."""
  with open(path) as f:
    cls, title, wl, v0, v1 = parse_spd(f.read())
  if wl is None:
    return sp.SpectralDistribution.CLASS_INVALID, None, None
  keep = (wl >= sp.kShortestWavelength) & (wl <= sp.kLongestWavelength)
  if not keep.any():
    wl2 = np.array([sp.kShortestWavelength, sp.kLongestWavelength])
    v0 = np.full(2, v0[0]); v1 = np.full(2, v1[0]); wl = wl2
  else:
    wl, v0, v1 = wl[keep], v0[keep], v1[keep]
  # extend to full range holding end values (load path uses extend_range)
  if wl[0] > sp.kShortestWavelength:
    wl = np.concatenate([[sp.kShortestWavelength], wl])
    v0 = np.concatenate([[v0[0]], v0]); v1 = np.concatenate([[v1[0]], v1])
  if wl[-1] < sp.kLongestWavelength:
    wl = np.concatenate([wl, [sp.kLongestWavelength]])
    v0 = np.concatenate([v0, [v0[-1]]]); v1 = np.concatenate([v1, [v1[-1]]])
  eta = sp.SpectralDistribution.from_samples(wl, v0, cls)
  k = sp.SpectralDistribution.from_samples(wl, v1, cls)
  return cls, eta, k


# ---------------------------------------------------------------------------
# Built-in fallbacks (coarse approximations of standard published curves).
# wavelengths in nm; (eta, k) pairs.
# ---------------------------------------------------------------------------

_BUILTIN_CONDUCTORS = {
    # visible-range n/k, coarse 7-point approximations
    "gold": ([400, 450, 500, 550, 600, 650, 700],
             [1.66, 1.50, 0.85, 0.43, 0.25, 0.17, 0.16],
             [1.96, 1.88, 1.90, 2.46, 3.07, 3.15, 3.80]),
    "silver": ([400, 450, 500, 550, 600, 650, 700],
               [0.17, 0.15, 0.13, 0.12, 0.12, 0.14, 0.14],
               [1.95, 2.42, 2.92, 3.34, 3.73, 4.15, 4.52]),
    "copper": ([400, 450, 500, 550, 600, 650, 700],
               [1.17, 1.15, 1.12, 1.04, 0.54, 0.23, 0.21],
               [2.21, 2.40, 2.60, 2.59, 2.60, 3.21, 3.67]),
    "aluminium": ([400, 450, 500, 550, 600, 650, 700],
                  [0.49, 0.62, 0.77, 0.96, 1.20, 1.47, 1.83],
                  [4.86, 5.47, 6.08, 6.69, 7.26, 7.79, 8.31]),
    "mirror": ([400, 700], [0.12, 0.14], [3.0, 4.4]),
}
_BUILTIN_CONDUCTORS["aluminum"] = _BUILTIN_CONDUCTORS["aluminium"]

_BUILTIN_DIELECTRICS = {
    # Cauchy A + B/lambda^2(um)
    "glass": (1.5046, 0.00420),
    "glass-bk7": (1.5046, 0.00420),
    "water": (1.3199, 0.006878),
    "diamond": (2.3818, 0.0121),
    "sapphire": (1.7522, 0.00553),
    "vacuum": (1.0, 0.0),
    "air": (1.000277, 0.0),
}


class IORDatabase:
  def __init__(self, folder: Optional[str] = None):
    self.entries: dict[str, tuple] = {}
    folder = folder or os.environ.get("ETX_SPECTRUM_PATH", "")
    if folder and os.path.isdir(folder):
      self._scan(folder)

  def _scan(self, folder: str):
    for root, _, files in os.walk(folder):
      for fn in files:
        if fn.endswith(".spd"):
          path = os.path.join(root, fn)
          cls, eta, k = load_spd_file(path)
          if cls != sp.SpectralDistribution.CLASS_INVALID:
            key = os.path.splitext(fn)[0].lower()
            self.entries[key] = (cls, eta, k)

  def find(self, name: str):
    """Returns (cls, eta, k SpectralDistributions) or None."""
    key = os.path.splitext(os.path.basename(name))[0].lower()
    if key in self.entries:
      return self.entries[key]
    if key in _BUILTIN_CONDUCTORS:
      wl, n, kk = _BUILTIN_CONDUCTORS[key]
      cls = sp.SpectralDistribution.CLASS_CONDUCTOR
      eta = sp.SpectralDistribution.from_samples(
          np.array([sp.kShortestWavelength] + list(wl) + [sp.kLongestWavelength]),
          np.array([n[0]] + list(n) + [n[-1]]), cls)
      k = sp.SpectralDistribution.from_samples(
          np.array([sp.kShortestWavelength] + list(wl) + [sp.kLongestWavelength]),
          np.array([kk[0]] + list(kk) + [kk[-1]]), cls)
      return cls, eta, k
    if key in _BUILTIN_DIELECTRICS:
      a, b = _BUILTIN_DIELECTRICS[key]
      cls = sp.SpectralDistribution.CLASS_DIELECTRIC
      lam_um2 = (sp.GRID / 1000.0) ** 2
      eta = sp.SpectralDistribution((a + b / lam_um2).astype(np.float32), cls)
      k = sp.SpectralDistribution.constant(0.0, cls)
      return cls, eta, k
    return None
