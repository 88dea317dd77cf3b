"""Measured-data validation of the spectral library.

The Lorentz-Drude curves (scene/spectral_data.py, Rakic et al. 1998
parameters) are cross-checked against Johnson & Christy (1972) measured n/k
anchors — an INDEPENDENT dataset, so agreement is a physics check, not a
file-integrity check. D65 is validated against its published CIE 1931
chromaticity. Covers VERDICT r03 "Missing #1" / "Weak #8/#9".
"""

import os

import numpy as np
import pytest

from etx_tracer_tpu.core import spectrum as sp
from etx_tracer_tpu.scene import ior as ior_mod
from etx_tracer_tpu.scene import spectral_data as sdata


def _nk_at(metal, wl):
  w, n, k = sdata.lorentz_drude_nk(metal, np.asarray([wl], np.float64))
  return float(n[0]), float(k[0])


class TestLorentzDrude:
  # Johnson & Christy 1972 (Phys Rev B 6, 4370) visible-range anchors,
  # interpolated to round wavelengths. LD fits deviate from J&C by up to
  # ~20-30% in n (which is small in absolute terms for noble metals) and
  # ~10% in k; the reflectance-driving quantity is k.
  @pytest.mark.parametrize("metal,wl,n_ref,k_ref,tol_n,tol_k", [
      ("gold", 500.0, 0.97, 1.87, 0.45, 0.25),
      ("gold", 600.0, 0.25, 2.99, 0.15, 0.35),
      ("gold", 700.0, 0.17, 3.80, 0.15, 0.45),
      ("silver", 500.0, 0.13, 2.92, 0.15, 0.35),
      ("silver", 600.0, 0.12, 3.73, 0.15, 0.40),
      ("silver", 700.0, 0.14, 4.52, 0.15, 0.50),
      # LD copper is known to overshoot k in the interband region (~15%)
      ("copper", 600.0, 0.47, 2.81, 0.30, 0.55),
      ("copper", 700.0, 0.21, 4.05, 0.20, 0.50),
  ])
  def test_vs_johnson_christy(self, metal, wl, n_ref, k_ref, tol_n, tol_k):
    n, k = _nk_at(metal, wl)
    assert abs(n - n_ref) < tol_n, (metal, wl, n, n_ref)
    assert abs(k - k_ref) < tol_k, (metal, wl, k, k_ref)

  def test_aluminium_high_reflectance(self):
    # Al: k between ~4.5 and ~8.5 across the visible, n around 0.5-2
    for wl in (450.0, 550.0, 650.0):
      n, k = _nk_at("aluminium", wl)
      assert 4.0 < k < 9.0, (wl, n, k)
      assert 0.3 < n < 2.5, (wl, n, k)

  def test_normal_reflectance_colors(self):
    # normal-incidence Fresnel R = ((n-1)^2+k^2)/((n+1)^2+k^2): gold must
    # be much more reflective in red than blue; silver uniformly high
    def refl(metal, wl):
      n, k = _nk_at(metal, wl)
      return ((n - 1) ** 2 + k ** 2) / ((n + 1) ** 2 + k ** 2)
    assert refl("gold", 650.0) > 0.90
    assert refl("gold", 450.0) < 0.60
    assert refl("gold", 650.0) - refl("gold", 450.0) > 0.3
    assert refl("silver", 450.0) > 0.85 and refl("silver", 650.0) > 0.92
    assert refl("copper", 650.0) > 0.9
    assert refl("copper", 650.0) - refl("copper", 475.0) > 0.25

  def test_full_grid_finite_positive(self):
    for metal in sdata.LD_METALS:
      wl, n, k = sdata.lorentz_drude_nk(metal)
      assert np.isfinite(n).all() and np.isfinite(k).all()
      assert (k > 0).all()
      assert (n > 0).all()

  def test_database_prefers_ld(self):
    db = ior_mod.IORDatabase()
    got = db.find("gold")
    assert got is not None
    cls, eta, k = got
    assert cls == sp.SpectralDistribution.CLASS_CONDUCTOR
    # LD curves cover the whole grid (the coarse table clamps at 400/700)
    _, n_ld, k_ld = sdata.lorentz_drude_nk("gold")
    np.testing.assert_allclose(eta.values, n_ld.astype(np.float32),
                               rtol=1e-5, atol=1e-5)
    # aliases route to the same data
    cls2, eta2, _ = db.find("Au")
    np.testing.assert_allclose(np.asarray(eta2.values),
                               np.asarray(eta.values))


class TestD65:
  def test_white_point(self):
    spd = sdata.d65()
    xyz = spd.to_xyz() if hasattr(spd, "to_xyz") else None
    if xyz is None:
      vals = np.asarray(spd.values, np.float64)
      xyz = (sp._XYZ_GRID * vals[:, None]).sum(0)
    x = xyz[0] / xyz.sum()
    y = xyz[1] / xyz.sum()
    # CIE D65 chromaticity (0.3127, 0.3290); the analytic-fit CMFs plus the
    # 20nm decimation land within ~0.006
    assert abs(x - 0.3127) < 0.008, (x, y)
    assert abs(y - 0.3290) < 0.008, (x, y)

  def test_database_lookup(self):
    db = ior_mod.IORDatabase()
    got = db.find("d65")
    assert got is not None and got[0] == sp.SpectralDistribution.CLASS_ILLUMINANT


class TestCMFAnchors:
  # Weak #9: bound the analytic-fit CMFs against tabulated CIE 1931 values
  @pytest.mark.parametrize("wl,xb,yb,zb", [
      (450.0, 0.3362, 0.0380, 1.7721),
      (500.0, 0.0049, 0.3230, 0.2720),
      (550.0, 0.4334, 0.9950, 0.0087),
      (600.0, 1.0622, 0.6310, 0.0008),
      (650.0, 0.2835, 0.1070, 0.0000),
  ])
  def test_cmf_fit_error_bounded(self, wl, xb, yb, zb):
    import jax.numpy as jnp
    got = np.asarray(sp.xyz_bar(jnp.asarray([wl])))[0]
    # multi-lobe Gaussian fits (Wyman/Sloan/Shirley) are accurate to ~2-3%
    # of peak; bound each component by 0.05 absolute (peaks are O(1))
    assert abs(got[0] - xb) < 0.05, (wl, got)
    assert abs(got[1] - yb) < 0.05, (wl, got)
    assert abs(got[2] - zb) < 0.05, (wl, got)


class TestSpdLibraryWriter:
  def test_roundtrip_through_scanner(self, tmp_path):
    files = sdata.write_spd_library(str(tmp_path))
    assert len(files) == len(sdata.LD_METALS) + 1
    db = ior_mod.IORDatabase(str(tmp_path))
    got = db.find("gold")
    assert got is not None
    cls, eta, k = got
    assert cls == sp.SpectralDistribution.CLASS_CONDUCTOR
    # file roundtrip agrees with the analytic model on the grid interior
    _, n_ld, _ = sdata.lorentz_drude_nk("gold")
    sel = (sp.GRID >= 400) & (sp.GRID <= 800)
    np.testing.assert_allclose(np.asarray(eta.values)[sel],
                               n_ld[sel].astype(np.float32), rtol=2e-3)


class TestDaylightSeries:
  """CIE D-series eigenvector model (round-5): white points must land on
  the published daylight chromaticities, and the D65 instance must match
  the independently tabulated D65 SPD."""

  @pytest.mark.parametrize("cct,x_ref,y_ref", [
      (5000.0, 0.3457, 0.3585),   # D50
      (5500.0, 0.3324, 0.3474),   # D55
      (6500.0, 0.3127, 0.3290),   # D65
      (7500.0, 0.2990, 0.3149),   # D75
  ])
  def test_white_points(self, cct, x_ref, y_ref):
    from etx_tracer_tpu.core.spectrum import _xyz_bar_np
    wl, v = sdata.daylight_spd_values(cct)
    sel = (wl >= 380) & (wl <= 780)
    xyz_bar = _xyz_bar_np(wl[sel])
    xyz = (xyz_bar * v[sel][:, None]).sum(0)
    x = xyz[0] / xyz.sum()
    y = xyz[1] / xyz.sum()
    # analytic-CMF integration error ~0.002 on top of the formula
    assert abs(x - x_ref) < 0.004, (x, x_ref)
    assert abs(y - y_ref) < 0.004, (y, y_ref)

  def test_d65_matches_published_table(self):
    wl, v = sdata.daylight_spd_values(6500.0)
    # compare on the published 20nm D65 grid, both normalized 100 @ 560
    got = np.interp(sdata._D65_WL, wl, v)
    ref = sdata._D65_V
    err = np.abs(got - ref) / ref.max()
    assert err.max() < 0.03, err.max()  # within 3% of peak everywhere

  def test_database_resolves_daylight_names(self):
    db = ior_mod.IORDatabase()
    for name in ("daylight_5000k", "daylight_5500k",
                 "daylight_6500k_noon_sky"):
      got = db.find(name)
      assert got is not None, name
      cls, spd, _ = got
      assert cls == sp.SpectralDistribution.CLASS_ILLUMINANT
      vals = np.asarray(spd.values)
      assert np.isfinite(vals).all() and vals.max() > 0


class TestLedModel:
  @pytest.mark.parametrize("cct", [2700.0, 4000.0, 5000.0, 6500.0])
  def test_cct_hits_nominal(self, cct):
    from etx_tracer_tpu.core.spectrum import _xyz_bar_np
    wl, v = sdata.led_spd_values(cct)
    xyz_bar = _xyz_bar_np(wl)
    xyz = (xyz_bar * v[:, None]).sum(0)
    x = xyz[0] / xyz.sum()
    y = xyz[1] / xyz.sum()
    got = sdata.mccamy_cct(x, y)
    assert abs(got - cct) < 60.0, (got, cct)

  def test_led_shape_blue_peak_plus_phosphor(self):
    wl, v = sdata.led_spd_values(4000.0)
    b = v[(wl >= 440) & (wl <= 460)].max()
    valley = v[(wl >= 470) & (wl <= 490)].min()
    hump = v[(wl >= 540) & (wl <= 620)].max()
    # the signature white-LED shape: blue peak, cyan valley, phosphor hump
    assert b > valley * 1.5
    assert hump > valley * 1.2

  def test_high_cri_adds_red(self):
    wl, lo = sdata.led_spd_values(4000.0)
    _, hi = sdata.led_spd_values(4000.0, high_cri=True)
    red = (wl >= 620) & (wl <= 680)
    # more relative red content than the standard bin
    assert hi[red].sum() / hi.sum() > lo[red].sum() / lo.sum()


class TestDielectricCauchyAnchors:
  """Round-5: pin the shipped Cauchy fits to published line indices
  (Fraunhofer d/D lines; BK7 and water also at F). Sources: standard
  optical-glass / handbook values."""

  def _n_at(self, name, wl_nm):
    db = ior_mod.IORDatabase()
    cls, eta, _ = db.find(name)
    assert cls == sp.SpectralDistribution.CLASS_DIELECTRIC
    i = int(round(wl_nm - sp.kShortestWavelength))
    return float(np.asarray(eta.values)[i])

  @pytest.mark.parametrize("name,wl,n_ref,tol", [
      ("glass", 587.6, 1.5168, 0.002),   # BK7 d line
      ("glass", 486.1, 1.5224, 0.003),   # BK7 F line
      ("water", 589.3, 1.3330, 0.002),
      ("water", 486.1, 1.3373, 0.003),
      ("diamond", 589.3, 2.4170, 0.004),
      ("diamond", 486.1, 2.4354, 0.006),
      ("sapphire", 589.3, 1.7680, 0.003),
      ("glycerol", 589.3, 1.4730, 0.003),
  ])
  def test_line_indices(self, name, wl, n_ref, tol):
    assert abs(self._n_at(name, wl) - n_ref) < tol


class TestGrayConductorAnchors:
  """Round-5: physical anchors for the non-LD conductor tables
  (nickel/platinum/chrome). Point n/k data varies several percent between
  published measurement sets, so the anchors are (a) handbook n/k windows
  at the sodium D line, (b) normal-incidence reflectance windows, and
  (c) spectral neutrality (these metals are gray, unlike Au/Cu)."""

  def _nk_at(self, name, wl_nm):
    db = ior_mod.IORDatabase()
    cls, eta, k = db.find(name)
    assert cls == sp.SpectralDistribution.CLASS_CONDUCTOR
    i = int(round(wl_nm - sp.kShortestWavelength))
    return (float(np.asarray(eta.values)[i]), float(np.asarray(k.values)[i]))

  @staticmethod
  def _r0(n, k):
    return ((n - 1.0) ** 2 + k * k) / ((n + 1.0) ** 2 + k * k)

  @pytest.mark.parametrize("name,n_lo,n_hi,k_lo,k_hi,r_lo,r_hi", [
      ("nickel", 1.6, 2.3, 3.0, 4.1, 0.55, 0.70),
      ("platinum", 1.9, 2.5, 3.4, 4.4, 0.60, 0.75),
      ("chrome", 2.4, 3.3, 2.9, 3.7, 0.50, 0.65),
  ])
  def test_d_line_windows(self, name, n_lo, n_hi, k_lo, k_hi, r_lo, r_hi):
    n, k = self._nk_at(name, 589.3)
    assert n_lo <= n <= n_hi, (name, n)
    assert k_lo <= k <= k_hi, (name, k)
    r = self._r0(n, k)
    assert r_lo <= r <= r_hi, (name, r)

  @pytest.mark.parametrize("name", ["nickel", "platinum", "chrome"])
  def test_spectral_neutrality(self, name):
    rs = [self._r0(*self._nk_at(name, wl)) for wl in (450.0, 550.0, 650.0)]
    # near-gray: published nickel has a mild warm slope (~1.16); allow 1.25
    assert max(rs) / min(rs) < 1.25, (name, rs)
    # contrast: gold is strongly non-neutral over the same band
    db = ior_mod.IORDatabase()
    _, eta, k = db.find("gold")
    ev = np.asarray(eta.values); kv = np.asarray(k.values)
    rg = []
    for wl in (450.0, 550.0, 650.0):
      i = int(round(wl - sp.kShortestWavelength))
      rg.append(self._r0(float(ev[i]), float(kv[i])))
    assert max(rg) / min(rg) > 1.5
