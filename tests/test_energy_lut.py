"""Energy-compensation LUT vs the stochastic Heitz walk.

The LUT backend (render/bsdf/energy_lut.py) replaces the walk on the
conductor hot path; these tests pin its guarantees:
 - the F=1 white furnace closes exactly (by construction),
 - total directional reflectance tracks the walk within a few percent,
 - sample/eval/pdf are mutually consistent (weight == f/pdf).
Reference semantics: external::eval_conductor / sample_conductor
(render/shared/bsdf_external.hxx:281-466).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from etx_tracer_tpu.core import math as em
from etx_tracer_tpu.render.bsdf import energy_lut as el


def _ones_fresnel(cos_t):
  return jnp.ones(cos_t.shape + (1,), jnp.float32)


def _schlick(f0):
  def f(cos_t):
    c = jnp.clip(cos_t, 0.0, 1.0)
    return (f0 + (1.0 - f0) * (1.0 - c) ** 5)[..., None] * jnp.ones_like(c)[..., None]
  return f


class TestTables:
  def test_e_monotone_in_alpha_at_normal(self):
    # at normal incidence single-scatter albedo decreases with roughness
    e_smooth = float(el.e_lookup(jnp.asarray([1.0]), jnp.asarray([0.01]))[0])
    e_rough = float(el.e_lookup(jnp.asarray([1.0]), jnp.asarray([0.9]))[0])
    assert e_smooth > 0.98
    assert e_rough < e_smooth

  def test_e_avg_bounds(self):
    e_avg = el.e_avg_lookup(jnp.asarray([0.01, 0.3, 1.0]))
    v = np.asarray(e_avg)
    # independent MC (G2/G1 VNDF estimator) gives ~0.99 / 0.84 / 0.41
    assert (v > 0.3).all() and (v <= 1.0).all()
    assert v[0] > v[1] > v[2]
    np.testing.assert_allclose(v, [0.99, 0.838, 0.406], atol=0.02)

  def test_fresnel_average_unit(self):
    f_avg = el.fresnel_average(_ones_fresnel, (4,))
    np.testing.assert_allclose(np.asarray(f_avg), 1.0, atol=1e-6)

  def test_fresnel_average_schlick_analytic(self):
    # Schlick F_avg has the closed form (20 f0 + 1) / 21
    f0 = 0.4
    f_avg = el.fresnel_average(_schlick(f0), (4,))
    np.testing.assert_allclose(np.asarray(f_avg), (20 * f0 + 1) / 21.0,
                               rtol=1e-4)


class TestFurnace:
  # alpha >= 0.4 only: the fixed (mu_o, phi) grid below cannot resolve
  # narrower lobes (the sampling-based closure test covers small alpha)
  @pytest.mark.parametrize("alpha", [0.4, 0.7, 1.0])
  @pytest.mark.parametrize("mu_i", [0.15, 0.5, 0.95])
  def test_white_furnace_closes(self, alpha, mu_i):
    # integrate eval over the hemisphere with F=1: must come back to ~1
    n_mo, n_phi = 64, 32
    mu_o = (np.arange(n_mo) + 0.5) / n_mo
    phi = (np.arange(n_phi) + 0.5) * (2 * np.pi / n_phi)
    mo, ph = np.meshgrid(mu_o, phi, indexing="ij")
    so = np.sqrt(1 - mo**2)
    w_o = np.stack([so * np.cos(ph), so * np.sin(ph), mo], -1).reshape(-1, 3)
    n = w_o.shape[0]
    si = np.sqrt(1 - mu_i**2)
    w_i = np.broadcast_to(np.array([si, 0, mu_i], np.float32), (n, 3))
    a = jnp.full((n, 2), alpha, jnp.float32)
    f = el.conductor_eval_lut(_ones_fresnel, jnp.asarray(w_i, jnp.float32),
                              jnp.asarray(w_o, jnp.float32), a)
    # eval is cosine-folded: total = sum f dw, dw = dmu dphi
    total = float(np.asarray(f)[:, 0].sum() * (1.0 / n_mo) * (2 * np.pi / n_phi))
    assert abs(total - 1.0) < 0.03, total

  @pytest.mark.parametrize("alpha", [0.2, 0.6])
  def test_fresnel_energy_bounded(self, alpha):
    n_mo, n_phi = 64, 32
    mu_o = (np.arange(n_mo) + 0.5) / n_mo
    phi = (np.arange(n_phi) + 0.5) * (2 * np.pi / n_phi)
    mo, ph = np.meshgrid(mu_o, phi, indexing="ij")
    so = np.sqrt(1 - mo**2)
    w_o = np.stack([so * np.cos(ph), so * np.sin(ph), mo], -1).reshape(-1, 3)
    n = w_o.shape[0]
    w_i = np.broadcast_to(np.array([0.6, 0, 0.8], np.float32), (n, 3))
    a = jnp.full((n, 2), alpha, jnp.float32)
    f = el.conductor_eval_lut(_schlick(0.9), jnp.asarray(w_i, jnp.float32),
                              jnp.asarray(w_o, jnp.float32), a)
    total = float(np.asarray(f)[:, 0].sum() * (1.0 / n_mo) * (2 * np.pi / n_phi))
    assert 0.0 < total <= 1.0 + 1e-3


class TestVsWalk:
  @pytest.mark.parametrize("alpha,mu_i", [(0.2, 0.9), (0.5, 0.5), (0.8, 0.3)])
  def test_total_reflectance_tracks_walk(self, alpha, mu_i):
    # the walk's mean sampled energy IS its total directional reflectance;
    # compare against the LUT lobe integrated over the hemisphere
    from etx_tracer_tpu.render.bsdf import multiscatter as ms
    n = 16384
    rs = np.random.RandomState(5)
    rnd = jnp.asarray(rs.uniform(size=(n, 7)).astype(np.float32))
    si = np.sqrt(1 - mu_i**2)
    w_i = jnp.broadcast_to(jnp.asarray([si, 0, mu_i], jnp.float32), (n, 3))
    a = jnp.full((n, 2), alpha, jnp.float32)
    fres = _schlick(0.7)
    _, energy = ms.conductor_sample_walk(fres, w_i, a, rnd)
    walk_total = float(np.asarray(energy)[:, 0].mean())

    n_mo, n_phi = 64, 32
    mu_o = (np.arange(n_mo) + 0.5) / n_mo
    phi = (np.arange(n_phi) + 0.5) * (2 * np.pi / n_phi)
    mo, ph = np.meshgrid(mu_o, phi, indexing="ij")
    so = np.sqrt(1 - mo**2)
    w_o = np.stack([so * np.cos(ph), so * np.sin(ph), mo], -1).reshape(-1, 3)
    m = w_o.shape[0]
    w_i2 = jnp.broadcast_to(jnp.asarray([si, 0, mu_i], jnp.float32), (m, 3))
    a2 = jnp.full((m, 2), alpha, jnp.float32)
    f = el.conductor_eval_lut(fres, w_i2, jnp.asarray(w_o, jnp.float32), a2)
    lut_total = float(np.asarray(f)[:, 0].sum() * (1.0 / n_mo) * (2 * np.pi / n_phi))
    # both estimate total reflectance of the same microsurface; the LUT's
    # compensation shape is approximate, its energy should agree to a few %
    assert abs(lut_total - walk_total) < 0.05, (lut_total, walk_total)


class TestSampleConsistency:
  def test_weight_is_f_over_pdf(self):
    n = 4096
    rs = np.random.RandomState(9)
    rnd = jnp.asarray(rs.uniform(size=(n, 7)).astype(np.float32))
    w_i = jnp.broadcast_to(jnp.asarray([0.48, 0, 0.877], jnp.float32), (n, 3))
    a = jnp.full((n, 2), 0.35, jnp.float32)
    fres = _schlick(0.8)
    w_o, weight, pdf = el.conductor_sample_lut(fres, w_i, a, rnd)
    f = el.conductor_eval_lut(fres, w_i, w_o, a)
    p2 = el.conductor_pdf_lut(w_i, w_o, a)
    ok = np.asarray(pdf) > 1e-5
    np.testing.assert_allclose(np.asarray(pdf)[ok], np.asarray(p2)[ok],
                               rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(weight)[ok],
        (np.asarray(f) / np.maximum(np.asarray(pdf)[:, None], 1e-9))[ok],
        rtol=1e-4)

  def test_sampled_reflectance_matches_integral(self):
    # MC estimate sum(weight)/N equals the integrated lobe (same measure)
    n = 1 << 16
    rs = np.random.RandomState(11)
    rnd = jnp.asarray(rs.uniform(size=(n, 7)).astype(np.float32))
    w_i = jnp.broadcast_to(jnp.asarray([0.6, 0, 0.8], jnp.float32), (n, 3))
    a = jnp.full((n, 2), 0.5, jnp.float32)
    w_o, weight, pdf = el.conductor_sample_lut(_ones_fresnel, w_i, a, rnd)
    est = float(np.asarray(weight)[:, 0].mean())
    assert abs(est - 1.0) < 0.02, est  # F=1 furnace via sampling

  @pytest.mark.parametrize("alpha", [0.05, 0.1, 0.25])
  def test_sampled_furnace_small_alpha(self, alpha):
    # sampling-based white furnace for lobes too narrow for grid quadrature
    n = 1 << 16
    rs = np.random.RandomState(13)
    rnd = jnp.asarray(rs.uniform(size=(n, 7)).astype(np.float32))
    w_i = jnp.broadcast_to(jnp.asarray([0.3, 0, 0.954], jnp.float32), (n, 3))
    a = jnp.full((n, 2), alpha, jnp.float32)
    _, weight, _ = el.conductor_sample_lut(_ones_fresnel, w_i, a, rnd)
    est = float(np.asarray(weight)[:, 0].mean())
    assert abs(est - 1.0) < 0.03, est


# ---------------------------------------------------------------------------
# Round-5 extension: LUT backends for the dielectric and plastic hot paths
# (reference semantics bsdf_external.hxx:466-578 eval_dielectric and
# bsdf_plastic.hxx:14-36) — walk stays the anchor via MS_BACKEND="walk".
# ---------------------------------------------------------------------------

import dataclasses as _dc

from etx_tracer_tpu.render.bsdf import dispatch, lobes
from etx_tracer_tpu.scene.builder import MaterialDesc, SceneBuilder
from etx_tracer_tpu.scene.types import MaterialClass as MC


def _make_scene(mat_desc):
  b = SceneBuilder()
  white = b.add_rgb_reflectance([1.0, 1.0, 1.0])
  if mat_desc.scattering_spec == -1:
    mat_desc.scattering_spec = white
  if mat_desc.reflectance_spec == -1:
    mat_desc.reflectance_spec = white
  mi = b.add_material(mat_desc)
  b.add_mesh(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
             np.array([[0, 1, 2]], np.int32), mi)
  return b.build()


def _sd(scene, n, mu_i=0.8, seed=3):
  import jax
  si = float(np.sqrt(1.0 - mu_i * mu_i))
  w_i = np.tile([si, 0.0, -mu_i], (n, 1)).astype(np.float32)
  nrm = np.tile([0.0, 0.0, 1.0], (n, 1)).astype(np.float32)
  tan = np.tile([1.0, 0.0, 0.0], (n, 1)).astype(np.float32)
  btn = np.tile([0.0, 1.0, 0.0], (n, 1)).astype(np.float32)
  mat = jax.tree_util.tree_map(
      lambda a: jnp.broadcast_to(a[0], (n,) + a.shape[1:]), scene.materials)
  return lobes.ShadingData(
      w_i=jnp.asarray(w_i), nrm=jnp.asarray(nrm), tan=jnp.asarray(tan),
      btn=jnp.asarray(btn), geo_n=jnp.asarray(nrm),
      tex=jnp.zeros((n, 2)), wl=jnp.zeros(n),
      medium=jnp.full(n, -1, jnp.int32), mat=mat)


def _sample_total(scene, sd, n, sampler, seed):
  """Mean sampled ENERGY: the 1/eta^2 radiance-compression factor on
  transmission lanes (camera-path convention, carried in BSDFSampleR.eta)
  is undone so a lossless interface sums to 1."""
  rs = np.random.RandomState(seed)
  rnd = jnp.asarray(
      rs.uniform(size=(n, dispatch.NUM_SAMPLE_RND)).astype(np.float32))
  s = sampler(scene, sd, rnd, False)
  w = np.asarray(s.weight)[:, 0] * np.asarray(s.eta) ** 2
  assert np.isfinite(w).all()
  return float(w.mean())


class TestDielectricLut:
  def _scene(self, alpha):
    return _make_scene(MaterialDesc(cls=MC.Dielectric,
                                    roughness=(alpha, alpha)))

  @pytest.mark.parametrize("alpha,mu_i", [(0.3, 0.8), (0.6, 0.5)])
  def test_energy_compensation_closes(self, alpha, mu_i, monkeypatch):
    """Rough glass with unit reflectance/scattering: total sampled energy
    must come back near 1 with the LUT compensation, and clearly exceed
    the raw single-scatter albedo E(mu_i)."""
    scene, _ = self._scene(alpha)
    n = 1 << 15
    sd = _sd(scene, n, mu_i)
    monkeypatch.setattr(lobes, "MS_BACKEND", "lut")
    total = _sample_total(scene, sd, n, lobes.dielectric_sample, seed=21)
    # raw single scatter loses 1-E(mu_i); compensation must close the gap
    assert abs(total - 1.0) < 0.08, total

  @pytest.mark.parametrize("alpha,mu_i", [(0.3, 0.8), (0.6, 0.5)])
  def test_total_energy_tracks_walk(self, alpha, mu_i, monkeypatch):
    scene, _ = self._scene(alpha)
    n = 1 << 15
    sd = _sd(scene, n, mu_i)
    monkeypatch.setattr(lobes, "MS_BACKEND", "lut")
    t_lut = _sample_total(scene, sd, n, lobes.dielectric_sample, seed=22)
    monkeypatch.setattr(lobes, "MS_BACKEND", "walk")
    t_walk = _sample_total(scene, sd, n, lobes.dielectric_sample, seed=23)
    assert abs(t_lut - t_walk) < 0.06, (t_lut, t_walk)

  def test_sample_density_matches_eval(self, monkeypatch):
    """Sample<->eval consistency without reconstructing the density by
    hand: for BSDF sampling with weight = f/p, the binned mean of sampled
    weights estimates the integral of f over each bin. Compare against a
    quadrature of dielectric_evaluate on the same bins (both hemispheres,
    so the transmission jacobian is exercised too)."""
    scene, _ = self._scene(0.45)
    mu_i = 0.7
    n = 1 << 18
    sd = _sd(scene, n, mu_i)
    monkeypatch.setattr(lobes, "MS_BACKEND", "lut")
    rs = np.random.RandomState(31)
    rnd = jnp.asarray(
        rs.uniform(size=(n, dispatch.NUM_SAMPLE_RND)).astype(np.float32))
    s = lobes.dielectric_sample(scene, sd, rnd, False)
    wo = np.asarray(s.w_o)
    w = np.asarray(s.weight)[:, 0]

    # bins over cos(theta_o) in [-1, 1] (azimuth integrated out)
    n_bins = 16
    bi = np.clip(((wo[:, 2] + 1.0) * 0.5 * n_bins).astype(int), 0, n_bins - 1)
    est = np.zeros(n_bins)
    np.add.at(est, bi, w)
    est /= n  # estimates int_bin f dw

    # quadrature of eval over each bin
    n_mu, n_phi = 24, 32
    want = np.zeros(n_bins)
    sd1 = _sd(scene, n_mu * n_phi, mu_i)
    for b in range(n_bins):
      mu_lo = -1.0 + 2.0 * b / n_bins
      mus = mu_lo + (np.arange(n_mu) + 0.5) * (2.0 / n_bins / n_mu)
      phis = (np.arange(n_phi) + 0.5) * (2 * np.pi / n_phi)
      mg, pg = np.meshgrid(mus, phis, indexing="ij")
      so = np.sqrt(np.maximum(1 - mg**2, 0.0))
      w_o = np.stack([so * np.cos(pg), so * np.sin(pg), mg],
                     -1).reshape(-1, 3).astype(np.float32)
      bsdf, _ = lobes.dielectric_evaluate(scene, sd1, jnp.asarray(w_o), False)
      want[b] = (np.asarray(bsdf)[:, 0].mean()
                 * (2.0 / n_bins) * (2 * np.pi))
    # compare where the lobe carries real mass (bins at the TIR critical
    # angle hold ~0.02% of the energy and get no samples at this n)
    sel = want > 0.05 * want.max()
    assert sel.sum() >= 3
    np.testing.assert_allclose(est[sel], want[sel], rtol=0.12)


class TestPlasticLut:
  def _scene(self, alpha):
    return _make_scene(MaterialDesc(cls=MC.Plastic,
                                    roughness=(alpha, alpha)))

  @pytest.mark.parametrize("alpha,mu_i", [(0.35, 0.8), (0.7, 0.4)])
  def test_energy_bounded_and_tracks_walk(self, alpha, mu_i, monkeypatch):
    scene, _ = self._scene(alpha)
    n = 1 << 15
    sd = _sd(scene, n, mu_i)
    monkeypatch.setattr(lobes, "MS_BACKEND", "lut")
    t_lut = _sample_total(scene, sd, n, lobes.plastic_sample, seed=41)
    assert 0.0 < t_lut <= 1.0 + 0.02, t_lut
    monkeypatch.setattr(lobes, "MS_BACKEND", "walk")
    t_walk = _sample_total(scene, sd, n, lobes.plastic_sample, seed=42)
    assert abs(t_lut - t_walk) < 0.06, (t_lut, t_walk)

  def test_sample_weight_is_eval_over_pdf(self, monkeypatch):
    """plastic_sample computes weight = eval/pdf by construction; pin it."""
    scene, _ = self._scene(0.5)
    n = 4096
    sd = _sd(scene, n, 0.7)
    monkeypatch.setattr(lobes, "MS_BACKEND", "lut")
    rs = np.random.RandomState(43)
    rnd = jnp.asarray(
        rs.uniform(size=(n, dispatch.NUM_SAMPLE_RND)).astype(np.float32))
    s = lobes.plastic_sample(scene, sd, rnd, False)
    bsdf, pdf = lobes.plastic_evaluate(scene, sd, s.w_o, False)
    ok = np.asarray(pdf) > 1e-4
    want = np.asarray(bsdf)[ok] / np.asarray(pdf)[ok][:, None]
    np.testing.assert_allclose(np.asarray(s.weight)[ok], want, rtol=1e-3,
                               atol=1e-5)
