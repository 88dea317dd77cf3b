"""Volumetric media tests: phase function, transmittance, fog renders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etx_tracer_tpu.core import rng
from etx_tracer_tpu.render import media
from etx_tracer_tpu.scene import cornell


class TestPhase:
  def test_hg_normalization(self):
    # integral of phase over sphere == 1 for several g
    rs = np.random.RandomState(0)
    n = 200000
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    w_i = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    for g in (0.0, 0.4, -0.6):
      p = media.phase_hg(w_i, jnp.asarray(d), jnp.full(n, g))
      est = float(jnp.mean(p) * 4.0 * np.pi)
      assert abs(est - 1.0) < 0.02, g

  def test_hg_sampling_matches_pdf_mean_cos(self):
    # E[cos theta] for HG = g
    rs = np.random.RandomState(1)
    n = 200000
    rnd = jnp.asarray(rs.uniform(size=(n, 2)).astype(np.float32))
    w_i = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    for g in (0.3, -0.5):
      w_o = media.sample_phase_hg(w_i, jnp.full(n, g), rnd)
      # reference convention: w_i points INTO the scatter point, so forward
      # scattering means dot(w_o, w_i) ~ +g with their sign convention
      mean_cos = float(jnp.mean(jnp.sum(w_o * (-w_i), axis=-1)))
      assert abs(mean_cos - (-g)) < 0.01 or abs(mean_cos - g) < 0.01

  def test_spectrum_component_distribution(self):
    albedo = jnp.broadcast_to(jnp.array([0.2, 0.3, 0.5]), (100000, 3))
    thr = jnp.ones((100000, 3))
    rs = np.random.RandomState(2)
    rnd = jnp.asarray(rs.uniform(size=100000).astype(np.float32))
    ch, pdf = media.sample_spectrum_component(albedo, thr, rnd, False)
    counts = np.bincount(np.asarray(ch), minlength=3) / 100000
    np.testing.assert_allclose(counts, [0.2, 0.3, 0.5], atol=0.01)


class TestMediumSampling:
  def _fog_view(self, sigma_s, n, g=0.0):
    scene, config = cornell.build_cornell_box(
        film_size=(8, 8), diffuse_only=True, max_path_length=4,
        fog_scattering=sigma_s).build()
    mv = media.gather_medium(scene, jnp.zeros(n, jnp.int32), jnp.zeros(n), False)
    return scene, mv

  def test_homogeneous_free_path_distribution(self):
    n = 100000
    scene, mv = self._fog_view(0.5, n)
    sigma = float(np.asarray(mv.extinction)[0].max())
    state = rng.seed(jnp.arange(n, dtype=jnp.uint32), jnp.zeros(n, jnp.uint32))
    pos = jnp.zeros((n, 3))
    d = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (n, 3))
    ms, state = media.sample_medium(scene, mv, jnp.zeros(n), jnp.ones((n, 3)),
                                    state, pos, d, jnp.full(n, 1e6), False)
    # all scatter (infinite segment), mean free path = 1/sigma per channel MIS
    assert bool(jnp.all(ms.sampled))
    # unbiasedness: E[weight * f(t)] should integrate scattering; check
    # weight finite and positive
    w = np.asarray(ms.weight)
    assert np.isfinite(w).all() and (w >= 0).all()

  def test_homogeneous_transmittance_analytic(self):
    n = 1024
    scene, mv = self._fog_view(0.8, n)
    state = rng.seed(jnp.arange(n, dtype=jnp.uint32), jnp.zeros(n, jnp.uint32))
    pos = jnp.zeros((n, 3))
    d = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (n, 3))
    dist = jnp.full(n, 2.0)
    tr, state = media.transmittance(scene, mv, jnp.zeros(n), state, pos, d, dist, False)
    ext = np.asarray(mv.extinction)[0]
    np.testing.assert_allclose(np.asarray(tr)[0], np.exp(-2.0 * ext), rtol=1e-4)

  def test_heterogeneous_transmittance_mc(self):
    """Delta-tracked transmittance through a uniform grid ~ analytic."""
    n = 20000
    grid = np.ones((4, 4, 4), np.float32)
    scene, config = cornell.build_cornell_box(
        film_size=(8, 8), diffuse_only=True, max_path_length=4,
        fog_scattering=0.6, fog_grid=grid).build()
    mv = media.gather_medium(scene, jnp.zeros(n, jnp.int32), jnp.zeros(n), False)
    state = rng.seed(jnp.arange(n, dtype=jnp.uint32), jnp.zeros(n, jnp.uint32))
    pos = jnp.broadcast_to(jnp.array([-0.9, 1.0, 0.0]), (n, 3))
    d = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (n, 3))
    dist = jnp.full(n, 1.8)
    tr, state = media.transmittance(scene, mv, jnp.zeros(n), state, pos, d, dist, False)
    got = float(np.asarray(tr).mean())
    # ratio tracking with binary density=1: survival prob exp(-max_sigma*L)
    want = float(np.exp(-np.asarray(mv.max_sigma)[0] * 1.8))
    assert abs(got - want) < 0.05 * max(want, 0.02)


class TestFogRender:
  def test_fog_changes_image(self):
    clear, cfg1 = cornell.build_cornell_box(film_size=(24, 24), diffuse_only=True,
                                            max_path_length=6).build()
    foggy, cfg2 = cornell.build_cornell_box(film_size=(24, 24), diffuse_only=True,
                                            max_path_length=6, fog_scattering=1.0).build()
    assert cfg2.has_media and not cfg1.has_media
    from etx_tracer_tpu.models import path_tracing
    from etx_tracer_tpu.render import film as film_mod
    img_clear = np.asarray(film_mod.result_image(path_tracing.render(clear, cfg1, iterations=4)))
    img_fog = np.asarray(film_mod.result_image(path_tracing.render(foggy, cfg2, iterations=4)))
    assert np.isfinite(img_fog).all()
    assert img_fog.mean() > 0.001
    diff = np.abs(img_fog - img_clear).mean()
    assert diff > 0.005  # fog visibly changes transport


class TestSubsurface:
  def test_remap_properties(self):
    from etx_tracer_tpu.render import subsurface as sss
    import jax.numpy as jnp
    color = jnp.array([[0.0, 0.5, 1.0]])
    dist = jnp.array([[0.1, 0.1, 0.1]])
    albedo, ext, scat = sss.remap(color, dist)
    a = np.asarray(albedo)[0]
    assert a[0] == 0.0 and a[1] > 0.0 and a[2] > a[1]
    assert (a < 1.0).all()
    np.testing.assert_allclose(np.asarray(ext)[0], 10.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(scat), np.asarray(ext) * np.asarray(albedo), rtol=1e-5)

  def test_sss_render(self):
    import dataclasses as dc
    from etx_tracer_tpu.core import spectrum as sp
    from etx_tracer_tpu.models import path_tracing
    from etx_tracer_tpu.render import film as film_mod
    from etx_tracer_tpu.scene import types as st

    b = cornell.build_cornell_box(film_size=(24, 24), diffuse_only=True, max_path_length=6)
    gi = b.material_names["gray"]
    dist = b.add_spectrum(sp.SpectralDistribution.rgb_reflectance([0.3, 0.1, 0.05]))
    b.materials[gi] = dc.replace(b.materials[gi],
                                 subsurface_cls=st.SubsurfaceClass.RandomWalk,
                                 subsurface_spec=dist)
    scene, config = b.build()
    assert config.has_subsurface
    fs = path_tracing.render(scene, config, iterations=4)
    img = np.asarray(film_mod.result_image(fs))
    assert np.isfinite(img).all()
    assert img.mean() > 0.01

    b2 = cornell.build_cornell_box(film_size=(24, 24), diffuse_only=True, max_path_length=6)
    scene2, config2 = b2.build()
    fs2 = path_tracing.render(scene2, config2, iterations=4)
    img2 = np.asarray(film_mod.result_image(fs2))
    assert np.abs(img - img2).mean() > 0.003  # SSS visibly changes the boxes


class TestSubsurfaceCB:
  """Christensen-Burley disk gather (scene_bssrdf_subsurface.hxx:89-145)."""

  @pytest.mark.slow
  def test_cb_matches_rw_brightness(self):
    import dataclasses as dc
    from etx_tracer_tpu.scene import cornell
    from etx_tracer_tpu.scene import types as st
    from etx_tracer_tpu.models import path_tracing
    from etx_tracer_tpu.render import film as film_mod
    from etx_tracer_tpu.core import spectrum as sp

    def render(cls):
      b = cornell.build_cornell_box(film_size=(16, 16), diffuse_only=True,
                                    max_path_length=5)
      fi = b.material_names["white"]
      d = b.add_spectrum(sp.SpectralDistribution.rgb_reflectance([0.5, 0.3, 0.1]))
      b.materials[fi] = dc.replace(b.materials[fi], subsurface_cls=cls,
                                   subsurface_spec=d)
      scene, config = b.build()
      fs = path_tracing.render(scene, config, iterations=6)
      return np.asarray(film_mod.result_image(fs))

    cb = render(st.SubsurfaceClass.ChristensenBurley)
    rw = render(st.SubsurfaceClass.RandomWalk)
    assert np.isfinite(cb).all() and np.isfinite(rw).all()
    assert cb.mean() > 0 and rw.mean() > 0
    # the two estimators integrate the same transport; means agree loosely
    ratio = cb.mean() / rw.mean()
    assert 0.6 < ratio < 1.7, ratio

  def test_sample_s_r_distribution(self):
    from etx_tracer_tpu.render import subsurface as sss
    rs = np.random.RandomState(0)
    u = jnp.asarray(rs.uniform(size=20000).astype(np.float32))
    r = np.asarray(sss._sample_s_r(u))
    assert np.isfinite(r).all() and (r >= 0).all()
    # CDF(1) for the Burley mixture: 0.25 weight on exp(1), 0.75 on exp(1/3)
    frac = (r < 1.0).mean()
    expect = 0.25 * (1 - np.exp(-1.0)) + 0.75 * (1 - np.exp(-1.0 / 3.0))
    assert abs(frac - expect) < 0.02
