"""Adaptive sampling for VCM/BDPT (film.cxx:233-330,434-459).

The reference's film-level active-pixel skipping serves every CPU
integrator; here the VCM camera pass inherits it: converged pixels start
their lanes dead (dropped by the first compaction cascade), their running
means and per-pixel tallies freeze, and the light pass keeps splatting
everywhere.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from etx_tracer_tpu.models import vcm
from etx_tracer_tpu.render import film as film_mod
from etx_tracer_tpu.scene import cornell


def _scene():
  return cornell.build_cornell_box(film_size=(16, 16), diffuse_only=True,
                                   max_path_length=4).build()


class TestMaskedAccumulate:
  def test_inactive_pixels_freeze(self):
    fs = film_mod.allocate(4, 4)
    counts = jnp.full((4, 4), 2.0)
    fs = fs._replace(camera=jnp.ones((4, 4, 3)),
                     iteration=jnp.asarray(2, jnp.int32))
    active = jnp.zeros((4, 4), bool).at[1, 1].set(True)
    colors = jnp.full((4, 4, 3), 4.0)
    out, new_counts = film_mod.accumulate_camera_masked(fs, colors, counts,
                                                        active)
    # active pixel folds the sample: 1 + (4-1)/3 = 2
    assert np.allclose(out.camera[1, 1], 2.0)
    # frozen pixels keep their mean and tally
    assert np.allclose(out.camera[0, 0], 1.0)
    assert float(new_counts[1, 1]) == 3.0
    assert float(new_counts[0, 0]) == 2.0
    assert int(out.iteration) == 3

  def test_matches_uniform_accumulator_when_all_active(self):
    fs_a = film_mod.allocate(4, 4)
    fs_b = film_mod.allocate(4, 4)
    counts = jnp.zeros((4, 4))
    rng = np.random.default_rng(7)
    for i in range(5):
      colors = jnp.asarray(rng.uniform(size=(4, 4, 3)), jnp.float32)
      z = jnp.zeros((4, 4, 3))
      fs_a = film_mod.accumulate_camera(fs_a, colors, z, z)
      fs_b, counts = film_mod.accumulate_camera_masked(
          fs_b, colors, counts, jnp.ones((4, 4), bool))
    assert np.allclose(fs_a.camera, fs_b.camera, atol=1e-6)
    assert np.allclose(fs_a.variance_half, fs_b.variance_half, atol=1e-6)


class TestDilate:
  def test_dilation_grows_blocks(self):
    m = jnp.zeros((9, 9), bool).at[4, 4].set(True)
    d = film_mod.dilate_mask(m, k=5)
    assert bool(d[2, 2]) and bool(d[6, 6])
    assert not bool(d[1, 4]) and not bool(d[4, 1])


class TestAdaptiveVCM:
  def test_adaptive_matches_uniform_until_convergence(self):
    """With a huge threshold nothing converges after warmup -> one masked
    iteration with an all-dead mask stops the run; with threshold 0 the
    adaptive path reproduces the uniform render exactly."""
    scene, config = _scene()
    opts = vcm.VCMOptions()

    cfg0 = dataclasses.replace(config, noise_threshold=0.0, samples=4)
    fs_u = vcm.render(scene, cfg0, options=opts, iterations=4)
    fs_a, counts = vcm.render_adaptive(scene, cfg0, options=opts,
                                       max_iterations=4, min_samples=2)
    assert np.allclose(np.asarray(fs_u.camera), np.asarray(fs_a.camera),
                       atol=1e-5)
    assert np.allclose(np.asarray(fs_u.light), np.asarray(fs_a.light),
                       atol=1e-5)
    assert np.all(np.asarray(counts) == 4.0)

  def test_adaptive_stops_when_converged(self):
    scene, config = _scene()
    cfg = dataclasses.replace(config, noise_threshold=1e6, samples=8)
    fs, counts = vcm.render_adaptive(scene, cfg, options=vcm.VCMOptions(),
                                     max_iterations=8, min_samples=2)
    # warmup only: every pixel converged immediately at the absurd threshold
    assert np.all(np.asarray(counts) == 2.0)
    assert int(fs.iteration) == 2
