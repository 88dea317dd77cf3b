"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates the PARITY claim that the sharded render path matches the
single-device renderer: per-pixel RNG seeds are global, so each device
band reproduces exactly the rows the single-device pass renders.
"""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def mesh_setup():
  if len(jax.devices()) < 8:
    pytest.skip("needs 8 virtual devices (conftest XLA_FLAGS)")
  from etx_tracer_tpu import parallel
  from etx_tracer_tpu.scene import cornell
  b = cornell.build_cornell_box(film_size=(16, 16), diffuse_only=True,
                                max_path_length=4)
  scene, config = b.build()
  mesh = parallel.make_mesh(jax.devices()[:8])
  return scene, config, mesh


def test_sharded_matches_single_device(mesh_setup):
  from etx_tracer_tpu import parallel
  from etx_tracer_tpu.models import path_tracing
  from etx_tracer_tpu.render import film as film_mod

  scene, config, mesh = mesh_setup
  w, h = config.film_width, config.film_height

  fs_single = film_mod.allocate(w, h)
  fs_single = path_tracing.render_iteration(scene, config, fs_single, 0)
  single = np.asarray(fs_single.camera)

  scene_r = parallel.mesh.replicate_scene(scene, mesh)
  fs = parallel.mesh.shard_film(film_mod.allocate(w, h), mesh)
  fs = parallel.render_iteration_sharded(scene_r, config, fs, 0, mesh)
  sharded = np.asarray(fs.camera)

  assert np.isfinite(sharded).all()
  np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)


def test_sharded_second_iteration_accumulates(mesh_setup):
  from etx_tracer_tpu import parallel
  from etx_tracer_tpu.render import film as film_mod

  scene, config, mesh = mesh_setup
  w, h = config.film_width, config.film_height
  scene_r = parallel.mesh.replicate_scene(scene, mesh)
  fs = parallel.mesh.shard_film(film_mod.allocate(w, h), mesh)
  fs = parallel.render_iteration_sharded(scene_r, config, fs, 0, mesh)
  it1 = np.asarray(fs.camera).copy()
  fs = parallel.render_iteration_sharded(scene_r, config, fs, 1, mesh)
  it2 = np.asarray(fs.camera)
  assert int(np.asarray(fs.iteration)) == 2
  assert np.isfinite(it2).all()
  assert not np.allclose(it1, it2)  # second sample changed the mean
