"""Sorted tile dispatch must agree with masked dispatch lane-for-lane.

The sorted path (dispatch._sample_sorted/_evaluate_sorted) permutes lanes by
material class, runs per-tile lax.switch, and inverse-permutes; every lane
sees the same lobe with the same inputs, so outputs must match the masked
path to float tolerance (op order inside a lobe is identical; only
surrounding fusion differs).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from etx_tracer_tpu.render.bsdf import dispatch, lobes
from etx_tracer_tpu.scene.types import MaterialClass as MC
from etx_tracer_tpu.scene import cornell


@pytest.fixture(scope="module")
def scene_multi():
  from benchmarks import scenes
  scene, config = scenes.materials((32, 32), spectral=False).build()
  return scene, config


def _shading_data(scene, config, r, seed=0):
  rs = np.random.RandomState(seed)

  def unit(n):
    v = rs.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)

  nrm = unit(r)
  tan = unit(r)
  tan -= nrm * np.sum(tan * nrm, axis=1, keepdims=True)
  tan /= np.linalg.norm(tan, axis=1, keepdims=True)
  btn = np.cross(nrm, tan)
  w_i = unit(r)

  n_mat = int(scene.materials.cls.shape[0])
  rows = rs.randint(0, n_mat, r)
  import jax
  mat = jax.tree_util.tree_map(lambda a: a[jnp.asarray(rows)], scene.materials)
  return lobes.ShadingData(
      w_i=jnp.asarray(w_i), nrm=jnp.asarray(nrm), tan=jnp.asarray(tan),
      btn=jnp.asarray(btn), geo_n=jnp.asarray(nrm),
      tex=jnp.asarray(rs.rand(r, 2).astype(np.float32)),
      wl=jnp.full(r, 550.0), medium=jnp.full(r, -1, jnp.int32), mat=mat)


def _tree_close(a, b, atol):
  import jax
  for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
    na, nb = np.asarray(la), np.asarray(lb)
    if na.dtype == bool or np.issubdtype(na.dtype, np.integer):
      assert np.array_equal(na, nb)
    else:
      fa, fb = np.nan_to_num(na, nan=0.0), np.nan_to_num(nb, nan=0.0)
      assert np.allclose(fa, fb, atol=atol, rtol=1e-4), (
          float(np.abs(fa - fb).max()))


def test_sample_sorted_matches_masked(scene_multi, monkeypatch):
  scene, config = scene_multi
  r = 4096
  monkeypatch.setattr(dispatch, "SORTED_MIN_WIDTH", r)  # enable sorted path
  sd = _shading_data(scene, config, r)
  rs = np.random.RandomState(1)
  rnd = jnp.asarray(rs.rand(r, dispatch.NUM_SAMPLE_RND).astype(np.float32))
  classes = config.material_classes
  assert dispatch._sorted_tile(r, classes) > 0

  out_sorted = dispatch.sample(scene, sd, rnd, False, classes)
  out_masked = dispatch._sample_masked(scene, sd, rnd, False, classes)
  _tree_close(out_sorted, out_masked, atol=1e-5)


def test_evaluate_sorted_matches_masked(scene_multi, monkeypatch):
  scene, config = scene_multi
  r = 4096
  monkeypatch.setattr(dispatch, "SORTED_MIN_WIDTH", r)  # enable sorted path
  sd = _shading_data(scene, config, r, seed=3)
  rs = np.random.RandomState(4)
  w_o = rs.normal(size=(r, 3)).astype(np.float32)
  w_o /= np.linalg.norm(w_o, axis=1, keepdims=True)
  w_o = jnp.asarray(w_o)
  classes = config.material_classes

  b_s, p_s = dispatch.evaluate(scene, sd, w_o, False, classes)
  b_m, p_m = dispatch._evaluate_masked(scene, sd, w_o, False, classes)
  _tree_close((b_s, p_s), (b_m, p_m), atol=1e-5)


def test_sorted_tile_gating(monkeypatch):
  classes = (MC.Diffuse, MC.Conductor)
  assert dispatch._sorted_tile(262144, classes) == 0        # disabled by default
  monkeypatch.setattr(dispatch, "SORTED_MIN_WIDTH", 32768)
  assert dispatch._sorted_tile(1024, classes) == 0          # too narrow
  assert dispatch._sorted_tile(262144, (MC.Diffuse,)) == 0  # single class
  t = dispatch._sorted_tile(262144, classes)
  assert t > 0 and 262144 % t == 0


def test_class_perm_is_permutation():
  cls = jnp.asarray(np.random.RandomState(0).randint(0, 12, 512), jnp.int32)
  classes = (MC.Diffuse, MC.Conductor, MC.Dielectric)
  perm, pos, k = dispatch._class_perm(cls, classes)
  perm = np.asarray(perm)
  pos = np.asarray(pos)
  assert sorted(perm.tolist()) == list(range(512))
  assert np.array_equal(perm[pos], np.arange(512))
  # sorted keys are non-decreasing
  ks = np.asarray(k)[perm]
  assert np.all(np.diff(ks) >= 0)
