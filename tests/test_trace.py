"""Intersection tests: brute-force vs BVH agreement, correctness."""

import jax.numpy as jnp
import numpy as np

from etx_tracer_tpu.ops import bvh_build, trace
from etx_tracer_tpu.scene.types import BVH


def _random_tris(n, seed=0):
  rs = np.random.RandomState(seed)
  v0 = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
  e1 = rs.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
  e2 = rs.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
  return v0, e1, e2


def _random_rays(n, seed=1):
  rs = np.random.RandomState(seed)
  o = rs.uniform(-2, 2, (n, 3)).astype(np.float32)
  d = rs.normal(size=(n, 3)).astype(np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  return jnp.asarray(o), jnp.asarray(d)


class TestIntersect:
  def test_single_triangle(self):
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    e1 = jnp.array([[1.0, 0.0, 0.0]])
    e2 = jnp.array([[0.0, 1.0, 0.0]])
    o = jnp.array([[0.2, 0.2, 1.0], [2.0, 2.0, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    hit = trace.intersect_brute(v0, e1, e2, o, d,
                                jnp.zeros(2), jnp.full(2, 1e30))
    assert bool(hit.found[0]) and not bool(hit.found[1])
    np.testing.assert_allclose(hit.t[0], 1.0, atol=1e-5)
    np.testing.assert_allclose([hit.u[0], hit.v[0]], [0.2, 0.2], atol=1e-5)

  def test_tmin_tmax_respected(self):
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    e1 = jnp.array([[1.0, 0.0, 0.0]])
    e2 = jnp.array([[0.0, 1.0, 0.0]])
    o = jnp.array([[0.2, 0.2, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = trace.intersect_brute(v0, e1, e2, o, d, jnp.array([1.5]), jnp.array([2.0]))
    assert not bool(hit.found[0])
    hit = trace.intersect_brute(v0, e1, e2, o, d, jnp.array([0.0]), jnp.array([0.5]))
    assert not bool(hit.found[0])

  def test_bvh_matches_brute(self):
    v0, e1, e2 = _random_tris(300)
    o, d = _random_rays(500)
    t_min = jnp.zeros(500)
    t_max = jnp.full(500, 1e30)
    brute = trace.intersect_brute(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), o, d, t_min, t_max)
    arr = bvh_build.build_bvh(v0, e1, e2)
    bvh = BVH(jnp.asarray(arr["node_min"]), jnp.asarray(arr["node_max"]),
              jnp.asarray(arr["node_left"]), jnp.asarray(arr["node_count"]),
              jnp.asarray(arr["prim_index"]))
    bv = trace.intersect_bvh(bvh, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2), o, d, t_min, t_max)
    np.testing.assert_array_equal(np.asarray(brute.found), np.asarray(bv.found))
    # same hit distances (triangle index may differ on exact ties)
    ft = np.asarray(brute.t)
    bt = np.asarray(bv.t)
    mask = np.asarray(brute.found)
    np.testing.assert_allclose(ft[mask], bt[mask], rtol=1e-4, atol=1e-5)

  def test_bvh_builder_structure(self):
    v0, e1, e2 = _random_tris(64)
    arr = bvh_build.build_bvh(v0, e1, e2)
    counts = arr["node_count"]
    # leaves cover all prims exactly once
    assert sorted(arr["prim_index"].tolist()) == list(range(64))
    # inner nodes have valid right children
    inner = counts == 0
    assert (arr["node_left"][inner] > 0).all()
