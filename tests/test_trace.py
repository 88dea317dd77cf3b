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

  def test_bvh_skip_offsets(self):
    """Skip offsets define a valid DFS-stream order: skip[i] > i, leaves
    skip to i+1, inner skips bound their subtree, and a full stream walk
    (always descend) visits every node exactly once."""
    import numpy as np
    v0, e1, e2 = _random_tris(200)
    arr = bvh_build.build_bvh(v0, e1, e2)
    skip, left, count = arr["node_skip"], arr["node_left"], arr["node_count"]
    n = len(skip)
    assert (skip > np.arange(n)).all()
    leaves = count > 0
    assert (skip[leaves] == np.arange(n)[leaves] + 1).all()
    inner = ~leaves
    # left subtree = [i+1, right), right subtree = [right, skip[i])
    assert (left[inner] > np.arange(n)[inner]).all()
    assert (skip[inner] >= left[inner]).all()
    assert (skip[left[inner]] <= skip[inner]).all() if inner.any() else True
    # stream walk visiting every node: descend inner, skip after leaf
    i, visited = 0, 0
    while i < n:
      visited += 1
      i = i + 1 if count[i] == 0 else skip[i]
    assert visited == n

  def test_fat_rows_structure(self):
    """Fat-node stream invariants: every leaf consumed exactly once on a
    full walk; numpy fat-stream tracer agrees with the exhaustive scan."""
    import numpy as np
    v0, e1, e2 = _random_tris(300)
    arr = bvh_build.build_bvh(v0, e1, e2)
    fat = arr["fat_rows"]
    assert fat is not None
    prim, count = arr["prim_index"], arr["node_count"]
    ni = fat.shape[0]

    # walk descending everywhere: collected leaf ranges == all tree leaves
    leaves = []
    i = 0
    visited = 0
    while i < ni:
      visited += 1
      lf, rf = int(fat[i, 12]), int(fat[i, 13])
      cpack = int(fat[i, 14])
      lc, rc = cpack // 32, cpack % 32
      if lc > 0:
        leaves.append((lf, lc))
      if rc > 0:
        leaves.append((rf, rc))
      i = i + 1 if lc == 0 else (rf if rc == 0 else int(fat[i, 15]))
    assert visited == ni
    ref_leaves = sorted((int(arr["node_left"][j]), int(count[j]))
                        for j in range(len(count)) if count[j] > 0)
    assert sorted(leaves) == ref_leaves

    # numpy fat tracer vs scan on a few rays
    rs = np.random.RandomState(5)
    R = 24
    o = rs.randn(R, 3).astype(np.float32) * 2
    d = rs.randn(R, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ref = trace.intersect_scan(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
                               jnp.asarray(o), jnp.asarray(d),
                               jnp.zeros(R), jnp.full(R, 100.0))
    rt = np.asarray(ref.t)

    def slab_hit(mn, mx, o1, iv, par, tmin, tmax):
      t0 = (mn - o1) * iv
      t1 = (mx - o1) * iv
      lo = np.minimum(t0, t1)
      hi = np.maximum(t0, t1)
      inside = (o1 >= mn) & (o1 <= mx)
      lo = np.where(par, np.where(inside, -3e38, 3e38), lo)
      hi = np.where(par, np.where(inside, 3e38, -3e38), hi)
      return max(lo.max(), tmin) <= min(hi.min(), tmax) * 1.0000002 + 1e-7

    def fat_one(o1, d1, tmin=0.0, tmax=100.0):
      iv = 1.0 / np.where(np.abs(d1) < 1e-20,
                          np.where(d1 < 0, -1e-20, 1e-20), d1)
      par = np.abs(d1) < 1e-12
      i, bt = 0, np.inf
      while i < ni:
        row = fat[i]
        hitL = slab_hit(row[0:3], row[3:6], o1, iv, par, tmin, min(tmax, bt))
        hitR = slab_hit(row[6:9], row[9:12], o1, iv, par, tmin, min(tmax, bt))
        lf, rf = int(row[12]), int(row[13])
        cpack = int(row[14])
        lc, rc = cpack // 32, cpack % 32
        for first, n_tris, h in ((lf, lc, hitL), (rf, rc, hitR)):
          if n_tris == 0 or not h:
            continue
          for k in range(n_tris):
            orig = prim[first + k]
            vv0, ee1, ee2 = v0[orig], e1[orig], e2[orig]
            px = np.cross(d1, ee2)
            det = px @ ee1
            if abs(det) <= 1e-9:
              continue
            inv = 1.0 / det
            tx = o1 - vv0
            u = tx @ px * inv
            q = np.cross(tx, ee1)
            w = q @ d1 * inv
            t = q @ ee2 * inv
            if u >= 0 and w >= 0 and u + w <= 1 and tmin <= t <= tmax and t < bt:
              bt = t
        if hitL and lc == 0:
          i = i + 1
        elif hitR and rc == 0:
          i = rf
        else:
          i = int(row[15])
      return bt

    for j in range(R):
      ft = fat_one(o[j], d[j])
      assert np.isclose(min(rt[j], 1e9), min(ft, 1e9), rtol=1e-4), (j, rt[j], ft)

  def test_stream_traversal_matches_scan(self):
    """Numpy model of the Pallas DFS-stream kernel (skip walk + robust
    parallel-axis slabs) agrees with the exhaustive scan."""
    import numpy as np
    v0, e1, e2 = _random_tris(300)
    arr = bvh_build.build_bvh(v0, e1, e2)
    nmin, nmax = arr["node_min"], arr["node_max"]
    left, count = arr["node_left"], arr["node_count"]
    skip, prim = arr["node_skip"], arr["prim_index"]
    n = len(left)
    rs = np.random.RandomState(3)
    R = 64
    o = rs.randn(R, 3).astype(np.float32) * 2
    d = rs.randn(R, 3).astype(np.float32)
    # include axis-parallel rays (the robustness regression case)
    d[:8, 0] = 0.0
    d[8:12, 1] = 0.0
    d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-20

    ref = trace.intersect_scan(jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
                               jnp.asarray(o), jnp.asarray(d),
                               jnp.zeros(R), jnp.full(R, 100.0))
    rt = np.asarray(ref.t)

    def stream_one(o1, d1, tmin=0.0, tmax=100.0):
      iv = 1.0 / np.where(np.abs(d1) < 1e-20,
                          np.where(d1 < 0, -1e-20, 1e-20), d1)
      par = np.abs(d1) < 1e-12
      i, bt = 0, np.inf
      while i < n:
        t0 = (nmin[i] - o1) * iv
        t1 = (nmax[i] - o1) * iv
        lo = np.minimum(t0, t1)
        hi = np.maximum(t0, t1)
        inside = (o1 >= nmin[i]) & (o1 <= nmax[i])
        lo = np.where(par, np.where(inside, -3e38, 3e38), lo)
        hi = np.where(par, np.where(inside, 3e38, -3e38), hi)
        near = max(lo.max(), tmin)
        far = min(hi.min(), min(tmax, bt))
        hit = near <= far * 1.0000002 + 1e-7
        if count[i] > 0 and hit:
          for k in range(count[i]):
            orig = prim[left[i] + k]
            vv0, ee1, ee2 = v0[orig], e1[orig], e2[orig]
            px = np.cross(d1, ee2)
            det = px @ ee1
            if abs(det) <= 1e-9:
              continue
            inv = 1.0 / det
            tx = o1 - vv0
            u = tx @ px * inv
            q = np.cross(tx, ee1)
            w = q @ d1 * inv
            t = q @ ee2 * inv
            if u >= 0 and w >= 0 and u + w <= 1 and tmin <= t <= tmax and t < bt:
              bt = t
        i = i + 1 if (hit and count[i] == 0) else skip[i]
      return bt

    for j in range(R):
      st = stream_one(o[j], d[j])
      assert np.isclose(min(rt[j], 1e9), min(st, 1e9), rtol=1e-4), (j, rt[j], st)
