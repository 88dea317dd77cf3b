"""Batched ray-scene intersection (JAX reference implementations).

TPU-native replacement for the Embree facade (reference rt/rt.cxx:250-279,
428-466): rays are SoA arrays, intersection is data-parallel over the whole
wavefront. Two strategies:

- brute force: Moller-Trumbore against triangle blocks — optimal on TPU for
  Cornell-class scenes (everything stays in VMEM, pure VPU math, no
  divergence),
- BVH: fixed-stack traversal in a `lax.while_loop`, vmapped over rays, for
  large scenes.

A Pallas brute-force kernel (ops/pallas_trace.py) accelerates the hot path;
these versions are the semantics reference and the CPU/test fallback.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from etx_tracer_tpu.core import math as em


class Hit(NamedTuple):
  t: jnp.ndarray        # (R,) float32, +inf when missed
  tri: jnp.ndarray      # (R,) int32, -1 when missed
  u: jnp.ndarray        # (R,) barycentric u
  v: jnp.ndarray        # (R,) barycentric v

  @property
  def found(self):
    return self.tri >= 0


_MT_EPS = 1e-9


def _mt_intersect(v0, e1, e2, o, d, t_min, t_max):
  """Moller-Trumbore for one ray block against one triangle block.

  Shapes: v0/e1/e2 (T,3); o/d (R,3); returns (R,T) t, u, v, valid.
  """
  # pvec = d x e2 : (R,T,3)
  pvec = jnp.cross(d[:, None, :], e2[None, :, :])
  det = jnp.sum(pvec * e1[None, :, :], axis=-1)  # (R,T)
  inv_det = jnp.where(jnp.abs(det) > _MT_EPS, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
  tvec = o[:, None, :] - v0[None, :, :]  # (R,T,3)
  u = jnp.sum(tvec * pvec, axis=-1) * inv_det
  qvec = jnp.cross(tvec, e1[None, :, :])  # (R,T,3)
  v = jnp.sum(qvec * d[:, None, :], axis=-1) * inv_det
  t = jnp.sum(qvec * e2[None, :, :], axis=-1) * inv_det
  valid = (
      (jnp.abs(det) > _MT_EPS)
      & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
      & (t >= t_min[:, None]) & (t <= t_max[:, None])
  )
  return t, u, v, valid


def intersect_scan(tri_v0, tri_e1, tri_e2, o, d, t_min, t_max,
                   tri_mask=None) -> Hit:
  """Closest hit via lax.scan over triangles, carrying the running best.

  Avoids materializing (R,T) intermediates in HBM: each scan step touches
  only (R,)-shaped arrays, which XLA fuses into one bandwidth-lean loop —
  the preferred XLA fallback for small/medium scenes on TPU.
  """
  num_r = o.shape[0]
  num_t = tri_v0.shape[0]
  mask = jnp.ones(num_t, bool) if tri_mask is None else tri_mask

  ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
  dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

  def step(best, tri):
    v0, e1, e2, m = tri
    best_t, best_tri, best_u, best_v, idx = best
    # pvec = d x e2 (per-component, scalar triangle)
    px = dy * e2[2] - dz * e2[1]
    py = dz * e2[0] - dx * e2[2]
    pz = dx * e2[1] - dy * e2[0]
    det = px * e1[0] + py * e1[1] + pz * e1[2]
    inv_det = jnp.where(jnp.abs(det) > _MT_EPS, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
    tx = ox - v0[0]
    ty = oy - v0[1]
    tz = oz - v0[2]
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1[2] - tz * e1[1]
    qy = tz * e1[0] - tx * e1[2]
    qz = tx * e1[1] - ty * e1[0]
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
    ok = ((jnp.abs(det) > _MT_EPS) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t >= t_min) & (t <= t_max) & (t < best_t) & m)
    best = (jnp.where(ok, t, best_t), jnp.where(ok, idx, best_tri),
            jnp.where(ok, u, best_u), jnp.where(ok, v, best_v), idx + 1)
    return best, None

  init = (jnp.full((num_r,), jnp.inf, jnp.float32),
          jnp.full((num_r,), -1, jnp.int32),
          jnp.zeros((num_r,), jnp.float32),
          jnp.zeros((num_r,), jnp.float32),
          jnp.int32(0))
  (best_t, best_tri, best_u, best_v, _), _ = jax.lax.scan(
      step, init, (tri_v0, tri_e1, tri_e2, mask))
  return Hit(best_t, best_tri, best_u, best_v)


def intersect_brute(tri_v0, tri_e1, tri_e2, o, d, t_min, t_max,
                    tri_mask=None, block: int = 512) -> Hit:
  """Closest hit by scanning all triangles in blocks of `block`.

  tri_mask: optional (T,) bool; False triangles are skipped (Void skip hook,
  mirroring the Embree filter function in rt.cxx:428-466).
  """
  num_t = tri_v0.shape[0]
  num_r = o.shape[0]
  pad = (-num_t) % block
  if pad:
    tri_v0 = jnp.pad(tri_v0, ((0, pad), (0, 0)))
    tri_e1 = jnp.pad(tri_e1, ((0, pad), (0, 0)))
    tri_e2 = jnp.pad(tri_e2, ((0, pad), (0, 0)))
  mask_full = jnp.ones(num_t + pad, bool) if tri_mask is None else jnp.pad(tri_mask, (0, pad))
  mask_full = mask_full & (jnp.arange(num_t + pad) < num_t)

  n_blocks = (num_t + pad) // block

  def body(i, carry):
    best_t, best_tri, best_u, best_v = carry
    s = i * block
    v0 = jax.lax.dynamic_slice_in_dim(tri_v0, s, block)
    e1 = jax.lax.dynamic_slice_in_dim(tri_e1, s, block)
    e2 = jax.lax.dynamic_slice_in_dim(tri_e2, s, block)
    m = jax.lax.dynamic_slice_in_dim(mask_full, s, block)
    t, u, v, valid = _mt_intersect(v0, e1, e2, o, d, t_min, t_max)
    valid = valid & m[None, :]
    t = jnp.where(valid, t, jnp.inf)
    j = jnp.argmin(t, axis=-1)  # (R,)
    rows = jnp.arange(num_r)
    tj = t[rows, j]
    better = tj < best_t
    best_tri = jnp.where(better, (s + j).astype(jnp.int32), best_tri)
    best_u = jnp.where(better, u[rows, j], best_u)
    best_v = jnp.where(better, v[rows, j], best_v)
    best_t = jnp.where(better, tj, best_t)
    return best_t, best_tri, best_u, best_v

  init = (
      jnp.full((num_r,), jnp.inf, jnp.float32),
      jnp.full((num_r,), -1, jnp.int32),
      jnp.zeros((num_r,), jnp.float32),
      jnp.zeros((num_r,), jnp.float32),
  )
  best_t, best_tri, best_u, best_v = jax.lax.fori_loop(0, n_blocks, body, init)
  return Hit(best_t, best_tri, best_u, best_v)


# ---------------------------------------------------------------------------
# BVH traversal (vmapped fixed-stack while_loop).
# ---------------------------------------------------------------------------

_STACK_DEPTH = 64
_PALLAS_TRI_LIMIT = 4096


def _ray_aabb(node_min, node_max, o, d, inv_d, t_min, t_max):
  t0 = (node_min - o) * inv_d
  t1 = (node_max - o) * inv_d
  tlo = jnp.minimum(t0, t1)
  thi = jnp.maximum(t0, t1)
  # axis-parallel rays: the clamped inverse mis-scores slabs the origin
  # touches (o == bound, d == 0); use explicit inside/outside intervals
  par = jnp.abs(d) < 1e-12
  inside = (o >= node_min) & (o <= node_max)
  big = jnp.float32(3e38)
  tlo = jnp.where(par, jnp.where(inside, -big, big), tlo)
  thi = jnp.where(par, jnp.where(inside, big, -big), thi)
  near = jnp.maximum(jnp.max(tlo), t_min)
  far = jnp.minimum(jnp.min(thi), t_max)
  return near <= far * 1.0000002 + 1e-7


def intersect_bvh(bvh, tri_v0, tri_e1, tri_e2, o, d, t_min, t_max,
                  tri_mask=None) -> Hit:
  """Closest hit via per-ray stack traversal (vmapped)."""
  num_t = tri_v0.shape[0]
  mask = jnp.ones(num_t, bool) if tri_mask is None else tri_mask

  def one_ray(o1, d1, tmin1, tmax1):
    inv_d = 1.0 / jnp.where(jnp.abs(d1) < 1e-20, jnp.where(d1 < 0, -1e-20, 1e-20), d1)

    def mt_one(ti, best):
      bt, btri, bu, bv = best
      v0 = tri_v0[ti]
      e1 = tri_e1[ti]
      e2 = tri_e2[ti]
      pvec = jnp.cross(d1, e2)
      det = jnp.dot(pvec, e1)
      inv_det = jnp.where(jnp.abs(det) > _MT_EPS, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)
      tvec = o1 - v0
      u = jnp.dot(tvec, pvec) * inv_det
      qvec = jnp.cross(tvec, e1)
      v = jnp.dot(qvec, d1) * inv_det
      t = jnp.dot(qvec, e2) * inv_det
      ok = (jnp.abs(det) > _MT_EPS) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t >= tmin1) & (t < bt) & (t <= tmax1) & mask[ti]
      return (
          jnp.where(ok, t, bt),
          jnp.where(ok, ti, btri),
          jnp.where(ok, u, bu),
          jnp.where(ok, v, bv),
      )

    def cond(state):
      sp = state[0]
      return sp > 0

    def body(state):
      sp, stack, bt, btri, bu, bv = state
      sp = sp - 1
      node = stack[sp]
      hit_box = _ray_aabb(bvh.node_min[node], bvh.node_max[node], o1, d1, inv_d, tmin1, jnp.minimum(tmax1, bt))
      count = bvh.node_count[node]
      left = bvh.node_left[node]
      is_leaf = count > 0

      # leaf: test primitives
      def leaf_fn(args):
        bt, btri, bu, bv = args

        def prim_body(k, best):
          ti = bvh.prim_index[left + k]
          return mt_one(ti, best)

        return jax.lax.fori_loop(0, count, prim_body, (bt, btri, bu, bv))

      bt, btri, bu, bv = jax.lax.cond(
          hit_box & is_leaf, leaf_fn, lambda a: a, (bt, btri, bu, bv))

      # inner: push children (left child = node+1, right = `left`)
      push = hit_box & (~is_leaf)
      stack = jax.lax.cond(
          push,
          lambda s: s.at[sp].set(node + 1).at[sp + 1].set(left),
          lambda s: s,
          stack,
      )
      sp = jnp.where(push, sp + 2, sp)
      return sp, stack, bt, btri, bu, bv

    stack0 = jnp.zeros(_STACK_DEPTH, jnp.int32)
    state = (jnp.int32(1), stack0, jnp.float32(jnp.inf), jnp.int32(-1), jnp.float32(0), jnp.float32(0))
    _, _, bt, btri, bu, bv = jax.lax.while_loop(cond, body, state)
    return bt, btri, bu, bv

  bt, btri, bu, bv = jax.vmap(one_ray)(o, d, t_min, t_max)
  return Hit(bt, btri, bu, bv)


# above this triangle count the Pallas DFS-stream BVH kernel beats the
# brute kernel (measured on v5e: brute wins through ~1k tris — 5.2 vs 3.7
# Mrays/s on the 996-tri materials scene — because shared traversal can't
# prune below the tile-union size; the stream kernel takes over where
# O(T) brute becomes hopeless)
_BVH_PALLAS_MIN_TRIS = 4096

# The packed Pallas BVH tables encode triangle ids / node offsets as
# float32, exact only below 2^24: larger scenes would silently corrupt hit
# ids, so the dispatch falls back to the int32 per-ray-stack traversal
# (ADVICE round-1 item).
_PALLAS_ID_LIMIT = 1 << 24


def _pallas_ids_exact(scene, num_t: int) -> bool:
  nodes = scene.bvh.node_min.shape[0] if scene.bvh is not None else 0
  return num_t < _PALLAS_ID_LIMIT and nodes < _PALLAS_ID_LIMIT


def _spread3(x):
  """Spread 10 bits to every third bit (Morton interleave)."""
  x = (x | (x << 16)) & 0x030000FF
  x = (x | (x << 8)) & 0x0300F00F
  x = (x | (x << 4)) & 0x030C30C3
  x = (x | (x << 2)) & 0x09249249
  return x


def _ray_sort_keys(bvh, o, d):
  """Spatial-major sort keys: 27-bit Morton cell of the origin (scene-box
  normalized) with the 3-bit direction octant minor. Tiles of sorted rays
  share subtrees, which is what the shared DFS-stream traversal prunes by."""
  root_min = bvh.node_min[0]
  root_ext = jnp.maximum(bvh.node_max[0] - root_min, 1e-6)
  q = jnp.clip((o - root_min) / root_ext, 0.0, 1.0)
  cell = (q * 511.0).astype(jnp.uint32)  # 9 bits/axis
  morton = (_spread3(cell[:, 0]) | (_spread3(cell[:, 1]) << 1)
            | (_spread3(cell[:, 2]) << 2))
  octant = ((d[:, 0] >= 0).astype(jnp.uint32)
            | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
            | ((d[:, 2] >= 0).astype(jnp.uint32) << 2))
  return (morton << 3) | octant


def _sorted_for_trace(bvh, o, d, t_min, t_max):
  """Morton-sorted ray views + inverse permutation.

  Measured NET NEGATIVE on v5e for the trace dispatch (argsort + permutes
  ≈ 74 ms at 131k rays) — kept for offline experiments only."""
  key = _ray_sort_keys(bvh, o, d)
  perm = jnp.argsort(key)
  inv = jnp.zeros_like(perm).at[perm].set(
      jnp.arange(perm.shape[0], dtype=perm.dtype))
  return (o[perm], d[perm], t_min[perm], t_max[perm]), inv


def trace_closest(scene, o, d, t_min, t_max, tri_mask=None, prefer_brute: bool = True) -> Hit:
  """Closest-hit dispatch: brute Pallas/scan for tiny scenes, the Pallas
  DFS-stream BVH kernel beyond, XLA per-ray-stack BVH as the fallback."""
  num_t = scene.tri_v0.shape[0]
  from etx_tracer_tpu.ops import pallas_trace
  if pallas_trace.available() and _pallas_ids_exact(scene, num_t):
    if prefer_brute and num_t <= _BVH_PALLAS_MIN_TRIS:
      # unrolled v1 wins below the unroll limit (static scalar rows pipeline
      # best); the dense pair-tile v2 kernel wins beyond (measured 1.3-1.4x
      # at 1k-4k tris)
      if num_t <= pallas_trace._UNROLL_LIMIT:
        return pallas_trace.intersect_pallas(
            scene.tri_v0, scene.tri_e1, scene.tri_e2, o, d, t_min, t_max, tri_mask)
      return pallas_trace.intersect_brute2_pallas(
          scene.tri_v0, scene.tri_e1, scene.tri_e2, o, d, t_min, t_max, tri_mask)
    if getattr(scene.bvh, "fat_rows", None) is not None:
      # NOTE: Morton-sorting rays before the kernel was measured NET
      # NEGATIVE on v5e (argsort + permute ≈ 74 ms at 131k rays vs ≤112 ms
      # total trace): wavefront lanes already keep pixel-neighborhood order
      return pallas_trace.intersect_bvh_fat_pallas(
          scene.bvh, scene.tri_v0, scene.tri_e1, scene.tri_e2,
          o, d, t_min, t_max, tri_mask)
    if scene.bvh.node_skip is not None:
      return pallas_trace.intersect_bvh_pallas(
          scene.bvh, scene.tri_v0, scene.tri_e1, scene.tri_e2,
          o, d, t_min, t_max, tri_mask)
    if num_t <= _PALLAS_TRI_LIMIT:
      return pallas_trace.intersect_pallas(
          scene.tri_v0, scene.tri_e1, scene.tri_e2, o, d, t_min, t_max, tri_mask)
  elif prefer_brute and num_t <= _PALLAS_TRI_LIMIT:
    return intersect_scan(scene.tri_v0, scene.tri_e1, scene.tri_e2, o, d, t_min, t_max, tri_mask)
  return intersect_bvh(scene.bvh, scene.tri_v0, scene.tri_e1, scene.tri_e2, o, d, t_min, t_max, tri_mask)


def trace_occluded(scene, o, d, t_min, t_max, tri_mask=None) -> jnp.ndarray:
  """Boolean occlusion query for shadow rays (rt.cxx trace usage in NEE).

  Uses the dedicated any-hit Pallas kernels when available — no closest
  reduction or u/v bookkeeping, plus whole-tile early exit in the BVH
  variant."""
  num_t = scene.tri_v0.shape[0]
  from etx_tracer_tpu.ops import pallas_trace
  if pallas_trace.available() and _pallas_ids_exact(scene, num_t):
    if num_t <= _BVH_PALLAS_MIN_TRIS:
      if num_t <= pallas_trace._UNROLL_LIMIT:
        return pallas_trace.occluded_pallas(
            scene.tri_v0, scene.tri_e1, scene.tri_e2, o, d, t_min, t_max, tri_mask)
      # dense pair-tile any-hit (division-free): measured 2.2-2.5x over v1
      return pallas_trace.occluded_brute2_pallas(
          scene.tri_v0, scene.tri_e1, scene.tri_e2, o, d, t_min, t_max, tri_mask)
    if getattr(scene.bvh, "fat_rows", None) is not None:
      return pallas_trace.occluded_bvh_fat_pallas(
          scene.bvh, scene.tri_v0, scene.tri_e1, scene.tri_e2,
          o, d, t_min, t_max, tri_mask)
    if scene.bvh.node_skip is not None:
      return pallas_trace.occluded_bvh_pallas(
          scene.bvh, scene.tri_v0, scene.tri_e1, scene.tri_e2,
          o, d, t_min, t_max, tri_mask)
    if num_t <= _PALLAS_TRI_LIMIT:
      return pallas_trace.occluded_pallas(
          scene.tri_v0, scene.tri_e1, scene.tri_e2, o, d, t_min, t_max, tri_mask)
  hit = trace_closest(scene, o, d, t_min, t_max, tri_mask)
  return hit.found & (hit.t <= t_max)
