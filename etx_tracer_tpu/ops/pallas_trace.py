"""Pallas TPU kernel: brute-force closest-hit ray/triangle intersection.

The performance replacement for Embree's rtcIntersect1 (reference
rt/rt.cxx:250-278) on Cornell-class scenes: a ray tile is loaded into VMEM
once, the whole triangle list streams through registers, and only the hit
record leaves the chip — versus the XLA fallback whose per-triangle
intermediates round-trip HBM.

Layout: rays are split into (G, L) component planes (L = 128 lanes); each
grid program intersects a (RB, 128) ray tile against all T triangles with a
`fori_loop`, keeping the running-best hit in VMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from etx_tracer_tpu.ops.trace import Hit

_LANES = 128
_SUBLANES = 8
_RB = 32  # ray sublane-rows per program -> 32*128 = 4096 rays/tile

_MT_EPS = 1e-9


def available() -> bool:
  try:
    return jax.default_backend() != "cpu"
  except Exception:
    return False


_UNROLL_LIMIT = 128


def _kernel(tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tmin_ref, tmax_ref,
            t_out, tri_out, u_out, v_out):
  import jax.experimental.pallas as pl

  ox = ox_ref[...]
  oy = oy_ref[...]
  oz = oz_ref[...]
  dx = dx_ref[...]
  dy = dy_ref[...]
  dz = dz_ref[...]
  tmin = tmin_ref[...]
  tmax = tmax_ref[...]

  num_t = tri_ref.shape[0]

  best0 = (jnp.full(ox.shape, jnp.inf, jnp.float32),
           jnp.full(ox.shape, -1, jnp.int32),
           jnp.zeros(ox.shape, jnp.float32),
           jnp.zeros(ox.shape, jnp.float32))

  def intersect_one(ti, row, best):
    best_t, best_tri, best_u, best_v = best
    v0x, v0y, v0z = row[0, 0], row[0, 1], row[0, 2]
    e1x, e1y, e1z = row[0, 3], row[0, 4], row[0, 5]
    e2x, e2y, e2z = row[0, 6], row[0, 7], row[0, 8]
    m = row[0, 9] > 0.5

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = px * e1x + py * e1y + pz * e1z
    inv_det = jnp.where(jnp.abs(det) > _MT_EPS,
                        1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = ((jnp.abs(det) > _MT_EPS) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t >= tmin) & (t <= tmax) & (t < best_t) & m)
    return (jnp.where(ok, t, best_t),
            jnp.where(ok, ti, best_tri),
            jnp.where(ok, u, best_u),
            jnp.where(ok, v, best_v))

  if num_t <= _UNROLL_LIMIT:
    # static unroll: triangle components become static-index scalar reads,
    # letting the VPU pipeline pure elementwise chains without dynamic loads
    best = best0
    for ti in range(num_t):
      best = intersect_one(ti, tri_ref[ti:ti + 1, :], best)
  else:
    def body(ti, best):
      return intersect_one(ti, tri_ref[pl.ds(ti, 1), :], best)

    best = jax.lax.fori_loop(0, num_t, body, best0)

  best_t, best_tri, best_u, best_v = best
  t_out[...] = best_t
  tri_out[...] = best_tri
  u_out[...] = best_u
  v_out[...] = best_v


@functools.partial(jax.jit, static_argnames=())
def intersect_pallas(tri_v0, tri_e1, tri_e2, o, d, t_min, t_max, tri_mask=None) -> Hit:
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  num_r = o.shape[0]
  num_t = tri_v0.shape[0]

  mask = jnp.ones((num_t, 1), jnp.float32) if tri_mask is None \
      else tri_mask.astype(jnp.float32)[:, None]
  # triangle table rows padded to 16 floats: v0, e1, e2, mask, pad;
  # row count padded to a sublane multiple with masked-off rows
  tri_tab = jnp.concatenate(
      [tri_v0, tri_e1, tri_e2, mask, jnp.zeros((num_t, 6), jnp.float32)], axis=1)
  tpad = (-num_t) % _SUBLANES
  if tpad:
    tri_tab = jnp.concatenate([tri_tab, jnp.zeros((tpad, 16), jnp.float32)])
  num_tp = num_t + tpad

  tile = _RB * _LANES
  pad = (-num_r) % tile
  if pad:
    def padf(x, fill):
      return jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
    o = padf(o, 0.0)
    d = padf(d, 1.0)
    t_min = padf(t_min, 0.0)
    t_max = padf(t_max, -1.0)  # padded rays never hit
  rp = num_r + pad
  g = rp // _LANES

  def plane(x):
    return x.reshape(g, _LANES)

  planes = [plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
            plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
            plane(t_min), plane(t_max)]

  grid = (g // _RB,)
  ray_spec = pl.BlockSpec((_RB, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
  tri_spec = pl.BlockSpec((num_tp, 16), lambda i: (0, 0), memory_space=pltpu.VMEM)

  out_shape = [
      jax.ShapeDtypeStruct((g, _LANES), jnp.float32),
      jax.ShapeDtypeStruct((g, _LANES), jnp.int32),
      jax.ShapeDtypeStruct((g, _LANES), jnp.float32),
      jax.ShapeDtypeStruct((g, _LANES), jnp.float32),
  ]
  out_spec = [ray_spec] * 4

  t, tri, u, v = pl.pallas_call(
      _kernel,
      grid=grid,
      in_specs=[tri_spec] + [ray_spec] * 8,
      out_specs=out_spec,
      out_shape=out_shape,
  )(tri_tab, *planes)

  t = t.reshape(rp)[:num_r]
  tri = tri.reshape(rp)[:num_r]
  u = u.reshape(rp)[:num_r]
  v = v.reshape(rp)[:num_r]
  return Hit(t, tri, u, v)


def _kernel_anyhit(tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   tmin_ref, tmax_ref, occ_out):
  """Occlusion-only variant: OR-accumulates a hit bit, no closest reduction
  (the shadow-ray half of rt.cxx usage; ~25% less per-triangle work)."""
  import jax.experimental.pallas as pl

  ox = ox_ref[...]
  oy = oy_ref[...]
  oz = oz_ref[...]
  dx = dx_ref[...]
  dy = dy_ref[...]
  dz = dz_ref[...]
  tmin = tmin_ref[...]
  tmax = tmax_ref[...]

  num_t = tri_ref.shape[0]

  def intersect_one(row, occ):
    v0x, v0y, v0z = row[0, 0], row[0, 1], row[0, 2]
    e1x, e1y, e1z = row[0, 3], row[0, 4], row[0, 5]
    e2x, e2y, e2z = row[0, 6], row[0, 7], row[0, 8]
    m = row[0, 9] > 0.5

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = px * e1x + py * e1y + pz * e1z
    inv_det = jnp.where(jnp.abs(det) > _MT_EPS,
                        1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = ((jnp.abs(det) > _MT_EPS) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t >= tmin) & (t <= tmax) & m)
    return jnp.maximum(occ, ok.astype(jnp.float32))

  # accumulate in f32: an i1 output plane forces a slow layout conversion
  occ = jnp.zeros(ox.shape, jnp.float32)
  if num_t <= _UNROLL_LIMIT:
    for ti in range(num_t):
      occ = intersect_one(tri_ref[ti:ti + 1, :], occ)
  else:
    def body(ti, occ):
      return intersect_one(tri_ref[pl.ds(ti, 1), :], occ)
    occ = jax.lax.fori_loop(0, num_t, body, occ)

  occ_out[...] = occ


@functools.partial(jax.jit, static_argnames=())
def occluded_pallas(tri_v0, tri_e1, tri_e2, o, d, t_min, t_max,
                    tri_mask=None) -> jnp.ndarray:
  """Any-hit occlusion query: (R,) bool."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  num_r = o.shape[0]
  num_t = tri_v0.shape[0]

  mask = jnp.ones((num_t, 1), jnp.float32) if tri_mask is None \
      else tri_mask.astype(jnp.float32)[:, None]
  tri_tab = jnp.concatenate(
      [tri_v0, tri_e1, tri_e2, mask, jnp.zeros((num_t, 6), jnp.float32)], axis=1)
  tpad = (-num_t) % _SUBLANES
  if tpad:
    tri_tab = jnp.concatenate([tri_tab, jnp.zeros((tpad, 16), jnp.float32)])
  num_tp = num_t + tpad

  tile = _RB * _LANES
  pad = (-num_r) % tile
  if pad:
    def padf(x, fill):
      return jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
    o = padf(o, 0.0)
    d = padf(d, 1.0)
    t_min = padf(t_min, 0.0)
    t_max = padf(t_max, -1.0)
  rp = num_r + pad
  g = rp // _LANES

  def plane(x):
    return x.reshape(g, _LANES)

  planes = [plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
            plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
            plane(t_min), plane(t_max)]

  grid = (g // _RB,)
  ray_spec = pl.BlockSpec((_RB, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
  tri_spec = pl.BlockSpec((num_tp, 16), lambda i: (0, 0), memory_space=pltpu.VMEM)

  occ = pl.pallas_call(
      _kernel_anyhit,
      grid=grid,
      in_specs=[tri_spec] + [ray_spec] * 8,
      out_specs=ray_spec,
      out_shape=jax.ShapeDtypeStruct((g, _LANES), jnp.float32),
  )(tri_tab, *planes)

  return occ.reshape(rp)[:num_r] > 0.5
