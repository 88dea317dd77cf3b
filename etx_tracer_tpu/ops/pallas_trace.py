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


# ---------------------------------------------------------------------------
# BVH DFS-stream traversal kernels.
#
# No per-ray stacks (per-lane dynamic control flow doesn't map to the VPU).
# Instead the whole ray tile walks ONE pre-order node stream with skip
# offsets (bvh_build.compute_skip): box hit -> descend (i+1), miss -> skip
# subtree. The skip decision is shared (any ray in the tile hits), so tiles
# visit the union of their rays' subtrees — the running best-t shrinks the
# per-ray intervals and prunes progressively. Leaf primitive rows are
# contiguous (prim_index pre-reordered into the triangle table), each row
# carrying its ORIGINAL triangle id for the hit record.
# ---------------------------------------------------------------------------


def _read_packed(ref, idx):
  """Read entry `idx` of a chunk-packed table -> (16, 1) component column.

  Layout (_pack16): entry chunks of 128 consecutive entries, each chunk
  stored as 16 component rows x 128 lanes. The sublane start (idx//128)*16
  is provably 16-aligned, and the lane extraction is a one-hot reduce —
  VMEM-dense (a plain (N,16) row table tile-pads every row to 128 lanes,
  a 16x blowup that OOMs vmem around ~10k nodes), and Mosaic-legal (dynamic
  LANE slices must be 128-aligned; sublane slices only need 8)."""
  import jax.experimental.pallas as pl
  base = pl.multiple_of((idx // _LANES) * 16, 16)
  block = ref[pl.ds(base, 16), :]
  oh = (jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        == (idx % _LANES)).astype(jnp.float32)
  return jnp.sum(block * oh, axis=1, keepdims=True)


def _tri_hit(row, ox, oy, oz, dx, dy, dz, tmin, tmax, best_t):
  """Moller-Trumbore one packed column vs the ray tile; returns
  (ok, t, u, v, id)."""
  v0x, v0y, v0z = row[0, 0], row[1, 0], row[2, 0]
  e1x, e1y, e1z = row[3, 0], row[4, 0], row[5, 0]
  e2x, e2y, e2z = row[6, 0], row[7, 0], row[8, 0]
  m = row[9, 0] > 0.5
  tid = row[10, 0]

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
  return ok, t, u, v, tid


def _kernel_bvh(node_ref, tri_ref,
                ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                tmin_ref, tmax_ref,
                t_out, tri_out, u_out, v_out):
  import jax.experimental.pallas as pl  # noqa: F401 (used via _read_packed)

  ox = ox_ref[...]
  oy = oy_ref[...]
  oz = oz_ref[...]
  dx = dx_ref[...]
  dy = dy_ref[...]
  dz = dz_ref[...]
  tmin = tmin_ref[...]
  tmax = tmax_ref[...]

  def safe_inv(x):
    return 1.0 / jnp.where(jnp.abs(x) < 1e-20,
                           jnp.where(x < 0, -1e-20, 1e-20), x)

  ivx = safe_inv(dx)
  ivy = safe_inv(dy)
  ivz = safe_inv(dz)
  # axis-parallel rays: the clamped inverse mis-scores slabs the origin
  # touches (o == bound, d == 0 gives t = 0 instead of an infinite slab),
  # so parallel axes get explicit inside/outside intervals
  parx = jnp.abs(dx) < 1e-12
  pary = jnp.abs(dy) < 1e-12
  parz = jnp.abs(dz) < 1e-12

  def slab(par, o1, iv, mn, mx):
    t0 = (mn - o1) * iv
    t1 = (mx - o1) * iv
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    inside = (o1 >= mn) & (o1 <= mx)
    big = jnp.float32(3e38)
    lo = jnp.where(par, jnp.where(inside, -big, big), lo)
    hi = jnp.where(par, jnp.where(inside, big, -big), hi)
    return lo, hi

  num_nodes = node_ref.shape[0] // 16 * _LANES

  def cond(c):
    return c[0] < num_nodes

  def body(c):
    i, bt, btri, bu, bv = c
    nc = _read_packed(node_ref, i)
    skip = nc[6, 0].astype(jnp.int32)
    first = nc[7, 0].astype(jnp.int32)
    count = nc[8, 0].astype(jnp.int32)

    lox, hix = slab(parx, ox, ivx, nc[0, 0], nc[3, 0])
    loy, hiy = slab(pary, oy, ivy, nc[1, 0], nc[4, 0])
    loz, hiz = slab(parz, oz, ivz, nc[2, 0], nc[5, 0])
    near = jnp.maximum(jnp.maximum(lox, loy), jnp.maximum(loz, tmin))
    far = jnp.minimum(jnp.minimum(hix, hiy),
                      jnp.minimum(hiz, jnp.minimum(tmax, bt)))
    # conservative traversal: tolerate a few ulps of slab cancellation
    anyhit = jnp.any(near <= far * 1.0000002 + 1e-7)
    is_leaf = count > 0

    def prim_body(k, b):
      bt, btri, bu, bv = b
      row = _read_packed(tri_ref, first + k)
      ok, t, u, v, tid = _tri_hit(row, ox, oy, oz, dx, dy, dz,
                                  tmin, tmax, bt)
      return (jnp.where(ok, t, bt),
              jnp.where(ok, tid.astype(jnp.int32), btri),
              jnp.where(ok, u, bu),
              jnp.where(ok, v, bv))

    # zero-trip bound instead of lax.cond: branch frames capture the live
    # vector set and blow the Mosaic vmem stack in fused contexts
    n_test = jnp.where(anyhit & is_leaf, count, 0)
    bt, btri, bu, bv = jax.lax.fori_loop(0, n_test, prim_body,
                                         (bt, btri, bu, bv))
    i_next = jnp.where(anyhit & ~is_leaf, i + 1, skip)
    return i_next, bt, btri, bu, bv

  init = (jnp.int32(0),
          jnp.full(ox.shape, jnp.inf, jnp.float32),
          jnp.full(ox.shape, -1, jnp.int32),
          jnp.zeros(ox.shape, jnp.float32),
          jnp.zeros(ox.shape, jnp.float32))
  _, bt, btri, bu, bv = jax.lax.while_loop(cond, body, init)
  t_out[...] = bt
  tri_out[...] = btri
  u_out[...] = bu
  v_out[...] = bv


def _kernel_bvh_anyhit(node_ref, tri_ref,
                       ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                       tmin_ref, tmax_ref, occ_out):
  import jax.experimental.pallas as pl  # noqa: F401 (used via _read_packed)

  ox = ox_ref[...]
  oy = oy_ref[...]
  oz = oz_ref[...]
  dx = dx_ref[...]
  dy = dy_ref[...]
  dz = dz_ref[...]
  tmin = tmin_ref[...]
  tmax = tmax_ref[...]

  def safe_inv(x):
    return 1.0 / jnp.where(jnp.abs(x) < 1e-20,
                           jnp.where(x < 0, -1e-20, 1e-20), x)

  ivx = safe_inv(dx)
  ivy = safe_inv(dy)
  ivz = safe_inv(dz)
  parx = jnp.abs(dx) < 1e-12
  pary = jnp.abs(dy) < 1e-12
  parz = jnp.abs(dz) < 1e-12

  def slab(par, o1, iv, mn, mx):
    t0 = (mn - o1) * iv
    t1 = (mx - o1) * iv
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    inside = (o1 >= mn) & (o1 <= mx)
    big = jnp.float32(3e38)
    lo = jnp.where(par, jnp.where(inside, -big, big), lo)
    hi = jnp.where(par, jnp.where(inside, big, -big), hi)
    return lo, hi

  num_nodes = node_ref.shape[0] // 16 * _LANES
  # rays with tmax <= 0 never hit; early-exit once every live ray is occluded
  live = (tmax > 0.0).astype(jnp.float32)

  def cond(c):
    i, occ = c
    return (i < num_nodes) & jnp.any((live - occ) > 0.5)

  def body(c):
    i, occ = c
    nc = _read_packed(node_ref, i)
    skip = nc[6, 0].astype(jnp.int32)
    first = nc[7, 0].astype(jnp.int32)
    count = nc[8, 0].astype(jnp.int32)

    lox, hix = slab(parx, ox, ivx, nc[0, 0], nc[3, 0])
    loy, hiy = slab(pary, oy, ivy, nc[1, 0], nc[4, 0])
    loz, hiz = slab(parz, oz, ivz, nc[2, 0], nc[5, 0])
    near = jnp.maximum(jnp.maximum(lox, loy), jnp.maximum(loz, tmin))
    far = jnp.minimum(jnp.minimum(hix, hiy), jnp.minimum(hiz, tmax))
    # occluded rays stop contributing to the union -> more subtree skips
    anyhit = jnp.any((near <= far * 1.0000002 + 1e-7) & (occ < 0.5))
    is_leaf = count > 0

    def prim_body(k, occ):
      row = _read_packed(tri_ref, first + k)
      ok, _, _, _, _ = _tri_hit(row, ox, oy, oz, dx, dy, dz, tmin, tmax,
                                jnp.full(ox.shape, jnp.inf, jnp.float32))
      return jnp.maximum(occ, ok.astype(jnp.float32))

    n_test = jnp.where(anyhit & is_leaf, count, 0)
    occ = jax.lax.fori_loop(0, n_test, prim_body, occ)
    i_next = jnp.where(anyhit & ~is_leaf, i + 1, skip)
    return i_next, occ

  _, occ = jax.lax.while_loop(cond, body, (jnp.int32(0),
                                           jnp.zeros(ox.shape, jnp.float32)))
  occ_out[...] = occ


def _ray_planes(o, d, t_min, t_max, num_r, rb=_RB):
  """Pad rays to tile multiples and split into (G, 128) component planes."""
  tile = rb * _LANES
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
  return planes, rp, g


def _pack16(rows):
  """(E, 16) component rows -> chunk-packed (ceil(E/128)*16, 128).

  128-entry chunks; within a chunk the 16 components are sublane rows.
  _read_packed is the kernel-side reader. Keeps the lane dimension dense:
  a plain (E, 16) row table tile-pads every row to 128 lanes (16x VMEM,
  which OOMs the kernel around ~10k nodes)."""
  e = rows.shape[0]
  chunks = (e + _LANES - 1) // _LANES
  pad = chunks * _LANES - e
  if pad:
    rows = jnp.concatenate([rows, jnp.zeros((pad, 16), rows.dtype)])
  return rows.reshape(chunks, _LANES, 16).transpose(0, 2, 1).reshape(
      chunks * 16, _LANES)


def _bvh_tables(bvh, tri_v0, tri_e1, tri_e2, tri_mask):
  """Chunk-packed node and triangle tables for the stream kernels.

  Node entry components: [min(3), max(3), skip, first, count, 0...] — the
  int fields ride as f32 (exact below 2^24). Triangle entries:
  [v0(3), e1(3), e2(3), mask, original id, 0...]."""
  num_t = tri_v0.shape[0]
  n = bvh.node_min.shape[0]
  npad = (-n) % _LANES
  n_total = n + npad
  node_rows = jnp.concatenate(
      [bvh.node_min, bvh.node_max,
       bvh.node_skip.astype(jnp.float32)[:, None],
       bvh.node_left.astype(jnp.float32)[:, None],
       bvh.node_count.astype(jnp.float32)[:, None],
       jnp.zeros((n, 7), jnp.float32)], axis=1)
  if npad:
    # padded nodes: empty box (never hits) and skip pointing past the END
    # of the padded table — a zero skip would send the stream back to the
    # root and never terminate (TPU watchdog kill). FINITE sentinels: an
    # inf box would turn the one-hot lane reduce into inf*0 = NaN for every
    # real entry sharing the final chunk
    pad_rows = jnp.concatenate([
        jnp.full((npad, 3), 3e38, jnp.float32),
        jnp.full((npad, 3), -3e38, jnp.float32),
        jnp.full((npad, 1), float(n_total), jnp.float32),
        jnp.zeros((npad, 9), jnp.float32)], axis=1)
    node_rows = jnp.concatenate([node_rows, pad_rows])

  order = bvh.prim_index
  mask = jnp.ones(num_t, jnp.float32) if tri_mask is None \
      else tri_mask.astype(jnp.float32)
  tri_rows = jnp.concatenate(
      [tri_v0[order], tri_e1[order], tri_e2[order],
       mask[order][:, None], order.astype(jnp.float32)[:, None],
       jnp.zeros((num_t, 5), jnp.float32)], axis=1)
  return _pack16(node_rows), _pack16(tri_rows), n


@functools.partial(jax.jit, static_argnames=("interpret", "rb"))
def intersect_bvh_pallas(bvh, tri_v0, tri_e1, tri_e2, o, d, t_min, t_max,
                         tri_mask=None, interpret: bool = False,
                         rb: int = _RB) -> Hit:
  """Closest hit via the shared DFS-stream BVH kernel.

  rb: ray sublane-rows per tile. Smaller tiles tighten the per-tile subtree
  union (better pruning for coherent rays) at the cost of more grid
  programs streaming the node list."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  num_r = o.shape[0]
  node_tab, tri_tab, n_nodes = _bvh_tables(
      bvh, tri_v0, tri_e1, tri_e2, tri_mask)
  planes, rp, g = _ray_planes(o, d, t_min, t_max, num_r, rb)

  grid = (g // rb,)
  kw = {"memory_space": pltpu.VMEM} if not interpret else {}
  node_spec = pl.BlockSpec(node_tab.shape, lambda i: (0, 0), **kw)
  tri_spec = pl.BlockSpec(tri_tab.shape, lambda i: (0, 0), **kw)
  ray_spec = pl.BlockSpec((rb, _LANES), lambda i: (i, 0), **kw)

  out_shape = [
      jax.ShapeDtypeStruct((g, _LANES), jnp.float32),
      jax.ShapeDtypeStruct((g, _LANES), jnp.int32),
      jax.ShapeDtypeStruct((g, _LANES), jnp.float32),
      jax.ShapeDtypeStruct((g, _LANES), jnp.float32),
  ]
  t, tri, u, v = pl.pallas_call(
      _kernel_bvh,
      grid=grid,
      in_specs=[node_spec, tri_spec] + [ray_spec] * 8,
      out_specs=[ray_spec] * 4,
      out_shape=out_shape,
      interpret=interpret,
  )(node_tab, tri_tab, *planes)

  return Hit(t.reshape(rp)[:num_r], tri.reshape(rp)[:num_r],
             u.reshape(rp)[:num_r], v.reshape(rp)[:num_r])


@functools.partial(jax.jit, static_argnames=("interpret", "rb"))
def occluded_bvh_pallas(bvh, tri_v0, tri_e1, tri_e2, o, d, t_min, t_max,
                        tri_mask=None, interpret: bool = False,
                        rb: int = _RB) -> jnp.ndarray:
  """Any-hit occlusion via the DFS-stream BVH kernel (early exit when the
  whole tile is occluded)."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  num_r = o.shape[0]
  node_tab, tri_tab, n_nodes = _bvh_tables(
      bvh, tri_v0, tri_e1, tri_e2, tri_mask)
  planes, rp, g = _ray_planes(o, d, t_min, t_max, num_r, rb)

  grid = (g // rb,)
  kw = {"memory_space": pltpu.VMEM} if not interpret else {}
  node_spec = pl.BlockSpec(node_tab.shape, lambda i: (0, 0), **kw)
  tri_spec = pl.BlockSpec(tri_tab.shape, lambda i: (0, 0), **kw)
  ray_spec = pl.BlockSpec((rb, _LANES), lambda i: (i, 0), **kw)

  occ = pl.pallas_call(
      _kernel_bvh_anyhit,
      grid=grid,
      in_specs=[node_spec, tri_spec] + [ray_spec] * 8,
      out_specs=ray_spec,
      out_shape=jax.ShapeDtypeStruct((g, _LANES), jnp.float32),
      interpret=interpret,
  )(node_tab, tri_tab, *planes)

  return occ.reshape(rp)[:num_r] > 0.5


# ---------------------------------------------------------------------------
# Fat-node stream kernels: one packed read tests BOTH children's boxes.
# Stream entries are inner nodes only (bvh_build.build_fat_rows): descend
# left on a left-box hit (i+1 in pre-order); leaf children's triangles are
# consumed in place; skip offsets resume after the subtree. Halves the
# scalar reads / reduces / loop steps of the plain node stream.
# ---------------------------------------------------------------------------


def _fat_step(nc, slab3, tmin, far_cap):
  """Shared fat-row decode + both-children slab tests.

  Returns (hitL, hitR, Lf, Rf, Lc, Rc, skip)."""
  Lf = nc[12, 0].astype(jnp.int32)
  Rf = nc[13, 0].astype(jnp.int32)
  counts = nc[14, 0].astype(jnp.int32)
  Lc = counts // 32
  Rc = counts % 32
  skip = nc[15, 0].astype(jnp.int32)

  loL, hiL = slab3(nc[0, 0], nc[1, 0], nc[2, 0], nc[3, 0], nc[4, 0], nc[5, 0])
  loR, hiR = slab3(nc[6, 0], nc[7, 0], nc[8, 0], nc[9, 0], nc[10, 0], nc[11, 0])
  nearL = jnp.maximum(loL, tmin)
  farL = jnp.minimum(hiL, far_cap)
  nearR = jnp.maximum(loR, tmin)
  farR = jnp.minimum(hiR, far_cap)
  eps = 1e-7
  hitL = nearL <= farL * 1.0000002 + eps
  hitR = nearR <= farR * 1.0000002 + eps
  return hitL, hitR, Lf, Rf, Lc, Rc, skip


def _kernel_bvh_fat(node_ref, tri_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    tmin_ref, tmax_ref,
                    t_out, tri_out, u_out, v_out):
  ox = ox_ref[...]
  oy = oy_ref[...]
  oz = oz_ref[...]
  dx = dx_ref[...]
  dy = dy_ref[...]
  dz = dz_ref[...]
  tmin = tmin_ref[...]
  tmax = tmax_ref[...]

  def safe_inv(x):
    return 1.0 / jnp.where(jnp.abs(x) < 1e-20,
                           jnp.where(x < 0, -1e-20, 1e-20), x)

  ivx = safe_inv(dx)
  ivy = safe_inv(dy)
  ivz = safe_inv(dz)
  parx = jnp.abs(dx) < 1e-12
  pary = jnp.abs(dy) < 1e-12
  parz = jnp.abs(dz) < 1e-12

  def slab1(par, o1, iv, mn, mx):
    t0 = (mn - o1) * iv
    t1 = (mx - o1) * iv
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    inside = (o1 >= mn) & (o1 <= mx)
    big = jnp.float32(3e38)
    lo = jnp.where(par, jnp.where(inside, -big, big), lo)
    hi = jnp.where(par, jnp.where(inside, big, -big), hi)
    return lo, hi

  def slab3(mnx, mny, mnz, mxx, mxy, mxz):
    lx, hx = slab1(parx, ox, ivx, mnx, mxx)
    ly, hy = slab1(pary, oy, ivy, mny, mxy)
    lz, hz = slab1(parz, oz, ivz, mnz, mxz)
    return jnp.maximum(lx, jnp.maximum(ly, lz)), \
        jnp.minimum(hx, jnp.minimum(hy, hz))

  num_nodes = node_ref.shape[0] // 16 * _LANES

  def cond(c):
    return c[0] < num_nodes

  def body(c):
    i, bt, btri, bu, bv = c
    nc = _read_packed(node_ref, i)
    hitL, hitR, Lf, Rf, Lc, Rc, skip = _fat_step(
        nc, slab3, tmin, jnp.minimum(tmax, bt))
    anyL = jnp.any(hitL)
    anyR = jnp.any(hitR)

    def prim_body_from(first):
      def prim_body(k, b):
        bt, btri, bu, bv = b
        row = _read_packed(tri_ref, first + k)
        ok, t, u, v, tid = _tri_hit(row, ox, oy, oz, dx, dy, dz,
                                    tmin, tmax, bt)
        return (jnp.where(ok, t, bt),
                jnp.where(ok, tid.astype(jnp.int32), btri),
                jnp.where(ok, u, bu),
                jnp.where(ok, v, bv))
      return prim_body

    nL = jnp.where(anyL & (Lc > 0), Lc, 0)
    bt, btri, bu, bv = jax.lax.fori_loop(0, nL, prim_body_from(Lf),
                                         (bt, btri, bu, bv))
    nR = jnp.where(anyR & (Rc > 0), Rc, 0)
    bt, btri, bu, bv = jax.lax.fori_loop(0, nR, prim_body_from(Rf),
                                         (bt, btri, bu, bv))

    descendL = anyL & (Lc == 0)
    goR = anyR & (Rc == 0)
    i_next = jnp.where(descendL, i + 1, jnp.where(goR, Rf, skip))
    return i_next, bt, btri, bu, bv

  init = (jnp.int32(0),
          jnp.full(ox.shape, jnp.inf, jnp.float32),
          jnp.full(ox.shape, -1, jnp.int32),
          jnp.zeros(ox.shape, jnp.float32),
          jnp.zeros(ox.shape, jnp.float32))
  _, bt, btri, bu, bv = jax.lax.while_loop(cond, body, init)
  t_out[...] = bt
  tri_out[...] = btri
  u_out[...] = bu
  v_out[...] = bv


def _kernel_bvh_fat_anyhit(node_ref, tri_ref,
                           ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                           tmin_ref, tmax_ref, occ_out):
  ox = ox_ref[...]
  oy = oy_ref[...]
  oz = oz_ref[...]
  dx = dx_ref[...]
  dy = dy_ref[...]
  dz = dz_ref[...]
  tmin = tmin_ref[...]
  tmax = tmax_ref[...]

  def safe_inv(x):
    return 1.0 / jnp.where(jnp.abs(x) < 1e-20,
                           jnp.where(x < 0, -1e-20, 1e-20), x)

  ivx = safe_inv(dx)
  ivy = safe_inv(dy)
  ivz = safe_inv(dz)
  parx = jnp.abs(dx) < 1e-12
  pary = jnp.abs(dy) < 1e-12
  parz = jnp.abs(dz) < 1e-12

  def slab1(par, o1, iv, mn, mx):
    t0 = (mn - o1) * iv
    t1 = (mx - o1) * iv
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    inside = (o1 >= mn) & (o1 <= mx)
    big = jnp.float32(3e38)
    lo = jnp.where(par, jnp.where(inside, -big, big), lo)
    hi = jnp.where(par, jnp.where(inside, big, -big), hi)
    return lo, hi

  def slab3(mnx, mny, mnz, mxx, mxy, mxz):
    lx, hx = slab1(parx, ox, ivx, mnx, mxx)
    ly, hy = slab1(pary, oy, ivy, mny, mxy)
    lz, hz = slab1(parz, oz, ivz, mnz, mxz)
    return jnp.maximum(lx, jnp.maximum(ly, lz)), \
        jnp.minimum(hx, jnp.minimum(hy, hz))

  num_nodes = node_ref.shape[0] // 16 * _LANES
  live = (tmax > 0.0).astype(jnp.float32)

  def cond(c):
    i, occ = c
    return (i < num_nodes) & jnp.any((live - occ) > 0.5)

  def body(c):
    i, occ = c
    nc = _read_packed(node_ref, i)
    hitL, hitR, Lf, Rf, Lc, Rc, skip = _fat_step(nc, slab3, tmin, tmax)
    open_ray = occ < 0.5
    anyL = jnp.any(hitL & open_ray)
    anyR = jnp.any(hitR & open_ray)

    def prim_body_from(first):
      def prim_body(k, occ):
        row = _read_packed(tri_ref, first + k)
        ok, _, _, _, _ = _tri_hit(row, ox, oy, oz, dx, dy, dz, tmin, tmax,
                                  jnp.full(ox.shape, jnp.inf, jnp.float32))
        return jnp.maximum(occ, ok.astype(jnp.float32))
      return prim_body

    occ = jax.lax.fori_loop(0, jnp.where(anyL & (Lc > 0), Lc, 0),
                            prim_body_from(Lf), occ)
    occ = jax.lax.fori_loop(0, jnp.where(anyR & (Rc > 0), Rc, 0),
                            prim_body_from(Rf), occ)
    descendL = anyL & (Lc == 0)
    goR = anyR & (Rc == 0)
    i_next = jnp.where(descendL, i + 1, jnp.where(goR, Rf, skip))
    return i_next, occ

  _, occ = jax.lax.while_loop(cond, body, (jnp.int32(0),
                                           jnp.zeros(ox.shape, jnp.float32)))
  occ_out[...] = occ


def _fat_tables(bvh, tri_v0, tri_e1, tri_e2, tri_mask):
  """Packed fat-node table + triangle table. Padded fat rows carry empty
  boxes (finite sentinels) and skip = padded end."""
  num_t = tri_v0.shape[0]
  fat = bvh.fat_rows
  ni = fat.shape[0]
  npad = (-ni) % _LANES
  if npad:
    pad = jnp.zeros((npad, 16), jnp.float32)
    pad = pad.at[:, 0:3].set(3e38).at[:, 3:6].set(-3e38)
    pad = pad.at[:, 6:9].set(3e38).at[:, 9:12].set(-3e38)
    pad = pad.at[:, 15].set(float(ni + npad))
    fat = jnp.concatenate([fat, pad])

  order = bvh.prim_index
  mask = jnp.ones(num_t, jnp.float32) if tri_mask is None \
      else tri_mask.astype(jnp.float32)
  tri_rows = jnp.concatenate(
      [tri_v0[order], tri_e1[order], tri_e2[order],
       mask[order][:, None], order.astype(jnp.float32)[:, None],
       jnp.zeros((num_t, 5), jnp.float32)], axis=1)
  return _pack16(fat), _pack16(tri_rows)


@functools.partial(jax.jit, static_argnames=("interpret", "rb"))
def intersect_bvh_fat_pallas(bvh, tri_v0, tri_e1, tri_e2, o, d, t_min, t_max,
                             tri_mask=None, interpret: bool = False,
                             rb: int = _RB) -> Hit:
  """Closest hit via the fat-node DFS-stream kernel."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  num_r = o.shape[0]
  node_tab, tri_tab = _fat_tables(bvh, tri_v0, tri_e1, tri_e2, tri_mask)
  planes, rp, g = _ray_planes(o, d, t_min, t_max, num_r, rb)

  grid = (g // rb,)
  kw = {"memory_space": pltpu.VMEM} if not interpret else {}
  node_spec = pl.BlockSpec(node_tab.shape, lambda i: (0, 0), **kw)
  tri_spec = pl.BlockSpec(tri_tab.shape, lambda i: (0, 0), **kw)
  ray_spec = pl.BlockSpec((rb, _LANES), lambda i: (i, 0), **kw)

  out_shape = [
      jax.ShapeDtypeStruct((g, _LANES), jnp.float32),
      jax.ShapeDtypeStruct((g, _LANES), jnp.int32),
      jax.ShapeDtypeStruct((g, _LANES), jnp.float32),
      jax.ShapeDtypeStruct((g, _LANES), jnp.float32),
  ]
  t, tri, u, v = pl.pallas_call(
      _kernel_bvh_fat,
      grid=grid,
      in_specs=[node_spec, tri_spec] + [ray_spec] * 8,
      out_specs=[ray_spec] * 4,
      out_shape=out_shape,
      interpret=interpret,
  )(node_tab, tri_tab, *planes)

  return Hit(t.reshape(rp)[:num_r], tri.reshape(rp)[:num_r],
             u.reshape(rp)[:num_r], v.reshape(rp)[:num_r])


@functools.partial(jax.jit, static_argnames=("interpret", "rb"))
def occluded_bvh_fat_pallas(bvh, tri_v0, tri_e1, tri_e2, o, d, t_min, t_max,
                            tri_mask=None, interpret: bool = False,
                            rb: int = _RB) -> jnp.ndarray:
  """Any-hit occlusion via the fat-node DFS-stream kernel."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  num_r = o.shape[0]
  node_tab, tri_tab = _fat_tables(bvh, tri_v0, tri_e1, tri_e2, tri_mask)
  planes, rp, g = _ray_planes(o, d, t_min, t_max, num_r, rb)

  grid = (g // rb,)
  kw = {"memory_space": pltpu.VMEM} if not interpret else {}
  node_spec = pl.BlockSpec(node_tab.shape, lambda i: (0, 0), **kw)
  tri_spec = pl.BlockSpec(tri_tab.shape, lambda i: (0, 0), **kw)
  ray_spec = pl.BlockSpec((rb, _LANES), lambda i: (i, 0), **kw)

  occ = pl.pallas_call(
      _kernel_bvh_fat_anyhit,
      grid=grid,
      in_specs=[node_spec, tri_spec] + [ray_spec] * 8,
      out_specs=ray_spec,
      out_shape=jax.ShapeDtypeStruct((g, _LANES), jnp.float32),
      interpret=interpret,
  )(node_tab, tri_tab, *planes)

  return occ.reshape(rp)[:num_r] > 0.5


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


# ---------------------------------------------------------------------------
# Dense pair-tile brute kernels (v2).
#
# Layout: rays on SUBLANES (RB rows) x triangles on LANES (TC columns), so
# every Moller-Trumbore term is a natural (RB,1)x(1,TC) broadcast on the VPU
# — no per-triangle scalar extraction and no dynamic row loads serializing
# the pipeline (the v1 kernels above stream one scalar triangle row per
# fori iteration). The triangle table lives VMEM-resident as a transposed
# (16, T) component matrix; chunks of TC lanes stream through a fori_loop.
# Replaces Embree rtcIntersect1/rtcOccluded1 (reference rt/rt.cxx:250-278)
# for small-to-medium scenes; measured ~4x over the v1 brute kernels.
# ---------------------------------------------------------------------------

_B2_RB = 256   # rays per grid program (sublane rows)
_B2_TC = 512   # triangle lanes per chunk


def _b2_ray_cols(ray_ref):
  ox = ray_ref[:, 0:1]
  oy = ray_ref[:, 1:2]
  oz = ray_ref[:, 2:3]
  dx = ray_ref[:, 3:4]
  dy = ray_ref[:, 4:5]
  dz = ray_ref[:, 5:6]
  tmin = ray_ref[:, 6:7]
  tmax = ray_ref[:, 7:8]
  return ox, oy, oz, dx, dy, dz, tmin, tmax


def _b2_tri_rows(tri_ref, s, tc):
  import jax.experimental.pallas as pl
  rows = [tri_ref[r:r + 1, pl.ds(s, tc)] for r in range(10)]
  return rows  # v0xyz, e1xyz, e2xyz, mask


def _kernel_brute2(tri_ref, ray_ref, t_out, tri_out, u_out, v_out):
  ox, oy, oz, dx, dy, dz, tmin, tmax = _b2_ray_cols(ray_ref)
  num_tp = tri_ref.shape[1]
  tc = min(_B2_TC, num_tp)
  n_chunks = num_tp // tc
  rb = ox.shape[0]

  def chunk(c, best):
    # validity is tested division-free on sign-multiplied u*det / v*det /
    # t*det forms; the only per-pair division is t itself (needed for the
    # closest min); u and v divide AFTER the winner select, on (RB,1)
    best_t, best_tri, best_u, best_v = best
    s = c * tc
    (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, _) = _b2_tri_rows(tri_ref, s, tc)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = px * e1x + py * e1y + pz * e1z
    sgn = jnp.where(det >= 0.0, 1.0, -1.0)
    dd = det * sgn
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    a = (tx * px + ty * py + tz * pz) * sgn
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    b = (dx * qx + dy * qy + dz * qz) * sgn
    tt = (e2x * qx + e2y * qy + e2z * qz) * sgn
    ok = ((dd > _MT_EPS) & (a >= 0.0) & (b >= 0.0) & (a + b <= dd)
          & (tt >= tmin * dd) & (tt <= tmax * dd))
    tm = jnp.where(ok, tt / jnp.where(dd == 0.0, 1.0, dd), jnp.inf)
    t_c = jnp.min(tm, axis=1, keepdims=True)                    # (RB,1)
    lane = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 1)
    idx_c = jnp.min(jnp.where(tm == t_c, lane, num_tp), axis=1, keepdims=True)
    onehot = lane == idx_c
    a_c = jnp.sum(jnp.where(onehot, a, 0.0), axis=1, keepdims=True)
    b_c = jnp.sum(jnp.where(onehot, b, 0.0), axis=1, keepdims=True)
    dd_c = jnp.sum(jnp.where(onehot, dd, 0.0), axis=1, keepdims=True)
    inv = 1.0 / jnp.where(dd_c == 0.0, 1.0, dd_c)
    better = t_c < best_t
    return (jnp.where(better, t_c, best_t),
            jnp.where(better, s + idx_c, best_tri),
            jnp.where(better, a_c * inv, best_u),
            jnp.where(better, b_c * inv, best_v))

  best0 = (jnp.full((rb, 1), jnp.inf, jnp.float32),
           jnp.full((rb, 1), -1, jnp.int32),
           jnp.zeros((rb, 1), jnp.float32),
           jnp.zeros((rb, 1), jnp.float32))
  if n_chunks == 1:
    best = chunk(0, best0)
  else:
    best = jax.lax.fori_loop(0, n_chunks, chunk, best0)

  t_out[...], tri_out[...], u_out[...], v_out[...] = best


def _kernel_brute2_anyhit(tri_ref, ray_ref, occ_out):
  """Division-free any-hit: validity tested on sign-multiplied u*det, v*det,
  t*det forms (t in [tmin,tmax] <=> t*det*sgn in [tmin,tmax]*|det|)."""
  ox, oy, oz, dx, dy, dz, tmin, tmax = _b2_ray_cols(ray_ref)
  num_tp = tri_ref.shape[1]
  tc = min(_B2_TC, num_tp)
  n_chunks = num_tp // tc
  rb = ox.shape[0]

  def chunk(c, occ):
    s = c * tc
    (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, _) = _b2_tri_rows(tri_ref, s, tc)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = px * e1x + py * e1y + pz * e1z
    sgn = jnp.where(det >= 0.0, 1.0, -1.0)
    dd = det * sgn
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    a = (tx * px + ty * py + tz * pz) * sgn
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    b = (dx * qx + dy * qy + dz * qz) * sgn
    tt = (e2x * qx + e2y * qy + e2z * qz) * sgn
    ok = ((dd > _MT_EPS) & (a >= 0.0) & (b >= 0.0) & (a + b <= dd)
          & (tt >= tmin * dd) & (tt <= tmax * dd))
    hit = jnp.max(jnp.where(ok, 1.0, 0.0), axis=1, keepdims=True)
    return jnp.maximum(occ, hit)

  occ0 = jnp.zeros((rb, 1), jnp.float32)
  if n_chunks == 1:
    occ = chunk(0, occ0)
  else:
    occ = jax.lax.fori_loop(0, n_chunks, chunk, occ0)
  occ_out[...] = occ


def _brute2_tables(tri_v0, tri_e1, tri_e2, tri_mask, unit=None):
  """Transposed (16, Tpad) component table.

  tri_mask folds into the GEOMETRY (masked tris get zero edges -> det == 0
  -> always invalid), so the kernels spend no per-pair ops on masking;
  padded columns are all-zero and fail the same way."""
  num_t = tri_v0.shape[0]
  if tri_mask is not None:
    m = tri_mask.astype(jnp.float32)[:, None]
    tri_e1 = tri_e1 * m
    tri_e2 = tri_e2 * m
  tab = jnp.concatenate([tri_v0.T, tri_e1.T, tri_e2.T,
                         jnp.zeros((7, num_t), jnp.float32)], axis=0)
  if unit is None:
    unit = _B2_TC if num_t > _B2_TC else _LANES
  tpad = (-num_t) % unit
  if tpad:
    tab = jnp.concatenate([tab, jnp.zeros((16, tpad), jnp.float32)], axis=1)
  return tab


def _brute2_rays(o, d, t_min, t_max):
  num_r = o.shape[0]
  pad = (-num_r) % _B2_RB
  rays = jnp.stack([o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                    t_min, t_max], axis=1)
  if pad:
    filler = jnp.zeros((pad, 8), jnp.float32).at[:, 7].set(-1.0)
    rays = jnp.concatenate([rays, filler])
  return rays, num_r + pad


@functools.partial(jax.jit, static_argnames=())
def intersect_brute2_pallas(tri_v0, tri_e1, tri_e2, o, d, t_min, t_max,
                            tri_mask=None) -> Hit:
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  num_r = o.shape[0]
  tab = _brute2_tables(tri_v0, tri_e1, tri_e2, tri_mask)
  rays, rp = _brute2_rays(o, d, t_min, t_max)

  grid = (rp // _B2_RB,)
  tri_spec = pl.BlockSpec(tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
  ray_spec = pl.BlockSpec((_B2_RB, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)
  col = lambda dt: jax.ShapeDtypeStruct((rp, 1), dt)
  col_spec = pl.BlockSpec((_B2_RB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

  t, tri, u, v = pl.pallas_call(
      _kernel_brute2,
      grid=grid,
      in_specs=[tri_spec, ray_spec],
      out_specs=[col_spec] * 4,
      out_shape=[col(jnp.float32), col(jnp.int32), col(jnp.float32),
                 col(jnp.float32)],
  )(tab, rays)
  return Hit(t[:num_r, 0], tri[:num_r, 0], u[:num_r, 0], v[:num_r, 0])


@functools.partial(jax.jit, static_argnames=())
def occluded_brute2_pallas(tri_v0, tri_e1, tri_e2, o, d, t_min, t_max,
                           tri_mask=None) -> jnp.ndarray:
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  num_r = o.shape[0]
  tab = _brute2_tables(tri_v0, tri_e1, tri_e2, tri_mask)
  rays, rp = _brute2_rays(o, d, t_min, t_max)

  grid = (rp // _B2_RB,)
  tri_spec = pl.BlockSpec(tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
  ray_spec = pl.BlockSpec((_B2_RB, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)
  col_spec = pl.BlockSpec((_B2_RB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

  occ = pl.pallas_call(
      _kernel_brute2_anyhit,
      grid=grid,
      in_specs=[tri_spec, ray_spec],
      out_specs=col_spec,
      out_shape=jax.ShapeDtypeStruct((rp, 1), jnp.float32),
  )(tab, rays)
  return occ[:num_r, 0] > 0.5


# ---------------------------------------------------------------------------
# MXU pair-tile kernels (v3, "Woop").
#
# The Moller-Trumbore per-pair terms are trilinear in (ray, triangle): v2
# spends ~70 VPU ops per pair on them. Woop's unit-triangle transform
# [Woop et al. 2013] factors every heavy term BILINEARLY: with
# A = [e1 e2 n]^-1 (n = e1 x e2) and b = -A v0, the transformed ray
#   w = A o + b,  q = A d
# gives  t = -w_z / q_z,  u = w_x + t q_x,  v = w_y + t q_y  — and each of
# the six components (w, q) is a dot of [o,1] or [d] with per-triangle
# constants. That is one (RB,8) x (8, 6*TC) matmul on the MXU per triangle
# chunk; the VPU keeps ~18 ops/pair of validity tests (vs ~70 for MT).
#
# Numerical note: the z rows are normalized to the UNIT plane normal, so
# w_z is a world-space signed plane distance and q_z a cosine; t = -w_z/q_z
# is then well-conditioned, and u/v are recovered as u = w_x + t q_x
# (magnitudes ~|A_u| * dist). The division-free cross form
# (w_x q_z - w_z q_x) was measured to lose ~1.0 ULP-amplified barycentric
# units on sliver triangles (f32 cancellation at 1e8 magnitudes) — gross
# false hits; one VPU reciprocal per pair buys it back. Replaces Embree
# rtcIntersect1/rtcOccluded1 (rt/rt.cxx:250-278) for small-to-medium scenes.
# ---------------------------------------------------------------------------

_W_RB = 256   # rays per grid program (matmul M dimension)
_W_TC = 512   # triangle lanes per chunk (6*TC matmul N dimension)
_W_QZ_EPS = 1e-7   # |cos(dir, plane normal)| cutoff (unit-normal z rows)


def _woop_post(w6, tc, tmin, tmax):
  """Validity tests on the transformed-ray components; returns
  (ok, t, u, v) per pair. z rows are unit-normal scaled (see header)."""
  wx = w6[:, 0 * tc:1 * tc]
  wy = w6[:, 1 * tc:2 * tc]
  wz = w6[:, 2 * tc:3 * tc]
  qx = w6[:, 3 * tc:4 * tc]
  qy = w6[:, 4 * tc:5 * tc]
  qz = w6[:, 5 * tc:6 * tc]
  live = jnp.abs(qz) > _W_QZ_EPS
  t = -wz / jnp.where(live, qz, 1.0)
  u = wx + t * qx
  v = wy + t * qy
  ok = (live & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t >= tmin) & (t <= tmax))
  return ok, t, u, v


def _woop_ray8(ray_ref):
  o3 = ray_ref[:, 0:3]
  d3 = ray_ref[:, 3:6]
  rb = o3.shape[0]
  one = jnp.ones((rb, 1), jnp.float32)
  zero = jnp.zeros((rb, 1), jnp.float32)
  return jnp.concatenate([o3, one, d3, zero], axis=1)


def _kernel_woop(tri_ref, ray_ref, t_out, tri_out, u_out, v_out):
  tmin = ray_ref[:, 6:7]
  tmax = ray_ref[:, 7:8]
  ray8 = _woop_ray8(ray_ref)
  import jax.experimental.pallas as pl

  cols = tri_ref.shape[1]
  tc = min(_W_TC, cols // 6)
  n_chunks = cols // (6 * tc)
  rb = ray8.shape[0]

  def chunk(c, best):
    best_t, best_tri, best_u, best_v = best
    blk = tri_ref[:, pl.ds(c * 6 * tc, 6 * tc)]
    # HIGHEST: the TPU MXU natively multiplies bf16; the default 1-pass
    # product loses ~1e-2 relative here, which we measured as false
    # hits/misses. 6-pass f32 emulation keeps t/u/v at f32 accuracy.
    w6 = jax.lax.dot_general(ray8, blk, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    ok, tt, uu, vv = _woop_post(w6, tc, tmin, tmax)
    tm = jnp.where(ok, tt, jnp.inf)
    t_c = jnp.min(tm, axis=1, keepdims=True)                     # (RB,1)
    lane = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 1)
    idx_c = jnp.min(jnp.where(tm == t_c, lane, cols), axis=1, keepdims=True)
    onehot = lane == idx_c
    u_c = jnp.sum(jnp.where(onehot, uu, 0.0), axis=1, keepdims=True)
    v_c = jnp.sum(jnp.where(onehot, vv, 0.0), axis=1, keepdims=True)
    better = t_c < best_t
    return (jnp.where(better, t_c, best_t),
            jnp.where(better, c * tc + idx_c, best_tri),
            jnp.where(better, u_c, best_u),
            jnp.where(better, v_c, best_v))

  best0 = (jnp.full((rb, 1), jnp.inf, jnp.float32),
           jnp.full((rb, 1), -1, jnp.int32),
           jnp.zeros((rb, 1), jnp.float32),
           jnp.zeros((rb, 1), jnp.float32))
  if n_chunks == 1:
    best = chunk(0, best0)
  else:
    best = jax.lax.fori_loop(0, n_chunks, chunk, best0)

  t_out[...], tri_out[...], u_out[...], v_out[...] = best


def _kernel_woop_anyhit(tri_ref, ray_ref, occ_out):
  tmin = ray_ref[:, 6:7]
  tmax = ray_ref[:, 7:8]
  ray8 = _woop_ray8(ray_ref)
  import jax.experimental.pallas as pl

  cols = tri_ref.shape[1]
  tc = min(_W_TC, cols // 6)
  n_chunks = cols // (6 * tc)
  rb = ray8.shape[0]

  def chunk(c, occ):
    blk = tri_ref[:, pl.ds(c * 6 * tc, 6 * tc)]
    # HIGHEST: the TPU MXU natively multiplies bf16; the default 1-pass
    # product loses ~1e-2 relative here, which we measured as false
    # hits/misses. 6-pass f32 emulation keeps t/u/v at f32 accuracy.
    w6 = jax.lax.dot_general(ray8, blk, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    ok, _, _, _ = _woop_post(w6, tc, tmin, tmax)
    hit = jnp.max(jnp.where(ok, 1.0, 0.0), axis=1, keepdims=True)
    return jnp.maximum(occ, hit)

  occ0 = jnp.zeros((rb, 1), jnp.float32)
  if n_chunks == 1:
    occ = chunk(0, occ0)
  else:
    occ = jax.lax.fori_loop(0, n_chunks, chunk, occ0)
  occ_out[...] = occ


def _woop_tables(tri_v0, tri_e1, tri_e2, tri_mask):
  """(8, n_chunks*6*TC) matmul table: chunk-contiguous, within a chunk the
  six component groups [w_x w_y w_z q_x q_y q_z] each TC wide.

  Rows 0-2 multiply the ray origin, row 3 is the affine bias (multiplies
  the constant 1), rows 4-6 multiply the direction, row 7 pads to K=8.
  The z rows use the UNIT normal (w_z = world plane distance, q_z = cosine)
  so the in-kernel t = -w_z/q_z division is well-conditioned (see the
  section header). Masked/degenerate/padding triangles get all-zero
  columns -> q_z == 0 -> rejected by the |q_z| > eps test; no per-pair
  masking ops."""
  n = jnp.cross(tri_e1, tri_e2)
  det = jnp.sum(n * n, axis=1, keepdims=True)              # (T,1) = |n|^2
  good = det > 1e-18
  if tri_mask is not None:
    good = good & tri_mask[:, None]
  inv_det = jnp.where(good, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
  r_u = jnp.cross(tri_e2, n) * inv_det                      # A row 0
  r_v = jnp.cross(n, tri_e1) * inv_det                      # A row 1
  inv_len = jnp.where(good, jax.lax.rsqrt(jnp.where(det == 0.0, 1.0, det)), 0.0)
  r_w = n * inv_len                                         # unit normal
  b_u = -jnp.sum(r_u * tri_v0, axis=1)
  b_v = -jnp.sum(r_v * tri_v0, axis=1)
  b_w = -jnp.sum(r_w * tri_v0, axis=1)
  num_t = tri_v0.shape[0]
  z3 = jnp.zeros((3, num_t), jnp.float32)
  z1 = jnp.zeros((1, num_t), jnp.float32)
  # component groups, each (8, T)
  groups = [
      jnp.concatenate([r_u.T, b_u[None, :], z3, z1], axis=0),   # w_x
      jnp.concatenate([r_v.T, b_v[None, :], z3, z1], axis=0),   # w_y
      jnp.concatenate([r_w.T, b_w[None, :], z3, z1], axis=0),   # w_z
      jnp.concatenate([z3, z1, r_u.T, z1], axis=0),             # q_x
      jnp.concatenate([z3, z1, r_v.T, z1], axis=0),             # q_y
      jnp.concatenate([z3, z1, r_w.T, z1], axis=0),             # q_z
  ]
  tab = jnp.stack(groups, axis=1)                           # (8, 6, T)
  unit = _W_TC if num_t > _W_TC else _LANES
  tpad = (-num_t) % unit
  if tpad:
    tab = jnp.concatenate([tab, jnp.zeros((8, 6, tpad), jnp.float32)], axis=2)
  tpad_t = tab.shape[2]
  tc = min(_W_TC, tpad_t)
  n_chunks = tpad_t // tc
  # (8, 6, n_chunks, TC) -> (8, n_chunks, 6, TC) -> flat chunk-contiguous
  tab = tab.reshape(8, 6, n_chunks, tc).transpose(0, 2, 1, 3)
  return tab.reshape(8, n_chunks * 6 * tc)


def _woop_rays(o, d, t_min, t_max):
  num_r = o.shape[0]
  pad = (-num_r) % _W_RB
  rays = jnp.stack([o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                    t_min, t_max], axis=1)
  if pad:
    filler = jnp.zeros((pad, 8), jnp.float32).at[:, 7].set(-1.0)
    rays = jnp.concatenate([rays, filler])
  return rays, num_r + pad


@functools.partial(jax.jit, static_argnames=())
def intersect_woop_pallas(tri_v0, tri_e1, tri_e2, o, d, t_min, t_max,
                          tri_mask=None) -> Hit:
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  num_r = o.shape[0]
  tab = _woop_tables(tri_v0, tri_e1, tri_e2, tri_mask)
  rays, rp = _woop_rays(o, d, t_min, t_max)

  grid = (rp // _W_RB,)
  tri_spec = pl.BlockSpec(tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
  ray_spec = pl.BlockSpec((_W_RB, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)
  col = lambda dt: jax.ShapeDtypeStruct((rp, 1), dt)
  col_spec = pl.BlockSpec((_W_RB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

  t, tri, u, v = pl.pallas_call(
      _kernel_woop,
      grid=grid,
      in_specs=[tri_spec, ray_spec],
      out_specs=[col_spec] * 4,
      out_shape=[col(jnp.float32), col(jnp.int32), col(jnp.float32),
                 col(jnp.float32)],
  )(tab, rays)
  return Hit(t[:num_r, 0], tri[:num_r, 0], u[:num_r, 0], v[:num_r, 0])


@functools.partial(jax.jit, static_argnames=())
def occluded_woop_pallas(tri_v0, tri_e1, tri_e2, o, d, t_min, t_max,
                         tri_mask=None) -> jnp.ndarray:
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  num_r = o.shape[0]
  tab = _woop_tables(tri_v0, tri_e1, tri_e2, tri_mask)
  rays, rp = _woop_rays(o, d, t_min, t_max)

  grid = (rp // _W_RB,)
  tri_spec = pl.BlockSpec(tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
  ray_spec = pl.BlockSpec((_W_RB, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)
  col_spec = pl.BlockSpec((_W_RB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

  occ = pl.pallas_call(
      _kernel_woop_anyhit,
      grid=grid,
      in_specs=[tri_spec, ray_spec],
      out_specs=col_spec,
      out_shape=jax.ShapeDtypeStruct((rp, 1), jnp.float32),
  )(tab, rays)
  return occ[:num_r, 0] > 0.5
