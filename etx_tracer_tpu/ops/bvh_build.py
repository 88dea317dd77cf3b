"""Host-side BVH construction (numpy), flattened to arrays for the device.

Plays the role Embree's BVH build plays behind `Raytracing::commit_changes`
(reference rt/rt.cxx:58-88). Binned-SAH recursive build, emitted as a
flattened depth-first 2-wide tree: for inner nodes the left child is the
next node (i+1) and `node_left` stores the right-child index; leaves
reference a range of the reordered primitive index list.
"""

from __future__ import annotations

import numpy as np

_BINS = 16
_LEAF_SIZE = 4
_MAX_DEPTH = 60


def compute_skip(node_left: np.ndarray, node_count: np.ndarray) -> np.ndarray:
  """Pre-order skip offsets: skip[i] = first node after subtree(i).

  With left child = i+1 the node order is depth-first pre-order, so a
  stream traversal advances i+1 on box hit and skip[i] on miss (or after a
  leaf) — no per-ray stack (the Pallas shared-traversal kernel's layout).
  """
  n = len(node_left)
  skip = np.zeros(n, np.int32)
  stack = [(0, n)]
  while stack:
    i, sk = stack.pop()
    skip[i] = sk
    if node_count[i] == 0 and n > 1:  # inner node
      right = int(node_left[i])
      stack.append((i + 1, right))  # left subtree ends where right begins
      stack.append((right, sk))
  return skip


def build_fat_rows(node_min, node_max, node_left, node_count):
  """Fat-node stream for the Pallas traversal: inner nodes only, each row
  carrying BOTH children's boxes (one packed read + two slab tests per
  step instead of two separate node visits).

  Row components (16): minL(3), maxL(3), minR(3), maxR(3), L_first,
  R_first_or_start, counts = L_count*32 + R_count, skip. For an inner
  child the count is 0 and first is its fat-row index; leaf children are
  consumed in place (no stream entry). Returns (Ni, 16) float32 or None
  when the root is a leaf.
  """
  n = len(node_left)
  if n == 0 or node_count[0] > 0:
    return None
  if int(np.max(node_count)) >= 32:
    return None  # degenerate-split fat leaves don't fit the count packing
  inner_ids = [i for i in range(n) if node_count[i] == 0]
  remap = {orig: new for new, orig in enumerate(inner_ids)}
  ni = len(inner_ids)
  rows = np.zeros((ni, 16), np.float32)

  # skip over the inner-only pre-order stream
  skip = np.zeros(ni, np.int32)
  stack = [(0, ni)]
  while stack:
    orig, sk = stack.pop()
    new = remap[orig]
    skip[new] = sk
    left, right = orig + 1, int(node_left[orig])
    if node_count[left] == 0:
      # left subtree's stream ends where the right child's begins (or at
      # the parent's skip when the right child is a leaf)
      stack.append((left, remap[right] if node_count[right] == 0 else sk))
    if node_count[right] == 0:
      stack.append((right, sk))

  for orig in inner_ids:
    new = remap[orig]
    left, right = orig + 1, int(node_left[orig])
    lc = int(node_count[left])
    rc = int(node_count[right])
    rows[new, 0:3] = node_min[left]
    rows[new, 3:6] = node_max[left]
    rows[new, 6:9] = node_min[right]
    rows[new, 9:12] = node_max[right]
    rows[new, 12] = float(node_left[left]) if lc > 0 else float(remap[left])
    rows[new, 13] = float(node_left[right]) if rc > 0 else float(remap[right])
    rows[new, 14] = float(lc * 32 + rc)
    rows[new, 15] = float(skip[new])
  return rows


def build_bvh(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray):
  """Build from triangle vertices (v0, v0+e1, v0+e2). Returns dict of arrays.

  Prefers the native C++ builder (etx_tracer_tpu/native) and falls back to
  this numpy implementation when no toolchain is available.
  """
  try:
    from etx_tracer_tpu import native
    result = native.build_bvh_native(v0, e1, e2)
    if result is not None:
      result["node_skip"] = compute_skip(result["node_left"],
                                         result["node_count"])
      result["fat_rows"] = build_fat_rows(
          result["node_min"], result["node_max"],
          result["node_left"], result["node_count"])
      return result
  except Exception:
    pass
  t = v0.shape[0]
  p1 = v0 + e1
  p2 = v0 + e2
  tri_min = np.minimum(np.minimum(v0, p1), p2)
  tri_max = np.maximum(np.maximum(v0, p1), p2)
  centroid = (tri_min + tri_max) * 0.5

  prim = np.arange(t, dtype=np.int32)

  node_min, node_max, node_left, node_count = [], [], [], []
  out_prims = []

  def add_node():
    node_min.append(np.zeros(3, np.float32))
    node_max.append(np.zeros(3, np.float32))
    node_left.append(0)
    node_count.append(0)
    return len(node_left) - 1

  def sah_split(ids):
    """Return (axis, threshold) by binned SAH, or None for leaf."""
    c = centroid[ids]
    cmin, cmax = c.min(axis=0), c.max(axis=0)
    ext = cmax - cmin
    axis = int(np.argmax(ext))
    if ext[axis] <= 1e-12:
      return None
    # binning
    rel = (c[:, axis] - cmin[axis]) / ext[axis]
    bins = np.minimum((rel * _BINS).astype(np.int32), _BINS - 1)
    best_cost, best_bin = np.inf, -1
    lo = tri_min[ids]
    hi = tri_max[ids]
    for b in range(1, _BINS):
      left_mask = bins < b
      nl = int(left_mask.sum())
      nr = len(ids) - nl
      if nl == 0 or nr == 0:
        continue
      lmin = lo[left_mask].min(axis=0)
      lmax = hi[left_mask].max(axis=0)
      rmin = lo[~left_mask].min(axis=0)
      rmax = hi[~left_mask].max(axis=0)

      def area(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

      cost = area(lmin, lmax) * nl + area(rmin, rmax) * nr
      if cost < best_cost:
        best_cost, best_bin = cost, b
    if best_bin < 0:
      return None
    thresh = cmin[axis] + ext[axis] * best_bin / _BINS
    return axis, thresh

  def recurse(ids, depth):
    ni = add_node()
    node_min[ni] = tri_min[ids].min(axis=0).astype(np.float32)
    node_max[ni] = tri_max[ids].max(axis=0).astype(np.float32)
    if len(ids) <= _LEAF_SIZE or depth >= _MAX_DEPTH:
      node_left[ni] = len(out_prims)
      node_count[ni] = len(ids)
      out_prims.extend(ids.tolist())
      return ni
    split = sah_split(ids)
    if split is None:
      # fall back to median split on the largest axis
      c = centroid[ids]
      axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
      order = np.argsort(c[:, axis], kind="stable")
      mid = len(ids) // 2
      left_ids, right_ids = ids[order[:mid]], ids[order[mid:]]
      if len(left_ids) == 0 or len(right_ids) == 0:
        node_left[ni] = len(out_prims)
        node_count[ni] = len(ids)
        out_prims.extend(ids.tolist())
        return ni
    else:
      axis, thresh = split
      mask = centroid[ids, axis] < thresh
      left_ids, right_ids = ids[mask], ids[~mask]
      if len(left_ids) == 0 or len(right_ids) == 0:
        node_left[ni] = len(out_prims)
        node_count[ni] = len(ids)
        out_prims.extend(ids.tolist())
        return ni
    # depth-first layout: left child is ni+1, store the right child index
    recurse(left_ids, depth + 1)
    ri = recurse(right_ids, depth + 1)
    node_left[ni] = ri
    node_count[ni] = 0
    return ni

  import sys
  old_limit = sys.getrecursionlimit()
  sys.setrecursionlimit(10000)
  try:
    if t > 0:
      recurse(prim, 0)
    else:
      ni = add_node()
      node_min[ni] = np.zeros(3, np.float32)
      node_max[ni] = np.full(3, -1.0, np.float32)
      node_count[ni] = 0
  finally:
    sys.setrecursionlimit(old_limit)

  result = {
      "node_min": np.stack(node_min).astype(np.float32),
      "node_max": np.stack(node_max).astype(np.float32),
      "node_left": np.asarray(node_left, np.int32),
      "node_count": np.asarray(node_count, np.int32),
      "prim_index": np.asarray(out_prims if out_prims else [0], np.int32),
  }
  result["node_skip"] = compute_skip(result["node_left"], result["node_count"])
  result["fat_rows"] = build_fat_rows(
      result["node_min"], result["node_max"],
      result["node_left"], result["node_count"])
  return result
