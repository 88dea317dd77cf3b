"""Row-gather strategies for TPU.

XLA gathers route through the scalar unit and dominate wavefront shading
cost; for the small tables a renderer indexes per ray (materials, emitters,
triangles in Cornell-class scenes) a one-hot matmul on the MXU is far
faster. `take_rows` picks the strategy by table height.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ONEHOT_LIMIT = 1024


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
  """table (N,K), idx (R,) int -> (R,K)."""
  n = table.shape[0]
  if n <= ONEHOT_LIMIT:
    onehot = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :])
    # HIGHEST precision: default TPU matmul precision is bf16 which corrupts
    # gathered geometry/indices; a one-hot gather must be exact.
    return jnp.dot(onehot.astype(table.dtype), table,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
  return table[idx]


def take_rows_weighted(table: jnp.ndarray, idx: jnp.ndarray,
                       weights: jnp.ndarray) -> jnp.ndarray:
  """Weighted multi-row gather: sum_k weights[:,k] * table[idx[:,k]].

  table (N,K), idx (R,S), weights (R,S) -> (R,K). Implements barycentric
  vertex interpolation as ONE matmul when the table is small.
  """
  n = table.shape[0]
  if n <= ONEHOT_LIMIT:
    r, s = idx.shape
    cols = jnp.arange(n, dtype=idx.dtype)
    w = jnp.zeros((r, n), table.dtype)
    for k in range(s):
      w = w + (idx[:, k:k + 1] == cols[None, :]).astype(table.dtype) * weights[:, k:k + 1]
    return jnp.dot(w, table, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
  out = 0.0
  for k in range(idx.shape[1]):
    out = out + table[idx[:, k]] * weights[:, k:k + 1]
  return out
