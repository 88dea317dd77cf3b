"""Discrete 1D sampling distributions (CDF tables).

Counterpart of the reference Distribution (render/shared/distribution.hxx)
and its builder (render/host/distribution_builder.hxx). The host builds a
normalized CDF with numpy; device sampling is a vectorized searchsorted —
no per-ray binary-search loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def build(values: np.ndarray):
  """Build (pdf, cdf, total_weight) from non-negative weights.

  cdf[i] = sum of pdf[0..i] (inclusive), so sampling uses searchsorted(left).
  """
  values = np.asarray(values, dtype=np.float64)
  total = values.sum()
  if total <= 0.0:
    n = len(values)
    pdf = np.full(n, 1.0 / max(n, 1))
    total = 0.0
  else:
    pdf = values / total
  cdf = np.cumsum(pdf)
  cdf[-1] = 1.0
  return pdf.astype(np.float32), cdf.astype(np.float32), float(total)


def sample(cdf: jnp.ndarray, pdf: jnp.ndarray, rnd: jnp.ndarray):
  """Sample indices from the CDF; returns (index, pdf[index])."""
  idx = jnp.searchsorted(cdf, rnd, side="left")
  idx = jnp.clip(idx, 0, cdf.shape[0] - 1).astype(jnp.int32)
  return idx, pdf[idx]
