"""Texture bank evaluation + 2D CDF importance sampling.

Counterpart of render/shared/image.hxx + the pool's sampling-table build
(render/host/image_pool.cxx): bilinear evaluation with repeat addressing,
luminance x sin(theta) row-weighted CDFs for environment maps, pdf queries
matching the reference's normalization (image.hxx:76-89).

All images live in one padded (I, H, W, 4) bank; per-image true sizes keep
coordinates right. Lookups are per-ray gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from etx_tracer_tpu.core import math as em


def evaluate(bank, idx, uv):
  """Bilinear RGBA lookup; idx (R,), uv (R,2) -> (R,4).

  Matches Image::evaluate's 2x2 gather (sum of bilinear-weighted texels).
  """
  size = bank.size[idx].astype(jnp.float32)  # (R,2) w,h
  w = size[:, 0]
  h = size[:, 1]
  # repeat addressing in pixel space (image.hxx:157-168)
  x = uv[:, 0] * w - 0.5
  y = uv[:, 1] * h - 0.5
  x0 = jnp.floor(x)
  y0 = jnp.floor(y)
  dx = x - x0
  dy = y - y0

  def wrap(v, n):
    m = jnp.mod(v, n)
    return jnp.where(m < 0, m + n, m).astype(jnp.int32)

  xi0 = wrap(x0, w)
  xi1 = wrap(x0 + 1, w)
  yi0 = wrap(y0, h)
  yi1 = wrap(y0 + 1, h)

  p00 = bank.pixels[idx, yi0, xi0]
  p01 = bank.pixels[idx, yi0, xi1]
  p10 = bank.pixels[idx, yi1, xi0]
  p11 = bank.pixels[idx, yi1, xi1]
  wx0 = (1.0 - dx)[..., None]
  wx1 = dx[..., None]
  wy0 = (1.0 - dy)[..., None]
  wy1 = dy[..., None]
  return (p00 * wx0 + p01 * wx1) * wy0 + (p10 * wx0 + p11 * wx1) * wy1


def bank_is_empty(bank) -> bool:
  """Static check: the builder's dummy 1x1 bank means 'no textures' —
  callers skip texture code entirely at trace time."""
  return bank.pixels.shape[0] == 1 and bank.pixels.shape[1] == 1 and bank.pixels.shape[2] == 1


def apply_rgb_image(scene, response, img_idx, uv, wl, spectral: bool):
  """response *= image RGB when img_idx >= 0 (apply_image semantics)."""
  from etx_tracer_tpu.render import spectral as spx
  if bank_is_empty(scene.images):
    return response
  safe = jnp.maximum(img_idx, 0)
  texel = evaluate(scene.images, safe, uv)
  rgb = texel[:, :3]
  scaled = spx.apply_rgb(response, rgb, wl, spectral)
  return jnp.where((img_idx >= 0)[..., None], scaled, response)


def scalar_image(scene, img_idx, uv, channel, default):
  """Single-channel lookup (evaluate_image, scene.hxx:272-281)."""
  if bank_is_empty(scene.images):
    if hasattr(default, "shape"):
      return default
    return jnp.full(img_idx.shape, default)
  safe = jnp.maximum(img_idx, 0)
  texel = evaluate(scene.images, safe, uv)
  ch = jnp.clip(channel, 0, 3)
  v = jnp.take_along_axis(texel, ch[..., None], axis=-1)[..., 0]
  return jnp.where(img_idx >= 0, v, default)


def _searchsorted_rows(cdf_rows, u, length):
  """Per-lane binary search over gathered CDF rows (R, L)."""
  lo = jnp.zeros(u.shape, jnp.int32)
  hi = jnp.full(u.shape, length - 1, jnp.int32)
  steps = int(np.ceil(np.log2(max(length, 2)))) + 1
  for _ in range(steps):
    mid = (lo + hi) // 2
    cv = jnp.take_along_axis(cdf_rows, mid[..., None], axis=-1)[..., 0]
    go_right = cv < u
    lo = jnp.where(go_right, mid + 1, lo)
    hi = jnp.where(go_right, hi, mid)
  return jnp.clip(hi, 0, length - 1)


def _alias_pick(gather_p, gather_i, u, n):
  """O(1) alias-method draw. gather_p/gather_i map a slot array (R,) to its
  table entries (element gathers — never whole rows). Returns (index,
  sub-uniform): the leftover randomness within the chosen branch is uniform
  and serves as the intra-texel offset."""
  scaled = jnp.clip(u, 0.0, 1.0 - 1e-7) * n
  j = scaled.astype(jnp.int32)
  frac = scaled - j.astype(jnp.float32)
  prob = gather_p(j)
  alias = gather_i(j)
  keep = frac < prob
  idx = jnp.where(keep, j, alias)
  sub = jnp.where(keep,
                  frac / jnp.maximum(prob, 1e-12),
                  (frac - prob) / jnp.maximum(1.0 - prob, 1e-12))
  return idx, jnp.clip(sub, 0.0, 1.0 - 1e-7)


def sample(bank, idx, rnd):
  """Importance-sample (uv, pdf) from an image's 2D distribution
  (image.hxx:119-148 semantics — identical density, alias-table draw).

  The reference walks row/column CDFs; a per-lane binary search would
  gather whole (R, W) CDF rows (hundreds of MB of HBM per NEE for big env
  maps), so sampling uses Vose alias tables: a couple of scalar gathers
  per draw with the same piecewise-constant distribution.
  """
  size = bank.size[idx]
  fw = size[:, 0].astype(jnp.float32)
  fh = size[:, 1].astype(jnp.float32)

  if bank.col_ap is not None:
    h_pad = bank.col_ap.shape[1]
    w_pad = bank.row_ap.shape[2]
    # alias slots are uniform over the PADDED extents; out-of-image slots
    # have zero probability so picks always land inside the true image
    y, dy = _alias_pick(lambda j: bank.col_ap[idx, j],
                        lambda j: bank.col_ai[idx, j], rnd[:, 1], h_pad)
    x, dx = _alias_pick(lambda j: bank.row_ap[idx, y, j],
                        lambda j: bank.row_ai[idx, y, j], rnd[:, 0], w_pad)
  else:  # CDF fallback (banks built before alias tables existed)
    h_pad = bank.col_cdf.shape[1]
    w_pad = bank.row_cdf.shape[2]
    col_rows = bank.col_cdf[idx]       # (R, Hpad)
    y = _searchsorted_rows(col_rows, rnd[:, 1], h_pad)
    row_rows = bank.row_cdf[idx, y]    # (R, Wpad)
    x = _searchsorted_rows(row_rows, rnd[:, 0], w_pad)

    def cdf_at(rows, i):
      prev = jnp.where(i > 0, jnp.take_along_axis(rows, jnp.maximum(i - 1, 0)[..., None], -1)[..., 0], 0.0)
      cur = jnp.take_along_axis(rows, i[..., None], -1)[..., 0]
      return prev, cur

    x0c, x1c = cdf_at(row_rows, x)
    y0c, y1c = cdf_at(col_rows, y)
    dx = jnp.where(x1c > x0c, (rnd[:, 0] - x0c) / jnp.maximum(x1c - x0c, 1e-12), 0.0)
    dy = jnp.where(y1c > y0c, (rnd[:, 1] - y0c) / jnp.maximum(y1c - y0c, 1e-12), 0.0)

  uv = jnp.stack([(x.astype(jnp.float32) + dx) / fw,
                  (y.astype(jnp.float32) + dy) / fh], axis=-1)
  pdf = pdf_at(bank, idx, uv)
  return uv, pdf


def pdf_at(bank, idx, uv):
  """Sampling pdf at uv (Image::evaluate pdf path, image.hxx:79-86)."""
  texel = evaluate(bank, idx, uv)
  lum = em.luminance(texel[:, :3])
  s_t = jnp.maximum(jnp.sin(em.kPi * jnp.clip(uv[:, 1], 0.0, 1.0)), 0.0)
  uniform = bank.size[idx, 1] <= 1
  s_t = jnp.where(uniform, 1.0, s_t)
  return lum * s_t / jnp.maximum(bank.normalization[idx], 1e-12)


# ---------------------------------------------------------------------------
# Host-side bank building
# ---------------------------------------------------------------------------


def _alias_table(p: np.ndarray):
  """Vose alias method. p: probabilities summing to 1 (zeros allowed).

  Returns (prob, alias): draw j uniform, keep j if frac < prob[j] else
  take alias[j] — identical distribution to a CDF search in O(1)."""
  n = p.shape[0]
  prob = np.zeros(n, np.float32)
  alias = np.zeros(n, np.int32)
  scaled = p.astype(np.float64) * n
  small = [i for i in range(n) if scaled[i] < 1.0]
  large = [i for i in range(n) if scaled[i] >= 1.0]
  while small and large:
    s = small.pop()
    l = large.pop()
    prob[s] = scaled[s]
    alias[s] = l
    scaled[l] = (scaled[l] + scaled[s]) - 1.0
    (small if scaled[l] < 1.0 else large).append(l)
  for i in large:
    prob[i] = 1.0
  for i in small:  # numerical leftovers
    prob[i] = 1.0
  return prob, alias


def build_bank(images: list[dict]):
  """images: list of {pixels (H,W,4) float32, offset (2,), u_scale, build_cdf}.

  Returns a scene.types.ImageBank.
  """
  from etx_tracer_tpu.scene.types import ImageBank

  if not images:
    return None
  h_max = max(im["pixels"].shape[0] for im in images)
  w_max = max(im["pixels"].shape[1] for im in images)
  n = len(images)
  pixels = np.zeros((n, h_max, w_max, 4), np.float32)
  size = np.zeros((n, 2), np.int32)
  offset = np.zeros((n, 2), np.float32)
  scale_u = np.ones(n, np.float32)
  normalization = np.ones(n, np.float32)
  col_ap = np.ones((n, h_max), np.float32)
  col_ai = np.zeros((n, h_max), np.int32)
  row_ap = np.ones((n, h_max, w_max), np.float32)
  row_ai = np.zeros((n, h_max, w_max), np.int32)

  # alias rows batched across images: ONE native call builds every per-row
  # and per-column table (a pure-Python Vose loop over a 4k env map took
  # tens of seconds of scene-build time; ADVICE round-1 item)
  col_batch = []   # (n_cdf, h_max) marginal-over-y probabilities
  row_batch = []   # (n_cdf * h_max, w_max) conditional-over-x probabilities
  cdf_ids = []
  any_cdf = False

  for i, im in enumerate(images):
    px = im["pixels"].astype(np.float32)
    h, w = px.shape[:2]
    pixels[i, :h, :w] = px
    size[i] = (w, h)
    offset[i] = im.get("offset", (0.0, 0.0))
    scale_u[i] = im.get("u_scale", 1.0)
    if im.get("build_cdf", False):
      any_cdf = True
      lum = (px[..., 0] * 0.212671 + px[..., 1] * 0.715160 + px[..., 2] * 0.072169)
      v = (np.arange(h) + 0.5) / h
      row_w = np.ones(h) if im.get("uniform", False) or h == 1 else np.sin(v * np.pi)
      row_sums = lum.sum(axis=1)
      # conditional distribution over x within each row; zero rows fall back
      # to uniform over the TRUE width (they are never selected — their
      # marginal weight is 0 — but must not sample out-of-image texels)
      safe = np.where(row_sums > 0, row_sums, 1.0)[:, None]
      rp = np.where((row_sums > 0)[:, None], lum / safe, 1.0 / w)
      # marginal over y with sin weight
      weighted = row_sums * row_w
      total = weighted.sum()
      cp = weighted / (total if total > 0 else 1.0)
      normalization[i] = total / (w * h)
      # alias tables over the PADDED extents (pad entries get zero prob)
      cp_pad = np.zeros(h_max, np.float64)
      cp_pad[:h] = cp
      rp_pad = np.zeros((h_max, w_max), np.float64)
      rp_pad[:h, :w] = rp
      cdf_ids.append(i)
      col_batch.append(cp_pad)
      row_batch.append(rp_pad)

  if any_cdf:
    from etx_tracer_tpu import native
    cols = np.asarray(col_batch, np.float32)
    rows = np.concatenate(row_batch, axis=0).astype(np.float32)
    built_c = native.build_alias_tables(cols)
    built_r = native.build_alias_tables(rows)
    if built_c is None or built_r is None:  # no toolchain: Python Vose
      built_c = (np.stack([_alias_table(c)[0] for c in cols]),
                 np.stack([_alias_table(c)[1] for c in cols]))
      built_r = (np.stack([_alias_table(r)[0] for r in rows]),
                 np.stack([_alias_table(r)[1] for r in rows]))
    for k, i in enumerate(cdf_ids):
      col_ap[i], col_ai[i] = built_c[0][k], built_c[1][k]
      row_ap[i] = built_r[0][k * h_max:(k + 1) * h_max]
      row_ai[i] = built_r[1][k * h_max:(k + 1) * h_max]

  # the device bank keeps only what sampling/pdf queries read: alias tables
  # + per-texel pdf normalization. The row/col CDFs are superseded by the
  # alias tables and would double env-table memory (ADVICE round-1 item).
  dummy3 = np.ones((1, 1, 1), np.float32)
  dummy2 = np.ones((1, 1), np.float32)
  return ImageBank(
      pixels=jnp.asarray(pixels), size=jnp.asarray(size),
      inv_size=jnp.asarray(1.0 / np.maximum(size, 1).astype(np.float32)),
      row_cdf=jnp.asarray(dummy3), row_pdf=jnp.asarray(dummy3),
      col_cdf=jnp.asarray(dummy2), col_pdf=jnp.asarray(dummy2),
      offset=jnp.asarray(offset), scale_u=jnp.asarray(scale_u),
      normalization=jnp.asarray(normalization),
      col_ap=jnp.asarray(col_ap), col_ai=jnp.asarray(col_ai),
      row_ap=jnp.asarray(row_ap), row_ai=jnp.asarray(row_ai))


def apply_normal_map(scene, sd, geo_n):
  """Tangent-space normal mapping (make_intersection, scene.hxx:213-226).

  Returns the updated ShadingData (no-op when the bank is empty).
  """
  if bank_is_empty(scene.images):
    return sd
  img = sd.mat.normal_img
  scale = sd.mat.normal_scale
  active = (img >= 0) & (scale > em.kEpsilon)
  texel = evaluate(scene.images, jnp.maximum(img, 0), sd.tex)
  n_ts = texel[:, :3] * 2.0 - 1.0
  n_ts = jnp.concatenate([n_ts[:, :2] * scale[..., None], n_ts[:, 2:3]], axis=-1)
  n_ts = n_ts / jnp.maximum(jnp.linalg.norm(n_ts, axis=-1, keepdims=True), 1e-9)
  nrm = (sd.tan * n_ts[:, 0:1] + sd.btn * n_ts[:, 1:2] + sd.nrm * n_ts[:, 2:3])
  nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)

  # orient_normals_to_hemisphere (scene.hxx:188-200): blend toward geo_n
  # until the shading normal agrees with the geometric side of w_i
  w_i = sd.w_i
  i_dot_g = em.dot(w_i, geo_n)
  n_fixed = nrm
  for _ in range(4):
    bad = (em.dot(w_i, n_fixed) * i_dot_g) <= em.kEpsilon
    blended = n_fixed * 8.0 + geo_n
    blended = blended / jnp.maximum(jnp.linalg.norm(blended, axis=-1, keepdims=True), 1e-9)
    n_fixed = jnp.where(bad[..., None], blended, n_fixed)

  tan = sd.tan - n_fixed * em.dot(sd.tan, n_fixed)[..., None]
  tan = tan / jnp.maximum(jnp.linalg.norm(tan, axis=-1, keepdims=True), 1e-9)
  btn = jnp.cross(n_fixed, tan)

  m = active[..., None]
  return sd._replace(
      nrm=jnp.where(m, n_fixed, sd.nrm),
      tan=jnp.where(m, tan, sd.tan),
      btn=jnp.where(m, btn, sd.btn))
