"""Independent NumPy path tracer — the GOLDEN ANCHOR for the framework.

Re-derives the reference CPU estimator for diffuse Cornell-class scenes
with area emitters (reference semantics: rt/shared/path_tracing_shared.hxx
238-510 — trace, direct-emitter MIS, NEE, cosine BSDF sample, RR), written
from scratch in NumPy with its own RNG, its own intersection routine and
its own sampling strategies. It shares NO device code with the framework,
so agreement between the two is evidence of estimator correctness rather
than self-consistency (SURVEY §4 golden-image strategy; VERDICT round-1
item 6).

Both estimators are unbiased for the same transport problem, so their
high-spp means must agree within Monte-Carlo tolerance even though RNG,
MIS bookkeeping and Russian-roulette policies differ.
"""

from __future__ import annotations

import numpy as np


class RefScene:
  """Flat numpy triangle soup extracted from a SceneBuilder (host descs
  only — no DeviceScene arrays)."""

  def __init__(self, builder):
    v0s, e1s, e2s, alb, emis = [], [], [], [], []
    for pos, idx, mi in zip(builder.positions, builder.indices,
                            builder.mesh_material):
      mat = builder.materials[mi]
      a = (builder.spectra[mat.scattering_spec].integrated_rgb()
           if mat.scattering_spec >= 0 else np.zeros(3))
      e = (builder.spectra[mat.emission_spec].integrated_rgb()
           if mat.emission_spec >= 0 else np.zeros(3))
      pos = np.asarray(pos, np.float64)
      for tri in np.asarray(idx).reshape(-1, 3):
        p0, p1, p2 = pos[tri[0]], pos[tri[1]], pos[tri[2]]
        v0s.append(p0)
        e1s.append(p1 - p0)
        e2s.append(p2 - p0)
        alb.append(a)
        emis.append(e)
    self.v0 = np.asarray(v0s)
    self.e1 = np.asarray(e1s)
    self.e2 = np.asarray(e2s)
    self.albedo = np.asarray(alb)
    self.emission = np.asarray(emis)
    cr = np.cross(self.e1, self.e2)
    self.area = 0.5 * np.linalg.norm(cr, axis=-1)
    self.geo_n = cr / np.maximum(np.linalg.norm(cr, axis=-1, keepdims=True), 1e-12)
    self.emissive = np.nonzero(self.emission.sum(axis=-1) > 0)[0]

    # camera numeric parameters from the built device scene (data, not code)
    scene, config = builder.build()
    cam = scene.camera
    self.cam_pos = np.asarray(cam.position, np.float64)
    self.cam_dir = np.asarray(cam.direction, np.float64)
    self.cam_side = np.asarray(cam.side, np.float64)
    self.cam_up = np.asarray(cam.up, np.float64)
    self.aspect = float(cam.aspect)
    self.tan_half_fov = float(cam.tan_half_fov)
    self.width = config.film_width
    self.height = config.film_height
    self.max_path_length = config.max_path_length
    self.rr_start = config.rr_start


def _closest_hit(sc: RefScene, o, d, t_min=1e-4):
  """Brute-force Moller-Trumbore over all triangles; o,d (R,3)."""
  r = o.shape[0]
  best_t = np.full(r, np.inf)
  best_i = np.full(r, -1, np.int64)
  for i in range(sc.v0.shape[0]):
    e1, e2, v0 = sc.e1[i], sc.e2[i], sc.v0[i]
    p = np.cross(d, e2)
    det = p @ e1
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(det == 0, 1.0, det), 0.0)
    tv = o - v0
    u = np.einsum("rj,rj->r", tv, p) * inv
    q = np.cross(tv, e1)
    v = np.einsum("rj,rj->r", q, d) * inv
    t = (q @ e2) * inv
    ok &= (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min) & (t < best_t)
    best_t = np.where(ok, t, best_t)
    best_i = np.where(ok, i, best_i)
  return best_t, best_i


def _occluded(sc: RefScene, o, d, t_max):
  t, i = _closest_hit(sc, o, d)
  return (i >= 0) & (t < t_max * (1.0 - 1e-4))


def _onb(n):
  """Branchless orthonormal basis (Frisvad-style), n (R,3)."""
  s = np.where(n[:, 2] >= 0.0, 1.0, -1.0)
  a = -1.0 / (s + n[:, 2])
  b = n[:, 0] * n[:, 1] * a
  t = np.stack([1.0 + s * n[:, 0] ** 2 * a, s * b, -s * n[:, 0]], axis=-1)
  bt = np.stack([b, s + n[:, 1] ** 2 * a, -n[:, 1]], axis=-1)
  return t, bt


def render(builder, spp: int, seed: int = 7, chunk: int = 65536):
  """Path-trace the builder's scene; returns (H, W, 3) float64 radiance."""
  sc = RefScene(builder)
  rng = np.random.default_rng(seed)
  w, h = sc.width, sc.height
  film = np.zeros((h * w, 3))

  for s0 in range(spp):
    film += _render_once(sc, rng, chunk)
  return (film / spp).reshape(h, w, 3)


def _render_once(sc: RefScene, rng, chunk):
  w, h = sc.width, sc.height
  n = w * h
  out = np.zeros((n, 3))
  for lo in range(0, n, chunk):
    hi = min(lo + chunk, n)
    out[lo:hi] = _trace_block(sc, rng, np.arange(lo, hi))
  return out


def _trace_block(sc: RefScene, rng, pix):
  r = pix.shape[0]
  px = (pix % sc.width).astype(np.float64)
  py = (pix // sc.width).astype(np.float64)
  # uniform in-pixel jitter (box filter; the device uses Blackman-Harris —
  # sub-pixel filters differ, so comparisons smooth both images first)
  jx = rng.random(r)
  jy = rng.random(r)
  u = (px + jx) / sc.width * 2.0 - 1.0
  v = (py + jy) / sc.height * 2.0 - 1.0
  d = (sc.tan_half_fov
       * (u[:, None] * sc.cam_side + (v / sc.aspect)[:, None] * sc.cam_up)
       + sc.cam_dir)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  o = np.broadcast_to(sc.cam_pos, (r, 3)).copy()

  thr = np.ones((r, 3))
  L = np.zeros((r, 3))
  alive = np.ones(r, bool)
  prev_bsdf_pdf = np.zeros(r)       # solid-angle pdf of the previous bounce
  n_emissive = max(len(sc.emissive), 1)

  for depth in range(1, sc.max_path_length + 1):
    if not alive.any():
      break
    t, ti = _closest_hit(sc, o, d)
    hit = alive & (ti >= 0)
    alive = hit
    tis = np.maximum(ti, 0)
    p_hit = o + t[:, None] * d
    gn = sc.geo_n[tis]
    front = np.einsum("rj,rj->r", gn, d) < 0.0   # facing the ray
    n_sh = np.where(front[:, None], gn, -gn)

    # -- direct emitter hit (front face only), MIS vs our NEE strategy --
    emis = sc.emission[tis]
    is_em = hit & front & (emis.sum(axis=-1) > 0)
    if is_em.any():
      if depth == 1:
        mis = np.ones(r)
      else:
        # pdf of having sampled this point with NEE from the previous vertex
        dist2 = np.maximum(t * t, 1e-12)
        cos_l = np.abs(np.einsum("rj,rj->r", gn, d))
        pdf_area = 1.0 / (n_emissive * np.maximum(sc.area[tis], 1e-12))
        pdf_nee_sa = pdf_area * dist2 / np.maximum(cos_l, 1e-9)
        mis = prev_bsdf_pdf / np.maximum(prev_bsdf_pdf + pdf_nee_sa, 1e-20)
      L += np.where(is_em[:, None], thr * emis * mis[:, None], 0.0)

    albedo = sc.albedo[tis]

    # -- NEE: uniform emissive triangle, uniform point on it --
    if len(sc.emissive) and depth + 1 <= sc.max_path_length:
      sel = sc.emissive[rng.integers(0, len(sc.emissive), r)]
      b1 = rng.random(r)
      b2 = rng.random(r)
      flip = b1 + b2 > 1.0
      b1 = np.where(flip, 1.0 - b1, b1)
      b2 = np.where(flip, 1.0 - b2, b2)
      lp = sc.v0[sel] + b1[:, None] * sc.e1[sel] + b2[:, None] * sc.e2[sel]
      ld = lp - p_hit
      dist2 = np.maximum(np.einsum("rj,rj->r", ld, ld), 1e-12)
      dist = np.sqrt(dist2)
      ldn = ld / dist[:, None]
      cos_s = np.einsum("rj,rj->r", ldn, n_sh)
      cos_l = -np.einsum("rj,rj->r", ldn, sc.geo_n[sel])  # light front face
      pdf_area = 1.0 / (n_emissive * np.maximum(sc.area[sel], 1e-12))
      pdf_nee_sa = pdf_area * dist2 / np.maximum(np.abs(cos_l), 1e-9)
      can = hit & (cos_s > 0) & (cos_l > 0)
      sh_o = p_hit + n_sh * 1e-4
      # distance measured FROM the offset origin: with the unoffset dist,
      # shadow rays from surfaces close beneath the light (offset shrinks
      # the true distance by 1e-4*cos) false-positive on the light itself
      dist_o = np.sqrt(np.maximum(
          np.einsum("rj,rj->r", lp - sh_o, lp - sh_o), 1e-12))
      occ = _occluded(sc, sh_o, ldn, dist_o)
      can &= ~occ
      f = albedo / np.pi
      bsdf_pdf_sa = cos_s / np.pi
      mis = pdf_nee_sa / np.maximum(pdf_nee_sa + bsdf_pdf_sa, 1e-20)
      contrib = thr * f * sc.emission[sel] * (
          cos_s * mis / np.maximum(pdf_nee_sa, 1e-20))[:, None]
      L += np.where(can[:, None], contrib, 0.0)

    # -- cosine-hemisphere continuation --
    t1, t2 = _onb(n_sh)
    r1 = rng.random(r)
    r2 = rng.random(r)
    rad = np.sqrt(r1)
    phi = 2.0 * np.pi * r2
    local = np.stack([rad * np.cos(phi), rad * np.sin(phi),
                      np.sqrt(np.maximum(1.0 - r1, 0.0))], axis=-1)
    nd = (local[:, 0:1] * t1 + local[:, 1:2] * t2 + local[:, 2:3] * n_sh)
    cos_o = np.maximum(np.einsum("rj,rj->r", nd, n_sh), 1e-9)
    prev_bsdf_pdf = cos_o / np.pi
    thr = thr * albedo                 # (f/pi * cos) / (cos/pi) = albedo
    o = p_hit + n_sh * 1e-4
    d = nd

    # -- Russian roulette --
    if depth >= sc.rr_start:
      p_cont = np.clip(thr.max(axis=-1), 0.05, 1.0)
      die = rng.random(r) >= p_cont
      alive &= ~die
      thr = thr / p_cont[:, None]
    alive &= thr.max(axis=-1) > 0

  return L
