"""Independent NumPy path tracer — the GOLDEN ANCHOR for the framework.

Re-derives the reference CPU estimator for Cornell-class scenes with area
emitters (reference semantics: rt/shared/path_tracing_shared.hxx 238-510 —
trace, direct-emitter MIS, NEE, cosine BSDF sample, RR), written from
scratch in NumPy with its own RNG, its own intersection routine and its
own sampling strategies. It shares NO device code with the framework, so
agreement between the two is evidence of estimator correctness rather
than self-consistency (SURVEY §4 golden-image strategy; VERDICT round-1
item 6).

Supported material classes (VERDICT round-3 item 2: the anchor must reach
beyond Lambert so specular transport has an independent check):
  Diffuse      — Lambert, NEE + MIS
  Mirror       — delta reflection, tinted by the scattering spectrum
                 (bsdf_various.hxx mirror)
  Conductor    — SMOOTH only: delta reflection x complex Fresnel
                 (per-RGB-channel eta/k; bsdf_conductor.hxx delta branch)
  Dielectric   — SMOOTH only: Fresnel-selected reflect/refract with the
                 1/eta^2 radiance transport factor
                 (bsdf_dielectric.hxx:73-147 delta branch)
Delta vertices skip NEE; an emitter hit after a delta bounce keeps MIS
weight 1 (the reference's Delta flag handling).

Both estimators are unbiased for the same transport problem, so their
high-spp means must agree within Monte-Carlo tolerance even though RNG,
MIS bookkeeping and Russian-roulette policies differ.
"""

from __future__ import annotations

import numpy as np


class RefScene:
  """Flat numpy triangle soup extracted from a SceneBuilder (host descs
  only — no DeviceScene arrays)."""

  # class codes local to the anchor (NOT the device enum — independence)
  LAMBERT, MIRROR, CONDUCTOR, DIELECTRIC = 0, 1, 2, 3

  def __init__(self, builder):
    from etx_tracer_tpu.scene import types as _st

    def srgb(spec_idx, default=0.0):
      if spec_idx is None or spec_idx < 0:
        return np.full(3, default)
      return np.asarray(builder.spectra[spec_idx].integrated_rgb(),
                        np.float64)

    v0s, e1s, e2s, alb, emis = [], [], [], [], []
    cls_l, refl_l, eta_l, k_l = [], [], [], []
    for pos, idx, mi in zip(builder.positions, builder.indices,
                            builder.mesh_material):
      mat = builder.materials[mi]
      a = srgb(mat.scattering_spec)
      e = srgb(mat.emission_spec)
      if mat.cls == _st.MaterialClass.Mirror:
        c = RefScene.MIRROR
      elif mat.cls == _st.MaterialClass.Conductor:
        c = RefScene.CONDUCTOR
        assert max(mat.roughness) == 0.0, "anchor supports smooth only"
      elif mat.cls == _st.MaterialClass.Dielectric:
        c = RefScene.DIELECTRIC
        assert max(mat.roughness) == 0.0, "anchor supports smooth only"
      else:
        c = RefScene.LAMBERT
      # device query_spd yields 0 for an unset spectrum index
      refl = srgb(getattr(mat, "reflectance_spec", -1), default=0.0)
      # Per-channel RELATIVE IOR = ratio of the int/ext integrated RGBs.
      # In RGB mode every IOR SPD integrates through the CMFs (a constant
      # 1.52 -> (1.82, 1.44, 1.38)), including the implicit exterior
      # "air" constant-1 SPD -> (1.199, 0.950, 0.906); the renderer's
      # Fresnel uses int/ext per channel, so the CMF factors CANCEL and
      # constant IORs stay gray. The anchor reproduces that ratio.
      ext_rgb = _CONST1_RGB if getattr(mat, "ext_ior_eta", -1) < 0 \
          else srgb(mat.ext_ior_eta)
      int_rgb = srgb(mat.int_ior_eta) if mat.int_ior_eta >= 0 \
          else 1.5 * _CONST1_RGB
      eta = int_rgb / np.maximum(ext_rgb, 1e-9)
      kk = srgb(mat.int_ior_k) / np.maximum(ext_rgb, 1e-9)
      pos = np.asarray(pos, np.float64)
      for tri in np.asarray(idx).reshape(-1, 3):
        p0, p1, p2 = pos[tri[0]], pos[tri[1]], pos[tri[2]]
        v0s.append(p0)
        e1s.append(p1 - p0)
        e2s.append(p2 - p0)
        alb.append(a)
        emis.append(e)
        cls_l.append(c)
        refl_l.append(refl)
        eta_l.append(eta)
        k_l.append(kk)
    self.v0 = np.asarray(v0s)
    self.e1 = np.asarray(e1s)
    self.e2 = np.asarray(e2s)
    self.albedo = np.asarray(alb)
    self.emission = np.asarray(emis)
    self.cls = np.asarray(cls_l, np.int64)
    self.refl = np.asarray(refl_l)
    self.eta = np.asarray(eta_l)
    self.kappa = np.asarray(k_l)
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


_LUM = np.array([0.212671, 0.715160, 0.072169])

# standard sRGB/Rec.709 D65 XYZ->linear-RGB matrix (public colorimetry
# constants — same physics as the reference's spectrum.hxx:142-165)
_XYZ_TO_RGB_M = np.array([
    [3.2404542, -1.5371385, -0.4985314],
    [-0.9692660, 1.8760108, 0.0415560],
    [0.0556434, -0.2040259, 1.0572252],
])
# spectrum.hxx:450 kRGBLuminanceScale
_RGB_LUM_SCALE = np.array([0.817660332, 1.05418909, 1.09945524])


def _xyz_to_rgb(xyz):
  return xyz @ _XYZ_TO_RGB_M.T


# integrated RGB of a constant-1.0 SPD (flat E-whitepoint through the CIE
# fits and the D65 Rec.709 matrix) — the implicit exterior-IOR basis
_CONST1_RGB = np.array([1.1988709, 0.95031893, 0.9062707])


def _fresnel_conductor(cos_i, eta, k):
  """Exact unpolarized complex-IOR Fresnel, per channel.

  cos_i (R,), eta/k (R,3) relative to an exterior of 1. Standard
  real-arithmetic form (independent derivation; same physics as the
  device's real-pair fresnel in render/bsdf/common.py)."""
  c = np.clip(np.abs(cos_i), 0.0, 1.0)[:, None]
  c2 = c * c
  sin2 = 1.0 - c2
  e2 = eta * eta
  k2 = k * k
  t0 = e2 - k2 - sin2
  a2b2 = np.sqrt(np.maximum(t0 * t0 + 4.0 * e2 * k2, 0.0))
  t1 = a2b2 + c2
  a = np.sqrt(np.maximum(0.5 * (a2b2 + t0), 0.0))
  t2 = 2.0 * a * c
  rs = (t1 - t2) / np.maximum(t1 + t2, 1e-20)
  t3 = c2 * a2b2 + sin2 * sin2
  t4 = t2 * sin2
  rp = rs * (t3 - t4) / np.maximum(t3 + t4, 1e-20)
  return np.clip(0.5 * (rs + rp), 0.0, 1.0)


def _fresnel_dielectric(cos_i, eta_rel):
  """Scalar dielectric Fresnel; eta_rel = n_transmitted / n_incident."""
  c = np.clip(np.abs(cos_i), 0.0, 1.0)
  sin2_t = (1.0 - c * c) / np.maximum(eta_rel * eta_rel, 1e-20)
  tir = sin2_t >= 1.0
  cos_t = np.sqrt(np.maximum(1.0 - sin2_t, 0.0))
  rs = (c - eta_rel * cos_t) / np.maximum(c + eta_rel * cos_t, 1e-20)
  rp = (eta_rel * c - cos_t) / np.maximum(eta_rel * c + cos_t, 1e-20)
  f = 0.5 * (rs * rs + rp * rp)
  return np.where(tir, 1.0, np.clip(f, 0.0, 1.0)), tir, cos_t


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
  prev_delta = np.ones(r, bool)     # camera rays count as delta (mis = 1)
  n_emissive = max(len(sc.emissive), 1)

  for depth in range(1, sc.max_path_length + 1):
    if not alive.any():
      break
    t, ti = _closest_hit(sc, o, d)
    hit = alive & (ti >= 0)
    alive = hit
    tis = np.maximum(ti, 0)
    p_hit = o + np.where(hit, t, 0.0)[:, None] * d   # miss lanes: keep finite
    gn = sc.geo_n[tis]
    front = np.einsum("rj,rj->r", gn, d) < 0.0   # facing the ray
    n_sh = np.where(front[:, None], gn, -gn)

    # -- direct emitter hit (front face only), MIS vs our NEE strategy --
    emis = sc.emission[tis]
    is_em = hit & front & (emis.sum(axis=-1) > 0)
    if is_em.any():
      # pdf of having sampled this point with NEE from the previous vertex
      dist2 = np.maximum(t * t, 1e-12)
      cos_l = np.abs(np.einsum("rj,rj->r", gn, d))
      pdf_area = 1.0 / (n_emissive * np.maximum(sc.area[tis], 1e-12))
      pdf_nee_sa = pdf_area * dist2 / np.maximum(cos_l, 1e-9)
      mis = prev_bsdf_pdf / np.maximum(prev_bsdf_pdf + pdf_nee_sa, 1e-20)
      mis = np.where(prev_delta, 1.0, mis)
      L += np.where(is_em[:, None], thr * emis * mis[:, None], 0.0)

    albedo = sc.albedo[tis]
    cls = sc.cls[tis]
    is_lam = cls == RefScene.LAMBERT

    # -- NEE: uniform emissive triangle, uniform point on it (Lambert
    #    vertices only; delta lobes carry no NEE strategy) --
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
      can = hit & is_lam & (cos_s > 0) & (cos_l > 0)
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

    # -- continuation, per material class --
    # Lambert: cosine-hemisphere sample
    t1, t2 = _onb(n_sh)
    r1 = rng.random(r)
    r2 = rng.random(r)
    rad = np.sqrt(r1)
    phi = 2.0 * np.pi * r2
    local = np.stack([rad * np.cos(phi), rad * np.sin(phi),
                      np.sqrt(np.maximum(1.0 - r1, 0.0))], axis=-1)
    nd_lam = (local[:, 0:1] * t1 + local[:, 1:2] * t2 + local[:, 2:3] * n_sh)
    cos_o = np.maximum(np.einsum("rj,rj->r", nd_lam, n_sh), 1e-9)
    pdf_lam = cos_o / np.pi
    w_lam = albedo                    # (f/pi * cos) / (cos/pi) = albedo

    # delta reflection about the facing normal (mirror + smooth conductor)
    cos_i = np.abs(np.einsum("rj,rj->r", d, n_sh))
    nd_refl = d + 2.0 * cos_i[:, None] * n_sh
    nd_refl /= np.maximum(np.linalg.norm(nd_refl, axis=-1, keepdims=True),
                          1e-12)
    w_mirror = albedo                  # scattering-spectrum tint
    f_cond = _fresnel_conductor(cos_i, sc.eta[tis], sc.kappa[tis])
    # RGB mode treats the per-channel conductor Fresnel as XYZ and converts
    # (spectrum.hxx kRGBLuminanceScale; bsdf.hxx:363-365) — the device does
    # the same (render/bsdf/common.py fresnel int_is_conductor branch)
    f_cond = _xyz_to_rgb(f_cond) * _RGB_LUM_SCALE
    w_cond = sc.refl[tis] * np.clip(f_cond, 0.0, None)

    # smooth dielectric: Fresnel-selected reflect/refract. The refraction
    # GEOMETRY uses the gray eta (luminance of the IOR RGB — the device's
    # monochromatic()); the Fresnel WEIGHTS are per-RGB-channel, because in
    # RGB mode an IOR SPD integrates to a non-gray triple (a constant 1.52
    # dielectric -> (1.82, 1.44, 1.38); luminance exactly 1.52), and the
    # reference/device compute F per channel (bsdf_dielectric.hxx via
    # fresnel::calculate), tinting reflection by F/F_mono and transmission
    # by (1-F)/(1-F_mono).
    eta_s = np.maximum(sc.eta[tis] @ _LUM, 1e-6)
    eta_rel = np.where(front, eta_s, 1.0 / eta_s)   # far over near
    eta_rel_rgb = np.where(front[:, None], sc.eta[tis],
                           1.0 / np.maximum(sc.eta[tis], 1e-6))
    f_rgb = np.stack([
        _fresnel_dielectric(cos_i, eta_rel_rgb[:, c])[0] for c in range(3)
    ], axis=-1)
    f_mono = np.clip(f_rgb @ _LUM, 0.0, 1.0)
    _, tir, cos_t = _fresnel_dielectric(cos_i, eta_rel)
    pick_reflect = (rng.random(r) < f_mono) | tir
    inv_eta = 1.0 / eta_rel
    nd_refr = (inv_eta[:, None] * d
               + (inv_eta * cos_i - cos_t)[:, None] * n_sh)
    nd_refr /= np.maximum(np.linalg.norm(nd_refr, axis=-1, keepdims=True),
                          1e-12)
    nd_diel = np.where(pick_reflect[:, None], nd_refl, nd_refr)
    # reflect: reflectance tint x F/F_mono; transmit: scattering tint x
    # (1-F)/(1-F_mono) x the 1/eta^2 radiance transport factor; TIR: plain
    # reflectance tint (bsdf_dielectric.hxx delta branch)
    w_refl = sc.refl[tis] * f_rgb / np.maximum(f_mono, 1e-9)[:, None]
    w_refl = np.where(tir[:, None], sc.refl[tis], w_refl)
    w_tran = (albedo * (1.0 - f_rgb)
              / np.maximum(1.0 - f_mono, 1e-9)[:, None]
              * (inv_eta * inv_eta)[:, None])
    w_diel = np.where(pick_reflect[:, None], w_refl, w_tran)

    is_mir = cls == RefScene.MIRROR
    is_con = cls == RefScene.CONDUCTOR
    is_die = cls == RefScene.DIELECTRIC
    nd = np.where(is_lam[:, None], nd_lam,
                  np.where(is_die[:, None], nd_diel, nd_refl))
    w = np.where(is_lam[:, None], w_lam,
                 np.where(is_mir[:, None], w_mirror,
                          np.where(is_con[:, None], w_cond, w_diel)))
    prev_bsdf_pdf = np.where(is_lam, pdf_lam, 1.0)
    prev_delta = ~is_lam
    thr = thr * w
    # offset to the side of the surface the new ray leaves from
    transmitting = is_die & ~pick_reflect
    o = p_hit + np.where(transmitting[:, None], -n_sh, n_sh) * 1e-4
    d = nd

    # -- Russian roulette --
    if depth >= sc.rr_start:
      p_cont = np.clip(thr.max(axis=-1), 0.05, 1.0)
      die = rng.random(r) >= p_cont
      alive &= ~die
      thr = thr / p_cont[:, None]
    alive &= thr.max(axis=-1) > 0

  return L
