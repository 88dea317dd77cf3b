"""Subsurface scattering: Burley remap + random-walk gather + CB profile.

Vectorized port of render/shared/scene_bssrdf_subsurface.hxx and the
random-walk gather (rt/shared/path_tracing_shared.hxx:61-147): the walk
steps through the object interior with channel-MIS exponential distances,
restricted to the entry material's geometry (Raytracing::trace_material,
rt/rt.cxx:327-371), as a bounded masked `lax.while_loop`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from etx_tracer_tpu.core import math as em
from etx_tracer_tpu.core import rng
from etx_tracer_tpu.ops import gather as gops
from etx_tracer_tpu.ops import trace as trace_ops
from etx_tracer_tpu.render import media as media_mod
from etx_tracer_tpu.render import spectral as spx
from etx_tracer_tpu.scene import packed

_MAX_WALK = 64
_MAX_SKIPS = 4


def remap(color, distances):
  """Burley parameter remap (scene_bssrdf_subsurface.hxx:17-44).

  color/distances: (R,C). Returns (albedo, extinction, scattering).
  """
  a = 1.826052378200
  b = 4.985111943850 + 0.12735595943800
  c = 1.096861024240
  d = 0.496310210422
  e = 4.231902997010 + 0.00310603949088
  f = 2.406029994080
  k_min = 1.0 / 1024.0

  col = jnp.maximum(color, 0.0)
  blend = jnp.power(col, 0.25)
  albedo = ((1.0 - blend) * a * jnp.power(jnp.arctan(b * col), c)
            + blend * d * jnp.power(jnp.arctan(e * col), f))
  albedo = jnp.clip(albedo, 0.0, 1.0 - em.kEpsilon)
  extinction = 1.0 / jnp.maximum(distances, k_min)
  scattering = extinction * albedo
  return albedo, extinction, scattering


def trace_material(scene, o, d, t_min, t_max, mat_target, rng_state=None):
  """Closest hit restricted to one material id (rt.cxx:327-371).

  Skips non-matching hits by re-tracing past them (bounded)."""
  r = o.shape[0]

  def cond(carry):
    cur_o, traveled, found, _, _, _, active, it = carry
    return jnp.any(active) & (it < _MAX_SKIPS)

  def body(carry):
    cur_o, traveled, found, best_t, best_hit, best_tri, active, it = carry
    rem = jnp.maximum(t_max - traveled, 0.0)
    hit = trace_ops.trace_closest(scene, cur_o, d, jnp.full(r, em.kRayEpsilon),
                                  jnp.where(active, rem, 0.0))
    trows = packed.TriRows(gops.take_rows(scene.tri_table, jnp.maximum(hit.tri, 0)))
    match = hit.found & (trows.mat == mat_target)
    newly = active & match
    found = found | newly
    best_t = jnp.where(newly, traveled + hit.t, best_t)
    best_hit = jnp.where(newly[..., None],
                         jnp.stack([hit.u, hit.v, hit.t], axis=-1), best_hit)
    best_tri = jnp.where(newly, hit.tri, best_tri)
    # skip non-matching hits
    skip = active & hit.found & ~match
    step = hit.t + 4.0 * em.kRayEpsilon
    cur_o = jnp.where(skip[..., None], cur_o + d * step[..., None], cur_o)
    traveled = jnp.where(skip, traveled + step, traveled)
    active = skip
    return cur_o, traveled, found, best_t, best_hit, best_tri, active, it + 1

  carry = (o, jnp.zeros(r), jnp.zeros(r, bool), jnp.full(r, jnp.inf),
           jnp.zeros((r, 3)), jnp.full(r, -1, jnp.int32), jnp.ones(r, bool),
           jnp.int32(0))
  _, _, found, best_t, best_hit, best_tri, _, _ = jax.lax.while_loop(cond, body, carry)
  return found, best_t, best_hit[:, 0], best_hit[:, 1], best_tri


class SSSGather(NamedTuple):
  found: jnp.ndarray     # (R,)
  pos: jnp.ndarray       # (R,3) exit position
  nrm: jnp.ndarray       # (R,3) exit shading normal (flipped outward)
  geo_n: jnp.ndarray     # (R,3)
  tan: jnp.ndarray
  btn: jnp.ndarray
  uv: jnp.ndarray        # (R,2)
  tri: jnp.ndarray       # (R,) int32
  weight: jnp.ndarray    # (R,C) path throughput through the medium
  w_i: jnp.ndarray       # (R,3) incident direction at the exit (walk/probe
                         # direction; the exit intersection's w_i in the
                         # reference's Gather, used by VCM reverse pdfs)


def gather_rw(scene, sd, mat_idx, entry_pos, rng_state, active, spectral: bool):
  """Random-walk SSS (gather_rw, path_tracing_shared.hxx:61-147).

  sd: entry ShadingData; mat_idx: (R,) raw material indices restricting the
  walk geometry. Returns (SSSGather, rng_state)."""
  r = entry_pos.shape[0]
  c = spx.channels(spectral)

  color = spx.query_spd(scene, sd.mat.scattering_spec, sd.wl, spectral)
  distances = spx.query_spd(scene, sd.mat.subsurface_spec, sd.wl, spectral)
  albedo, extinction, scattering = remap(color, distances)

  # initial direction: diffuse hemisphere below the surface (Path::Diffuse)
  rng_state, rnd0 = rng.next_2d(rng_state)
  d0 = em.sample_cosine_distribution_n(rnd0, -sd.nrm, 1.0)
  o0 = em.offset_ray(entry_pos, sd.geo_n * jnp.where(em.dot(sd.geo_n, d0) >= 0, 1.0, -1.0)[..., None])

  def cond(carry):
    rng_state, o, d, thr, found, exit_data, walk_active, it = carry
    return jnp.any(walk_active) & (it < _MAX_WALK)

  def body(carry):
    rng_state, o, d, thr, found, exit_data, walk_active, it = carry
    rng_state, r_ch = rng.next_float(rng_state)
    channel, ch_pdf = media_mod.sample_spectrum_component(albedo, thr, r_ch, spectral)
    sigma = jnp.take_along_axis(extinction, channel[..., None], -1)[..., 0] if not spectral else extinction[..., 0]
    rng_state, r_t = rng.next_float(rng_state)
    max_t = jnp.where(sigma > 0.0,
                      -jnp.log(jnp.maximum(1.0 - r_t, 1e-10)) / jnp.maximum(sigma, 1e-20),
                      em.kMaxFloat)

    found_i, t_hit, u, v, tri_hit = trace_material(
        scene, o, d, jnp.full(r, em.kRayEpsilon),
        jnp.where(walk_active, max_t, 0.0), mat_idx)

    seg = jnp.where(found_i, t_hit, max_t)
    tr = jnp.exp(-seg[..., None] * extinction)
    pdf = ch_pdf * jnp.where(found_i[..., None], tr, tr * extinction)
    pdf_sum = jnp.sum(pdf, axis=-1)
    w = jnp.where(found_i[..., None], tr, tr * scattering)
    thr_new = thr * w / jnp.maximum(pdf_sum, 1e-30)[..., None]
    dead = (pdf_sum <= 0.0) | (jnp.max(thr_new, axis=-1) <= em.kEpsilon)

    exited = walk_active & found_i & ~dead
    found = found | exited
    exit_new = jnp.concatenate([
        u[..., None], v[..., None], tri_hit.astype(jnp.float32)[..., None],
        d, thr_new], axis=-1)
    exit_data = jnp.where(exited[..., None], exit_new, exit_data)

    # continue walking: move and sample isotropic phase (g=0)
    rng_state, rnd_p = rng.next_2d(rng_state)
    new_d = media_mod.sample_phase_hg(d, jnp.zeros(r), rnd_p)
    o = jnp.where(walk_active[..., None], o + d * seg[..., None], o)
    d = jnp.where(walk_active[..., None], new_d, d)
    thr = jnp.where(walk_active[..., None], thr_new, thr)
    walk_active = walk_active & ~exited & ~dead
    return rng_state, o, d, thr, found, exit_data, walk_active, it + 1

  exit_data0 = jnp.zeros((r, 6 + c))
  carry = (rng_state, o0, d0, jnp.ones((r, c)), jnp.zeros(r, bool),
           exit_data0, active, jnp.int32(0))
  rng_state, _, _, _, found, exit_data, _, _ = jax.lax.while_loop(cond, body, carry)

  u = exit_data[:, 0]
  v = exit_data[:, 1]
  tri = exit_data[:, 2].astype(jnp.int32)
  exit_wi = exit_data[:, 3:6]
  weight = exit_data[:, 6:]

  tri_s = jnp.maximum(tri, 0)
  trows = packed.TriRows(gops.take_rows(scene.tri_table, tri_s))
  w0 = (1.0 - u - v)[..., None]
  w1 = u[..., None]
  w2 = v[..., None]
  tv = gops.take_rows(
      jnp.concatenate([scene.tri_v0, scene.tri_e1, scene.tri_e2], axis=1), tri_s)
  pos = tv[:, 0:3] + u[..., None] * tv[:, 3:6] + v[..., None] * tv[:, 6:9]
  nrm = em.normalize(trows.n0 * w0 + trows.n1 * w1 + trows.n2 * w2)
  tan = em.normalize(trows.t0 * w0 + trows.t1 * w1 + trows.t2 * w2)
  btn = em.normalize(trows.b0 * w0 + trows.b1 * w1 + trows.b2 * w2)
  uv = trows.uv0 * w0 + trows.uv1 * w1 + trows.uv2 * w2

  return SSSGather(found=found, pos=pos, nrm=nrm, geo_n=trows.geo_n,
                   tan=tan, btn=btn, uv=uv, tri=tri,
                   weight=weight, w_i=exit_wi), rng_state


# ---------------------------------------------------------------------------
# Christensen-Burley disk-sampling gather (scene_bssrdf_subsurface.hxx:89-145,
# gather_cb path_tracing_shared.hxx:149-220)
# ---------------------------------------------------------------------------

_CB_HITS = 4          # same-material exits collected per probe (reference: 8)
_CB_MAX_RADIUS = 47.827155457397595950044717258511


def _sample_s_r(rnd):
  """Burley radius CDF inverse (scene_bssrdf_subsurface.hxx:46-54)."""
  lo = jnp.log(1.0 / jnp.maximum(1.0 - jnp.minimum(4.0 * rnd, 1.0 - em.kEpsilon), 1e-10))
  hi_r = jnp.minimum((rnd - 0.25) / 0.75, 1.0 - em.kEpsilon)
  hi = 3.0 * jnp.log(1.0 / jnp.maximum(1.0 - hi_r, 1e-10))
  return jnp.where(rnd < 0.25, lo, hi)


def _cb_profile(sd_dist, radius):
  """CB profile evaluate (scene_bssrdf_subsurface.hxx:56-74). sd_dist (R,C)."""
  radius = jnp.maximum(radius, em.kEpsilon)[..., None]
  term0 = jnp.exp(-radius / (3.0 * jnp.maximum(sd_dist, 1e-8)))
  term1 = term0 * term0 * term0
  div = jnp.maximum(sd_dist * (4.0 * radius * 2.0 * em.kPi), em.kEpsilon)
  return (term0 + term1) / div


def _exit_from_tri(scene, u, v, tri):
  tri_s = jnp.maximum(tri, 0)
  trows = packed.TriRows(gops.take_rows(scene.tri_table, tri_s))
  w0 = (1.0 - u - v)[..., None]
  w1 = u[..., None]
  w2 = v[..., None]
  tv = gops.take_rows(
      jnp.concatenate([scene.tri_v0, scene.tri_e1, scene.tri_e2], axis=1), tri_s)
  pos = tv[:, 0:3] + u[..., None] * tv[:, 3:6] + v[..., None] * tv[:, 6:9]
  nrm = em.normalize(trows.n0 * w0 + trows.n1 * w1 + trows.n2 * w2)
  tan = em.normalize(trows.t0 * w0 + trows.t1 * w1 + trows.t2 * w2)
  btn = em.normalize(trows.b0 * w0 + trows.b1 * w1 + trows.b2 * w2)
  uv = trows.uv0 * w0 + trows.uv1 * w1 + trows.uv2 * w2
  return pos, nrm, trows.geo_n, tan, btn, uv


def gather_cb(scene, sd, mat_idx, entry_pos, rng_state, active, spectral: bool):
  """CB gather: 3 axis-frame disk probes, same-material exits weighted by
  profile/pdf x geometric weight; ONE exit kept by streaming weighted
  reservoir sampling — identical in expectation to the reference's two-pass
  pick (gather_cb :203-218), without storing 24 intersections per lane."""
  r = entry_pos.shape[0]
  c = spx.channels(spectral)

  sdist = spx.query_spd(scene, sd.mat.subsurface_spec, sd.wl, spectral)
  from etx_tracer_tpu.render import images as images_mod
  base_weight = spx.query_spd(scene, sd.mat.scattering_spec, sd.wl, spectral)
  base_weight = images_mod.apply_rgb_image(scene, base_weight, sd.mat.scattering_img,
                                           sd.tex, sd.wl, spectral)

  frames = [
      (sd.tan, sd.btn, sd.nrm, (0.25, 0.25, 0.5)),
      (sd.btn, sd.nrm, sd.tan, (0.25, 0.5, 0.25)),
      (sd.nrm, sd.tan, sd.btn, (0.5, 0.25, 0.25)),
  ]

  total_w = jnp.zeros(r)
  sel_w = jnp.zeros(r)            # average weight of the selected exit
  sel_weight = jnp.zeros((r, c))  # spectral weight of the selected exit
  sel_exit = jnp.zeros((r, 3), jnp.float32)  # u, v, tri
  sel_wi = jnp.zeros((r, 3), jnp.float32)    # probe direction of the pick
  found_any = jnp.zeros(r, bool)

  for (fu, fv, fw, probs) in frames:
    # per-direction channel + radius draws (sample, :91-140)
    rng_state, r_ch = rng.next_float(rng_state)
    channel = jnp.minimum((r_ch * c).astype(jnp.int32), c - 1)
    dist_ch = jnp.take_along_axis(sdist, channel[..., None], -1)[..., 0]
    rng_state, r_rad = rng.next_float(rng_state)
    radius = dist_ch * _sample_s_r(r_rad)
    r_max = dist_ch * _CB_MAX_RADIUS
    rng_state, r_phi = rng.next_float(rng_state)
    phi = 2.0 * em.kPi * r_phi
    height = jnp.sqrt(jnp.maximum(em.sqr(r_max) - em.sqr(radius), 0.0))
    dir_ok = active & (dist_ch > 0.0) & (radius < r_max) & (height > em.kRayEpsilon)

    probe_o = (entry_pos + height[..., None] * fw
               + radius[..., None] * (jnp.cos(phi)[..., None] * fu
                                      + jnp.sin(phi)[..., None] * fv))
    probe_d = -fw
    remaining = 2.0 * height

    # geometric weight denominator pieces are per-exit (need exit normal)
    pu, pv, pw = probs
    cur_o = probe_o
    traveled = jnp.zeros(r)
    probe_active = dir_ok
    for _ in range(_CB_HITS):
      f_i, t_hit, u_i, v_i, tri_i = trace_material(
          scene, cur_o, probe_d, jnp.full(r, em.kRayEpsilon),
          jnp.where(probe_active, jnp.maximum(remaining - traveled, 0.0), 0.0),
          mat_idx)
      got = probe_active & f_i
      pos_i, nrm_i, geo_i, _, _, uv_i = _exit_from_tri(scene, u_i, v_i, tri_i)

      pdf_t = pu * jnp.abs(em.dot(nrm_i, fu))
      pdf_b = pv * jnp.abs(em.dot(nrm_i, fv))
      pdf_n = pw * jnp.abs(em.dot(nrm_i, fw))
      gw = em.sqr(pdf_n) / jnp.maximum(
          em.sqr(pdf_t) + em.sqr(pdf_b) + em.sqr(pdf_n), 1e-20)

      sdist_exit = sdist  # distances SPD has no texture in the table
      pdf = jnp.mean(_cb_profile(sdist_exit, radius), axis=-1)
      dist = jnp.linalg.norm(pos_i - entry_pos, axis=-1)
      ev = _cb_profile(sdist_exit, dist)
      wgt = base_weight * ev / jnp.maximum(pdf, 1e-20)[..., None] * gw[..., None]
      w_avg = jnp.mean(wgt, axis=-1)
      ok = got & (pdf > 0.0) & (w_avg > 0.0)

      total_w = total_w + jnp.where(ok, w_avg, 0.0)
      # weighted reservoir: replace the pick with prob w/total
      rng_state, r_pick = rng.next_float(rng_state)
      take = ok & (r_pick * jnp.maximum(total_w, 1e-30) < w_avg)
      sel_w = jnp.where(take, w_avg, sel_w)
      sel_weight = jnp.where(take[..., None], wgt, sel_weight)
      sel_exit = jnp.where(take[..., None],
                           jnp.stack([u_i, v_i, tri_i.astype(jnp.float32)], -1),
                           sel_exit)
      sel_wi = jnp.where(take[..., None], probe_d, sel_wi)
      found_any = found_any | ok

      # advance past this exit
      step = jnp.where(f_i, t_hit, remaining) + 4.0 * em.kRayEpsilon
      cur_o = jnp.where(got[..., None], cur_o + probe_d * step[..., None], cur_o)
      traveled = traveled + jnp.where(got, step, 0.0)
      probe_active = got & (traveled < remaining)

  u = sel_exit[:, 0]
  v = sel_exit[:, 1]
  tri = sel_exit[:, 2].astype(jnp.int32)
  pos, nrm, geo_n, tan, btn, uv = _exit_from_tri(scene, u, v, tri)
  # RIS estimator: weight = w_sel * total/avg_sel (selected_sample_weight)
  ris = total_w / jnp.maximum(sel_w, 1e-30)
  weight = sel_weight * ris[..., None]
  return SSSGather(found=found_any, pos=pos, nrm=nrm, geo_n=geo_n,
                   tan=tan, btn=btn, uv=uv, tri=tri,
                   weight=jnp.where(found_any[..., None], weight, 0.0),
                   w_i=sel_wi), rng_state


def gather(scene, sd, mat_idx, entry_pos, rng_state, active, spectral: bool,
           subsurface_classes=(1,)):
  """SSS dispatch (path_tracing_shared.hxx:222-232). subsurface_classes:
  static tuple of SubsurfaceClass values present in the scene."""
  from etx_tracer_tpu.scene.types import SubsurfaceClass as SC
  has_rw = SC.RandomWalk in subsurface_classes
  has_cb = SC.ChristensenBurley in subsurface_classes
  if has_cb and not has_rw:
    return gather_cb(scene, sd, mat_idx, entry_pos, rng_state, active, spectral)
  if has_rw and not has_cb:
    return gather_rw(scene, sd, mat_idx, entry_pos, rng_state, active, spectral)
  is_cb = sd.mat.subsurface_cls == SC.ChristensenBurley
  g_rw, rng_state = gather_rw(scene, sd, mat_idx, entry_pos, rng_state,
                              active & ~is_cb, spectral)
  g_cb, rng_state = gather_cb(scene, sd, mat_idx, entry_pos, rng_state,
                              active & is_cb, spectral)
  m = is_cb
  mN = m[..., None]
  merged = SSSGather(
      found=jnp.where(m, g_cb.found, g_rw.found),
      pos=jnp.where(mN, g_cb.pos, g_rw.pos),
      nrm=jnp.where(mN, g_cb.nrm, g_rw.nrm),
      geo_n=jnp.where(mN, g_cb.geo_n, g_rw.geo_n),
      tan=jnp.where(mN, g_cb.tan, g_rw.tan),
      btn=jnp.where(mN, g_cb.btn, g_rw.btn),
      uv=jnp.where(mN, g_cb.uv, g_rw.uv),
      tri=jnp.where(m, g_cb.tri, g_rw.tri),
      weight=jnp.where(mN, g_cb.weight, g_rw.weight),
      w_i=jnp.where(mN, g_cb.w_i, g_rw.w_i))
  return merged, rng_state
