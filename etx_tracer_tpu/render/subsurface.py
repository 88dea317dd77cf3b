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
        thr_new], axis=-1)
    exit_data = jnp.where(exited[..., None], exit_new, exit_data)

    # continue walking: move and sample isotropic phase (g=0)
    rng_state, rnd_p = rng.next_2d(rng_state)
    new_d = media_mod.sample_phase_hg(d, jnp.zeros(r), rnd_p)
    o = jnp.where(walk_active[..., None], o + d * seg[..., None], o)
    d = jnp.where(walk_active[..., None], new_d, d)
    thr = jnp.where(walk_active[..., None], thr_new, thr)
    walk_active = walk_active & ~exited & ~dead
    return rng_state, o, d, thr, found, exit_data, walk_active, it + 1

  exit_data0 = jnp.zeros((r, 3 + c))
  carry = (rng_state, o0, d0, jnp.ones((r, c)), jnp.zeros(r, bool),
           exit_data0, active, jnp.int32(0))
  rng_state, _, _, _, found, exit_data, _, _ = jax.lax.while_loop(cond, body, carry)

  u = exit_data[:, 0]
  v = exit_data[:, 1]
  tri = exit_data[:, 2].astype(jnp.int32)
  weight = exit_data[:, 3:]

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
                   weight=weight), rng_state
