"""Wavefront unidirectional path tracer with NEE + MIS.

Port of the reference CPU path tracer's semantics
(rt/integrators/path_tracing.cxx + rt/shared/path_tracing_shared.hxx:238-510)
re-architected for TPU: the whole film is one SoA wavefront (one ray per
pixel per iteration), each bounce is a data-parallel step, and the bounce
loop is a `lax.while_loop` that exits when every lane is dead. No
compaction is needed because rays never migrate between pixels.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from etx_tracer_tpu.core import math as em
from etx_tracer_tpu.core import rng
from etx_tracer_tpu.core import spectrum as spmod
from etx_tracer_tpu.ops import trace as trace_ops
from etx_tracer_tpu.render import bsdf as bsdf_mod
from etx_tracer_tpu.render import camera as camera_mod
from etx_tracer_tpu.render import emitters as emitters_mod
from etx_tracer_tpu.render import film as film_mod
from etx_tracer_tpu.render import spectral as spx
from etx_tracer_tpu.render.bsdf import dispatch as bsdf_dispatch
from etx_tracer_tpu.render.bsdf.lobes import ShadingData
from etx_tracer_tpu.scene.types import MaterialClass as MC


class PTState(NamedTuple):
  """SoA wavefront payload (PTRayPayload, path_tracing_shared.hxx:16-32)."""
  ray_o: jnp.ndarray        # (R,3)
  ray_d: jnp.ndarray        # (R,3)
  t_min: jnp.ndarray        # (R,)
  t_max: jnp.ndarray        # (R,)
  throughput: jnp.ndarray   # (R,C)
  accumulated: jnp.ndarray  # (R,C)
  view_normal: jnp.ndarray  # (R,3)
  view_albedo: jnp.ndarray  # (R,C)
  medium: jnp.ndarray       # (R,) int32
  path_length: jnp.ndarray  # (R,) int32
  eta: jnp.ndarray          # (R,)
  bsdf_pdf: jnp.ndarray     # (R,)
  mis_flag: jnp.ndarray     # (R,) bool
  rng_state: jnp.ndarray    # (R,) uint32
  wl: jnp.ndarray           # (R,) wavelength (spectral)
  alive: jnp.ndarray        # (R,) bool
  pixel: jnp.ndarray        # (R,) int32 film pixel this lane contributes to
  sample_iter: jnp.ndarray  # (R,) int32 sample iteration of this lane
  rays_traced: jnp.ndarray  # () float32 — useful rays (closest + shadow), for Mrays/s
  # deferred-NEE pending shadow ray (resolved in the NEXT step's combined
  # trace launch; avoids a standalone occlusion launch + its dependency
  # stall, ~12% of the step). tmax < 0 = no pending.
  psh_o: jnp.ndarray        # (R,3)
  psh_d: jnp.ndarray        # (R,3)
  psh_tmax: jnp.ndarray     # (R,)
  psh_rgb: jnp.ndarray      # (R,3) film-RGB contribution if unoccluded
  res_rgb: jnp.ndarray      # (R,3) resolved contribution from LAST step
  res_valid: jnp.ndarray    # (R,) bool


def make_lane_payload(scene, config, sample_ids, end_sample,
                      row_offset=0, full_height: int | None = None) -> PTState:
  """Per-lane payload for arbitrary sample ids (pixel, iteration) pairs.

  sample_id s maps to pixel s % (W*H) and iteration s // (W*H); lanes with
  s >= end_sample start dead (pool tail). Seeding matches the reference:
  rng = tea(pixel_index, iteration) (path_tracing_shared.hxx:238-257), so
  results are independent of pool scheduling.

  row_offset/full_height: when the film is a horizontal band of a larger
  sharded film, row_offset (possibly traced — lax.axis_index) shifts the
  pixel ids to GLOBAL film ids for RNG seeding and camera UVs, so each
  shard reproduces exactly the lanes the single-device render produces.
  """
  w, h = config.film_width, config.film_height
  if full_height is None:
    full_height = h
  npix = w * h
  r = sample_ids.shape[0]
  c = spx.channels(config.spectral)
  pixel_index = ((sample_ids % npix).astype(jnp.uint32)
                 + jnp.uint32(row_offset) * jnp.uint32(w))
  iteration = (sample_ids // npix).astype(jnp.uint32)
  state = rng.seed(pixel_index, iteration)

  state, wl_rnd = rng.next_float(state)
  if config.spectral:
    wl = spmod.sample_wavelength(wl_rnd)
  else:
    wl = jnp.zeros(r)

  px = (pixel_index % w).astype(jnp.int32)
  py = (pixel_index // w).astype(jnp.int32)
  state, jit_rnd = rng.next_2d(state)
  jitter = camera_mod.pixel_jitter(config.pixel_filter, jit_rnd, iteration)
  uv = camera_mod.film_uv(px, py, w, full_height, jitter)
  state, lens_rnd = rng.next_2d(state)
  rays = camera_mod.generate_ray(scene.camera, uv, lens_rnd, scene=scene,
                                 equirectangular=config.equirectangular)

  alive = sample_ids < end_sample
  return PTState(
      ray_o=rays.o, ray_d=rays.d, t_min=rays.t_min, t_max=rays.t_max,
      throughput=jnp.ones((r, c)), accumulated=jnp.zeros((r, c)),
      view_normal=jnp.zeros((r, 3)), view_albedo=jnp.zeros((r, c)),
      medium=jnp.full(r, scene.camera.medium_index, jnp.int32),
      path_length=jnp.ones(r, jnp.int32),
      eta=jnp.ones(r), bsdf_pdf=jnp.zeros(r),
      mis_flag=jnp.ones(r, bool),
      rng_state=state, wl=wl, alive=alive,
      pixel=pixel_index.astype(jnp.int32),
      sample_iter=iteration.astype(jnp.int32),
      rays_traced=jnp.zeros((), jnp.float32),
      psh_o=jnp.zeros((r, 3)), psh_d=jnp.zeros((r, 3)),
      psh_tmax=jnp.full(r, -1.0), psh_rgb=jnp.zeros((r, 3)),
      res_rgb=jnp.zeros((r, 3)), res_valid=jnp.zeros(r, bool))


def make_payload(scene, config, iteration) -> PTState:
  """make_ray_payload over the full film (one lane per pixel)."""
  w, h = config.film_width, config.film_height
  r = w * h
  ids = jnp.arange(r, dtype=jnp.int32) + iteration * r
  return make_lane_payload(scene, config, ids, (iteration + 1) * r)


def _interpolate_hit(scene, hit, w_i):
  """make_intersection (scene.hxx:202-226) without normal mapping.

  One packed-row fetch (MXU one-hot for small scenes) supplies all
  per-triangle shading data; vertex attributes come pre-staged per corner
  so no per-vertex gathers are needed.
  """
  from etx_tracer_tpu.ops import gather as gops
  from etx_tracer_tpu.scene import packed

  tri = jnp.maximum(hit.tri, 0)
  bc = em.barycentrics(jnp.stack([hit.u, hit.v], axis=-1))
  rows = packed.TriRows(gops.take_rows(scene.tri_table, tri))

  w0, w1, w2 = bc[..., 0:1], bc[..., 1:2], bc[..., 2:3]
  # position directly from the intersection arrays: v0 + u*e1 + v*e2
  tv = gops.take_rows(
      jnp.concatenate([scene.tri_v0, scene.tri_e1, scene.tri_e2], axis=1), tri)
  pos = tv[:, 0:3] + hit.u[..., None] * tv[:, 3:6] + hit.v[..., None] * tv[:, 6:9]

  nrm = em.normalize(rows.n0 * w0 + rows.n1 * w1 + rows.n2 * w2)
  tan = rows.t0 * w0 + rows.t1 * w1 + rows.t2 * w2
  tan = em.normalize(tan - em.dot(tan, nrm)[..., None] * nrm)
  btn_ref = rows.b0 * w0 + rows.b1 * w1 + rows.b2 * w2
  btn = em.cross(nrm, tan)
  btn = em.normalize(btn * jnp.where(em.dot(btn, btn_ref) > 0.0, 1.0, -1.0)[..., None])
  uv = rows.uv0 * w0 + rows.uv1 * w1 + rows.uv2 * w2
  return pos, nrm, tan, btn, uv, bc, tri, rows


def _shading_pos(geo_n, geo_pos, w_o):
  """Self-intersection-safe continuation origin.

  Simplified shading_pos (scene.hxx:172-186): offset along the geometric
  normal toward the outgoing side.
  """
  side = jnp.where(em.dot(geo_n, w_o) >= 0.0, 1.0, -1.0)[..., None]
  return em.offset_ray(geo_pos, geo_n * side)


def _random_continue(path_length, rr_start: int, eta, rnd, throughput):
  """Russian roulette (scene.hxx:228-248). Returns (continue?, throughput)."""
  max_t = jnp.max(throughput, axis=-1) * em.sqr(eta)
  q = jnp.minimum(0.95, max_t)
  before_start = path_length < rr_start
  cont = before_start | ((q > 0.0) & (rnd < q))
  scale = jnp.where(before_start | (q <= 0.0), 1.0, 1.0 / jnp.maximum(q, 1e-9))
  thr = throughput * scale[..., None]
  nonzero = jnp.max(throughput, axis=-1) > 0.0
  return cont & nonzero, thr


def _gather_mat(scene, mat_idx):
  from etx_tracer_tpu.ops import gather as gops
  from etx_tracer_tpu.scene import packed
  return packed.unpack_material_rows(gops.take_rows(scene.mat_table, mat_idx))


def _trace_transmittance(scene, config, rng_state, medium, from_pos, to_pos,
                         wl, spectral):
  """Transmittance along a shadow segment (rt.cxx:468-579 semantics).

  Walks the segment with up to K sequential traces: Boundary-material hits
  switch the active medium and accumulate per-segment medium transmittance;
  any other hit blocks the segment. Bounded `lax.while_loop` over the
  wavefront.
  """
  from etx_tracer_tpu.render import media as media_mod
  from etx_tracer_tpu.scene import packed
  from etx_tracer_tpu.ops import gather as gops

  r = from_pos.shape[0]
  c = spx.channels(spectral)
  direction = em.normalize(to_pos - from_pos)
  total_dist = em.length(to_pos - from_pos)

  max_segments = 16

  def cond(carry):
    rng_state, cur, traveled, med, tr, active, it = carry
    return jnp.any(active) & (it < max_segments)

  def body(carry):
    rng_state, cur, traveled, med, tr, active, it = carry
    remaining = jnp.maximum(total_dist - traveled, 0.0)
    seg_max = jnp.where(active, remaining * (1.0 - 1e-3), 0.0)
    hit = trace_ops.trace_closest(scene, cur, direction, jnp.full(r, em.kRayEpsilon), seg_max)
    seg_len = jnp.where(hit.found, hit.t, remaining)

    mv = media_mod.gather_medium(scene, med, wl, spectral)
    seg_tr, rng_state = media_mod.transmittance(
        scene, mv, wl, rng_state, cur, direction, jnp.where(active, seg_len, 0.0), spectral)
    tr = jnp.where(active[..., None], tr * seg_tr, tr)

    tri = jnp.maximum(hit.tri, 0)
    trows = packed.TriRows(gops.take_rows(scene.tri_table, tri))
    mat_cls = gops.take_rows(
        scene.mat_table[:, packed.mat_column("cls"):packed.mat_column("cls") + 1],
        trows.mat)[:, 0].astype(jnp.int32)
    is_boundary = hit.found & (mat_cls == MC.Boundary)
    blocked = hit.found & ~is_boundary
    tr = jnp.where((active & blocked)[..., None], 0.0, tr)

    # boundary: switch medium by crossing side and continue
    int_m = gops.take_rows(
        scene.mat_table[:, packed.mat_column("int_medium"):packed.mat_column("int_medium") + 1],
        trows.mat)[:, 0].astype(jnp.int32)
    ext_m = gops.take_rows(
        scene.mat_table[:, packed.mat_column("ext_medium"):packed.mat_column("ext_medium") + 1],
        trows.mat)[:, 0].astype(jnp.int32)
    entering = em.dot(trows.geo_n, direction) < 0.0
    new_med = jnp.where(entering, int_m, ext_m)
    med = jnp.where(active & is_boundary, new_med, med)

    cur = jnp.where((active & is_boundary)[..., None],
                    em.offset_ray(cur + direction * hit.t[..., None],
                                  trows.geo_n * jnp.where(em.dot(trows.geo_n, direction) >= 0, 1.0, -1.0)[..., None]),
                    cur)
    traveled = jnp.where(active & is_boundary, traveled + hit.t, traveled)
    active = active & is_boundary
    return rng_state, cur, traveled, med, tr, active, it + 1

  carry = (rng_state, from_pos, jnp.zeros(r), medium, jnp.ones((r, c)),
           jnp.ones(r, bool), jnp.int32(0))
  rng_state, _, _, _, tr, _, _ = jax.lax.while_loop(cond, body, carry)
  return tr, rng_state


def pt_step(scene, config, state: PTState, deferred_nee: bool = False) -> PTState:
  """One wavefront bounce (run_path_iteration, path_tracing_shared.hxx:485).

  deferred_nee (static): trace the PREVIOUS step's NEE shadow ray in the
  same launch as this step's closest hit and emit the resolved contribution
  via res_rgb/res_valid; this step's NEE becomes the new pending ray. Used
  by render_samples_static (film rows absorb the contributions); requires
  no media and no radiance clamp."""
  spectral = config.spectral
  classes = config.material_classes
  r = state.ray_o.shape[0]

  if spectral:
    # one MXU matmul evaluates every SPD at each lane's wavelength; all
    # query_spd calls this step then reduce over S instead of gathering
    # from the (S,441) bank per lane (the spectral-mode hot spot)
    from etx_tracer_tpu.core import spectrum as sp_mod
    scene = scene._replace(
        spec_at_wl=(state.wl, sp_mod.bank_at_wl(scene.spec_values, state.wl)))

  # dead lanes trace a degenerate ray
  t_max = jnp.where(state.alive, state.t_max, 0.0)
  if deferred_nee:
    # two launches back to back: closest-hit for path rays, the cheaper
    # any-hit kernel for last step's shadow rays (no concat HBM copies —
    # the three concatenates cost as much as an entire trace kernel)
    hit = trace_ops.trace_closest(scene, state.ray_o, state.ray_d,
                                  state.t_min, t_max)
    sh_found = trace_ops.trace_occluded(scene, state.psh_o, state.psh_d,
                                        jnp.full(r, em.kRayEpsilon),
                                        jnp.maximum(state.psh_tmax, 0.0))
    res_valid = (state.psh_tmax > 0.0) & ~sh_found
    res_rgb = jnp.where(res_valid[..., None], state.psh_rgb, 0.0)
  else:
    hit = trace_ops.trace_closest(scene, state.ray_o, state.ray_d, state.t_min, t_max)
    res_valid = jnp.zeros(r, bool)
    res_rgb = jnp.zeros((r, 3))
  found = hit.found & state.alive

  rng_state = state.rng_state
  accumulated = state.accumulated
  throughput = state.throughput

  # ------------------------------------------------- medium free path
  # try_sampling_medium + handle_sampled_medium (path_tracing_shared:259-296)
  medium_event = jnp.zeros(r, bool)
  if config.has_media:
    from etx_tracer_tpu.render import media as media_mod
    mv = media_mod.gather_medium(scene, state.medium, state.wl, spectral)
    seg_t = jnp.where(found, hit.t, 2.0 * scene.bsphere_radius * 100.0)
    seg_t = jnp.where(state.alive & mv.valid, seg_t, 0.0)
    msample, rng_state = media_mod.sample_medium(
        scene, mv, state.wl, throughput, rng_state, state.ray_o, state.ray_d,
        jnp.maximum(seg_t, em.kRayEpsilon), spectral)
    in_medium = state.alive & mv.valid & (seg_t > 0.0)
    throughput = jnp.where(in_medium[..., None], throughput * msample.weight, throughput)
    medium_event = in_medium & msample.sampled

    # NEE from the medium point with phase MIS (:275-285)
    rng_state, m_rnd_sel = rng.next_float(rng_state)
    rng_state, m_rnd_em = rng.next_2d(rng_state)
    m_em_idx, _ = emitters_mod.sample_emitter_index(scene, m_rnd_sel)
    m_esmp = emitters_mod.sample_emitter(scene, m_em_idx, m_rnd_em, msample.pos, state.wl, spectral,
                                         classes=config.emitter_classes)
    m_tr, rng_state = _trace_transmittance(
        scene, config, rng_state, state.medium, msample.pos, m_esmp.origin,
        state.wl, spectral)
    phase = media_mod.phase_hg(state.ray_d, m_esmp.direction, mv.phase_g)
    m_w = jnp.where(m_esmp.is_delta, 1.0,
                    em.power_heuristic(m_esmp.pdf_dir * m_esmp.pdf_sample, phase))
    m_denom = m_esmp.pdf_dir * m_esmp.pdf_sample
    m_ok = (medium_event & mv.explicit_connections & (m_denom > 0.0)
            & (state.path_length + 1 <= config.max_path_length))
    m_contrib = m_esmp.value * m_tr * (phase * m_w / jnp.maximum(m_denom, 1e-20))[..., None]
    accumulated = accumulated + jnp.where(m_ok[..., None], throughput * m_contrib, 0.0)

    # phase-function continuation
    rng_state, m_rnd_phase = rng.next_2d(rng_state)
    phase_dir = media_mod.sample_phase_hg(state.ray_d, mv.phase_g, m_rnd_phase)
    phase_pdf = media_mod.phase_hg(state.ray_d, phase_dir, mv.phase_g)

    # lanes with a medium event skip surface handling this step
    found = found & ~medium_event

  # ---------------------------------------------------------------- miss
  if config.num_env_emitters > 0:
    env = emitters_mod.env_contribution(
        scene, state.ray_d, state.wl, state.path_length == 1, state.mis_flag,
        state.bsdf_pdf, config.num_env_emitters, spectral)
    miss = state.alive & ~hit.found & ~medium_event
    accumulated = accumulated + jnp.where(miss[..., None], throughput * env, 0.0)

  # ----------------------------------------------------------------- hit
  pos, nrm, tan, btn, uv, bc, tri, trows = _interpolate_hit(scene, hit, state.ray_d)
  mat_idx = trows.mat
  mat = _gather_mat(scene, mat_idx)
  emitter_idx = jnp.where(found, trows.emitter, -1)

  sd = ShadingData(w_i=state.ray_d, nrm=nrm, tan=tan, btn=btn,
                   geo_n=trows.geo_n, tex=uv, wl=state.wl,
                   medium=state.medium, mat=mat)
  if config.has_images:
    from etx_tracer_tpu.render import images as images_mod
    sd = images_mod.apply_normal_map(scene, sd, trows.geo_n)
    nrm = sd.nrm

  # boundary materials: pass through, swap medium (path_tracing_shared:359-365)
  is_boundary = found & (mat.cls == MC.Boundary) if MC.Boundary in classes else jnp.zeros(r, bool)

  # stochastic alpha test (alpha_test_pass, scene_bsdf.hxx:128-144): the hit
  # is skipped with probability 1 - opacity*image_alpha; the lane continues
  # straight through like a boundary, medium unchanged
  if config.has_alpha:
    rng_state, a_rnd = rng.next_float(rng_state)
    alpha_v = mat.opacity
    if config.has_images:
      from etx_tracer_tpu.render import images as images_mod2
      tex_a = images_mod2.scalar_image(scene, mat.scattering_img, uv,
                                       jnp.full_like(mat.scattering_img, 3), 1.0)
      alpha_v = alpha_v * tex_a
    alpha_skip = found & ~is_boundary & (mat.cls != MC.Void) & (alpha_v <= a_rnd)
  else:
    alpha_skip = jnp.zeros(r, bool)
  pass_through = is_boundary | alpha_skip

  # --- direct emitter hit (handle_direct_emitter, :325-353) ---
  directly_visible = state.path_length == 1
  e_value, _, e_pdf_dir, _ = emitters_mod.area_radiance(
      scene, emitter_idx, state.wl, state.ray_o, pos, uv, directly_visible, spectral)
  e_discrete = emitters_mod.discrete_pdf(scene, jnp.maximum(emitter_idx, 0))
  no_weight = directly_visible | ~state.mis_flag
  mis_w = jnp.where(no_weight, 1.0, em.power_heuristic(state.bsdf_pdf, e_discrete * e_pdf_dir))
  direct_ok = found & ~pass_through & (e_pdf_dir > 0.0)
  accumulated = accumulated + jnp.where(
      direct_ok[..., None], throughput * e_value * mis_w[..., None], 0.0)

  if config.validate:
    from etx_tracer_tpu.utils import validate as val
    fmask = found[..., None]
    val.check_finite("pt:direct_emitter", accumulated=accumulated,
                     emitter_value=jnp.where(fmask, e_value, 0.0),
                     hit_pos=jnp.where(fmask, pos, 0.0),
                     hit_nrm=jnp.where(fmask, nrm, 0.0))

  # --- first-hit AOVs ---
  albedo_here = bsdf_dispatch.albedo(scene, sd, spectral)
  first = found & directly_visible
  view_normal = jnp.where(first[..., None], nrm, state.view_normal)
  view_albedo = jnp.where(first[..., None], albedo_here, state.view_albedo)

  # --- BSDF sample ---
  rng_state, rnd_bsdf = rng.next_n(rng_state, bsdf_dispatch.NUM_SAMPLE_RND)
  if config.blue_noise:
    # first-bounce dims use blue-noise-rotated R2 (path_tracing.cxx:173-178)
    from etx_tracer_tpu.core import bluenoise
    px = state.pixel % config.film_width
    py = state.pixel // config.film_width
    bn = bluenoise.sample_2d(px, py, state.sample_iter, 0)
    first_b = (state.path_length == 1)[..., None]
    rnd_bsdf = rnd_bsdf.at[:, 0:2].set(jnp.where(first_b, bn, rnd_bsdf[:, 0:2]))
  bs = bsdf_dispatch.sample(scene, sd, rnd_bsdf, spectral, classes,
                              config.diffuse_variations)

  # --- subsurface random walk (handle_hit_ray, :390-443) ---
  if config.has_subsurface:
    from etx_tracer_tpu.render import subsurface as sss_mod
    from etx_tracer_tpu.scene.types import SubsurfaceClass
    sss_path = (found & (mat.subsurface_cls != SubsurfaceClass.Disabled)
                & bs.is_reflection & bs.is_diffuse)
    gather, rng_state = sss_mod.gather(
        scene, sd, mat_idx, pos, rng_state, sss_path, spectral,
        config.subsurface_classes)
    sss_ok = sss_path & gather.found
    # exit-side shading: substitute the exit surface for continuation + NEE
    # (the subsequent NEE block then evaluates at the exit point, mirroring
    # the reference's NEE over SSS exits with the exit material, :419-426)
    out_nrm = gather.nrm
    pos = jnp.where(sss_ok[..., None], gather.pos, pos)
    nrm = jnp.where(sss_ok[..., None], out_nrm, nrm)
    sd = sd._replace(
        nrm=jnp.where(sss_ok[..., None], out_nrm, sd.nrm),
        tan=jnp.where(sss_ok[..., None], gather.tan, sd.tan),
        btn=jnp.where(sss_ok[..., None], gather.btn, sd.btn),
        geo_n=jnp.where(sss_ok[..., None], gather.geo_n, sd.geo_n),
        tex=jnp.where(sss_ok[..., None], gather.uv, sd.tex))
    # override continuation: cosine lobe at the exit
    rng_state, sss_rnd = rng.next_2d(rng_state)
    sss_dir = em.sample_cosine_distribution_n(sss_rnd, out_nrm, 1.0)
    sss_pdf = jnp.abs(em.dot(sss_dir, out_nrm)) * em.kInvPi
    bs = bs._replace(
        w_o=jnp.where(sss_ok[..., None], sss_dir, bs.w_o),
        weight=jnp.where(sss_ok[..., None], gather.weight, bs.weight),
        pdf=jnp.where(sss_ok, sss_pdf, bs.pdf),
        is_delta=jnp.where(sss_ok, False, bs.is_delta))
    # lanes that chose the subsurface path but failed the walk die
    found = found & ~(sss_path & ~gather.found)

  # --- NEE (direct light sampling, :414-435) ---
  rng_state, rnd_sel = rng.next_float(rng_state)
  rng_state, rnd_em = rng.next_2d(rng_state)
  if config.blue_noise:
    from etx_tracer_tpu.core import bluenoise
    bn_em = bluenoise.sample_2d(state.pixel % config.film_width,
                                state.pixel // config.film_width,
                                state.sample_iter, 2)
    first_b = (state.path_length == 1)[..., None]
    rnd_em = jnp.where(first_b, bn_em, rnd_em)
  if config.validate:
    from etx_tracer_tpu.utils import validate as val
    fmask = found[..., None]
    val.check_finite("pt:bsdf_sample",
                     weight=jnp.where(fmask, bs.weight, 0.0),
                     pdf=jnp.where(found, bs.pdf, 0.0),
                     w_o=jnp.where(fmask, bs.w_o, 0.0))

  can_nee = found & ~pass_through & (state.path_length + 1 <= config.max_path_length)
  if True:  # NEE block
    em_idx, _ = emitters_mod.sample_emitter_index(scene, rnd_sel)
    esmp = emitters_mod.sample_emitter(scene, em_idx, rnd_em, pos, state.wl, spectral,
                                      classes=config.emitter_classes)
    bsdf_val, bsdf_pdf_at = bsdf_dispatch.evaluate(scene, sd, esmp.direction, spectral, classes, config.diffuse_variations)
    if config.has_subsurface:
      # SSS exits shade with the white-diffuse exit material and carry the
      # gather weight (path_tracing_shared.hxx:419-426 weights[i] *
      # evaluate_light with scene.subsurface_exit_material)
      white = em.kInvPi * jnp.maximum(em.dot(sd.nrm, esmp.direction), 0.0)
      bsdf_val = jnp.where(sss_ok[..., None], white[..., None] * gather.weight,
                           bsdf_val)
      bsdf_pdf_at = jnp.where(sss_ok, white, bsdf_pdf_at)
    # shadow ray from offset shading position toward the emitter point
    sh_o = _shading_pos(sd.geo_n, pos, esmp.direction)
    w_mis = jnp.where(esmp.is_delta, 1.0,
                      em.power_heuristic(esmp.pdf_dir * esmp.pdf_sample, bsdf_pdf_at))
    denom = esmp.pdf_dir * esmp.pdf_sample
    if deferred_nee:
      to_em = esmp.origin - sh_o
      dist = em.length(to_em)
      contrib = bsdf_val * esmp.value * (w_mis / jnp.maximum(denom, 1e-20))[..., None]
      nee_ok = can_nee & (denom > 0.0) & (bsdf_pdf_at > 0.0)
      pend_rgb = spx.to_film_rgb(throughput * contrib, state.wl, spectral)
      psh_o = sh_o
      psh_d = esmp.direction
      psh_tmax = jnp.where(nee_ok, jnp.maximum(dist * (1.0 - 1e-3), 0.0), -1.0)
      psh_rgb = jnp.where(nee_ok[..., None], pend_rgb, 0.0)
    else:
      if config.has_media:
        # transmittance through boundary interfaces + media (rt.cxx:468-579)
        tr_nee, rng_state = _trace_transmittance(
            scene, config, rng_state, state.medium, sh_o, esmp.origin,
            state.wl, spectral)
        vis_ok = jnp.max(tr_nee, axis=-1) > 0.0
      else:
        to_em = esmp.origin - sh_o
        dist = em.length(to_em)
        occluded = trace_ops.trace_occluded(
            scene, sh_o, esmp.direction, jnp.full(r, em.kRayEpsilon),
            jnp.maximum(dist * (1.0 - 1e-3), 0.0))
        tr_nee = 1.0
        vis_ok = ~occluded
      contrib = bsdf_val * esmp.value * tr_nee * (w_mis / jnp.maximum(denom, 1e-20))[..., None]
      nee_ok = can_nee & (denom > 0.0) & vis_ok & (bsdf_pdf_at > 0.0)
      accumulated = accumulated + jnp.where(nee_ok[..., None], throughput * contrib, 0.0)
      psh_o = state.psh_o
      psh_d = state.psh_d
      psh_tmax = jnp.full(r, -1.0)
      psh_rgb = state.psh_rgb

  # --- continuation ---
  # boundary: continue straight through with medium swap
  ent = em.dot(nrm, state.ray_d) < 0.0
  boundary_medium = jnp.where(ent, mat.int_medium, mat.ext_medium)

  pt_medium = jnp.where(is_boundary, boundary_medium, state.medium)
  new_d = jnp.where(pass_through[..., None], state.ray_d, bs.w_o)
  new_o = _shading_pos(sd.geo_n, pos, new_d)
  new_medium = jnp.where(pass_through, pt_medium, bs.medium)
  new_throughput = jnp.where(pass_through[..., None], throughput, throughput * bs.weight)
  new_bsdf_pdf = jnp.where(pass_through, state.bsdf_pdf, bs.pdf)
  new_mis = jnp.where(pass_through, state.mis_flag, ~bs.is_delta)
  new_eta = jnp.where(pass_through, state.eta, state.eta * bs.eta)
  new_len = state.path_length + jnp.where(pass_through, 0, 1)
  continue_ok = found
  sample_ok = pass_through | (bs.pdf > 0.0)

  if config.has_media:
    # medium-scatter lanes continue along the sampled phase direction
    me = medium_event
    new_d = jnp.where(me[..., None], phase_dir, new_d)
    new_o = jnp.where(me[..., None], msample.pos, new_o)
    new_medium = jnp.where(me, state.medium, new_medium)
    new_bsdf_pdf = jnp.where(me, phase_pdf, new_bsdf_pdf)
    # no NEE competitor when the medium forbids explicit connections: the
    # next direct emitter hit must then carry full weight
    new_mis = jnp.where(me, mv.explicit_connections, new_mis)
    new_eta = jnp.where(me, state.eta, new_eta)
    new_len = jnp.where(me, state.path_length + 1, new_len)
    continue_ok = continue_ok | me
    sample_ok = sample_ok | me

  # Russian roulette (not applied to boundary pass-through)
  rng_state, rr_rnd = rng.next_float(rng_state)
  cont, new_throughput = _random_continue(new_len, config.rr_start, new_eta, rr_rnd, new_throughput)
  cont = cont | pass_through

  alive = continue_ok & cont & sample_ok & (new_len <= config.max_path_length)

  rays_traced = state.rays_traced + jnp.sum(state.alive.astype(jnp.float32)) \
      + jnp.sum(nee_ok.astype(jnp.float32))

  if config.validate:
    from etx_tracer_tpu.utils import validate as val
    amask = alive[..., None]
    val.check_finite("pt:nee", accumulated=accumulated)
    val.check_finite("pt:continuation",
                     throughput=jnp.where(amask, new_throughput, 0.0),
                     ray_o=jnp.where(amask, new_o, 0.0),
                     ray_d=jnp.where(amask, new_d, 0.0))

  return PTState(
      ray_o=new_o, ray_d=new_d,
      t_min=jnp.full(r, em.kRayEpsilon), t_max=jnp.full(r, em.kMaxFloat),
      throughput=new_throughput, accumulated=accumulated,
      view_normal=view_normal, view_albedo=view_albedo,
      medium=new_medium, path_length=new_len, eta=new_eta,
      bsdf_pdf=new_bsdf_pdf, mis_flag=new_mis,
      rng_state=rng_state, wl=state.wl, alive=alive,
      pixel=state.pixel, sample_iter=state.sample_iter,
      rays_traced=rays_traced,
      psh_o=psh_o, psh_d=psh_d, psh_tmax=psh_tmax, psh_rgb=psh_rgb,
      res_rgb=res_rgb, res_valid=res_valid)


@functools.partial(jax.jit, static_argnames=("config",))
def render_iteration_stats(scene, config, film_state: film_mod.FilmState, iteration):
  """One iteration; returns (film, rays_traced) — rays for Mrays/s metrics."""
  state = make_payload(scene, config, iteration)

  def cond(s):
    return jnp.any(s.alive)

  def body(s):
    return pt_step(scene, config, s)

  state = jax.lax.while_loop(cond, body, state)
  film_state = _finalize(scene, config, film_state, state)
  return film_state, state.rays_traced


@functools.partial(jax.jit, static_argnames=("config",))
def render_iteration(scene, config, film_state: film_mod.FilmState, iteration) -> film_mod.FilmState:
  """One full-film sample-per-pixel iteration; returns the updated film."""
  state = make_payload(scene, config, iteration)

  def cond(s):
    return jnp.any(s.alive)

  def body(s):
    return pt_step(scene, config, s)

  state = jax.lax.while_loop(cond, body, state)
  return _finalize(scene, config, film_state, state)


def _finalize(scene, config, film_state, state):

  w, h = config.film_width, config.film_height
  color = spx.to_film_rgb(state.accumulated, state.wl, config.spectral)
  albedo = spx.to_film_rgb(state.view_albedo, state.wl, config.spectral)

  # radiance clamp (path_tracing.cxx:74-79)
  lum = em.luminance(color)
  clamp = scene.radiance_clamp
  scale = jnp.where((clamp > 0.0) & (lum > clamp) & (state.path_length > 1),
                    clamp / jnp.maximum(lum, 1e-9), 1.0)
  color = color * scale[..., None]

  colors = color.reshape(h, w, 3)
  normals = state.view_normal.reshape(h, w, 3)
  albedos = albedo.reshape(h, w, 3)
  return film_mod.accumulate_camera(film_state, colors, normals, albedos)


# ---------------------------------------------------------------------------
# Pooled wavefront renderer with lane regeneration.
#
# The per-iteration driver above keeps one lane per pixel and loops until the
# LAST path dies — with long max-path budgets utilization collapses (most
# lanes are masked-dead). This driver is the real TPU architecture: a fixed
# SoA ray pool; when a lane terminates, its radiance is scatter-added to the
# film and the lane immediately regenerates with the next (pixel, sample)
# from a global counter. This replaces the reference GPU path's atomic
# compaction queues (bin/optix/vcm/vcm-optix.cu:8-17) with prefix-sum lane
# reassignment — utilization stays ~100% for any path-length budget.
#
# Note on determinism: per-sample RNG depends only on (pixel, iteration), so
# results are schedule-independent — except for rays grazing a geometric
# edge, where the closest-hit float tie between two adjacent triangles can
# resolve differently across compilation contexts. Both resolutions are
# valid surface hits; the estimator is unaffected.
# ---------------------------------------------------------------------------


class FilmSums(NamedTuple):
  """Flat per-pixel accumulation table: ONE fused scatter-add per step.

  Columns: cam(3), nrm(3), alb(3), var(3), count(1), var_count(1) = 14.
  """
  table: jnp.ndarray  # (H*W, 14)

  @property
  def cam_sum(self):
    return self.table[:, 0:3]

  @property
  def nrm_sum(self):
    return self.table[:, 3:6]

  @property
  def alb_sum(self):
    return self.table[:, 6:9]

  @property
  def var_sum(self):
    return self.table[:, 9:12]

  @property
  def count(self):
    return self.table[:, 12]

  @property
  def var_count(self):
    return self.table[:, 13]


_SUMS_WIDTH = 14


def _empty_sums(w, h):
  return FilmSums(jnp.zeros((h * w, _SUMS_WIDTH), jnp.float32))


def _lane_color(scene, config, state):
  """Finalize a lane's radiance to film RGB with the radiance clamp."""
  color = spx.to_film_rgb(state.accumulated, state.wl, config.spectral)
  lum = em.luminance(color)
  clamp = scene.radiance_clamp
  scale = jnp.where((clamp > 0.0) & (lum > clamp) & (state.path_length > 1),
                    clamp / jnp.maximum(lum, 1e-9), 1.0)
  return color * scale[..., None]


@functools.partial(jax.jit, static_argnames=("config", "num_iterations", "pool_size"))
def render_samples(scene, config, first_iteration, num_iterations: int,
                   pool_size: int = 1 << 17):
  """Render num_iterations spp with a regenerating wavefront pool.

  Returns (FilmSums, rays_traced). Deterministic: lane seeds depend only on
  (pixel, iteration), never on pool scheduling.
  """
  w, h = config.film_width, config.film_height
  npix = w * h
  total = npix * num_iterations
  p = min(pool_size, total)

  base = first_iteration * npix
  ids0 = base + jnp.arange(p, dtype=jnp.int32)
  end = base + total
  state = make_lane_payload(scene, config, ids0, end)
  sums = _empty_sums(w, h)
  counter = jnp.int32(base + p)

  def cond(carry):
    state, counter, sums = carry
    return jnp.any(state.alive)

  def body(carry):
    state, counter, sums = carry
    new_state = pt_step(scene, config, state)
    died = state.alive & ~new_state.alive

    # ONE fused scatter-add of all film channels for finished lanes
    color = _lane_color(scene, config, new_state)
    px = jnp.where(died, new_state.pixel, 0)
    dmask = died[..., None].astype(jnp.float32)
    even = (died & ((new_state.sample_iter % 2) == 0))[..., None].astype(jnp.float32)
    alb = spx.to_film_rgb(new_state.view_albedo, new_state.wl, config.spectral)
    row = jnp.concatenate([
        color * dmask,
        new_state.view_normal * dmask,
        alb * dmask,
        color * even,
        dmask,
        even,
    ], axis=-1)
    sums = FilmSums(sums.table.at[px].add(row))

    # regenerate dead lanes with the next sample ids (prefix-sum ranks)
    ranks = jnp.cumsum(died.astype(jnp.int32)) - 1
    new_ids = counter + ranks
    fresh = make_lane_payload(scene, config, jnp.where(died, new_ids, 0), end)
    regen = died & (new_ids < end)

    def pick(f, o):
      if f.ndim == 0:
        return o
      m = regen
      while m.ndim < f.ndim:
        m = m[..., None]
      return jnp.where(m, f, o)

    merged = jax.tree_util.tree_map(pick, fresh, new_state)
    merged = merged._replace(
        alive=jnp.where(died, regen, new_state.alive),
        rays_traced=new_state.rays_traced)
    counter = counter + jnp.sum(died.astype(jnp.int32))
    return merged, counter, sums

  state, counter, sums = jax.lax.while_loop(cond, body, (state, counter, sums))
  return sums, state.rays_traced


def finalize_film(sums: FilmSums, iterations: int, width: int | None = None) -> film_mod.FilmState:
  """Convert accumulated sums to the FilmState mean-based layers."""
  npix = sums.table.shape[0]
  if width is None:
    width = int(round(npix ** 0.5))
  w = width
  h = npix // w
  count = jnp.maximum(sums.count, 1.0)[..., None]
  vcount = jnp.maximum(sums.var_count, 1.0)[..., None]
  z = jnp.zeros((h, w, 3), jnp.float32)
  return film_mod.FilmState(
      camera=(sums.cam_sum / count).reshape(h, w, 3),
      variance_half=(sums.var_sum / vcount).reshape(h, w, 3),
      normals=(sums.nrm_sum / count).reshape(h, w, 3),
      albedo=(sums.alb_sum / count).reshape(h, w, 3),
      light=z, light_iteration=z,
      iteration=jnp.asarray(iterations, jnp.int32))


def render(scene, config, iterations: int | None = None,
           pool_size: int = 1 << 17) -> film_mod.FilmState:
  """Render `iterations` spp (defaults to config.samples) via the pool."""
  n = config.samples if iterations is None else iterations
  sums, _ = render_samples_static(
      scene, config, 0, n,
      pool_size=min(pool_size, config.film_width * config.film_height * n))
  return finalize_film(sums, n, config.film_width)


# ---------------------------------------------------------------------------
# Adaptive sampling (film.cxx:233-330): after a minimum budget, only pixels
# whose full/half-buffer deviation exceeds the noise threshold (dilated by a
# 5px block) keep receiving samples; the pool simply draws pixel ids from an
# active-pixel map instead of raster order.
# ---------------------------------------------------------------------------

_ADAPTIVE_MIN_SAMPLES = 32  # film.cxx:15
_ADAPTIVE_DILATION = 5


@functools.partial(jax.jit, static_argnames=("config", "num_iterations", "pool_size"))
def render_samples_mapped(scene, config, pixel_map, first_iteration,
                          num_iterations: int, sums: FilmSums,
                          pool_size: int = 1 << 17):
  """render_samples over an explicit pixel map (adaptive phase).

  pixel_map: (W*H,) int32 — sample k goes to pixel_map[k % npix]; RNG
  streams key off the unique sample id so repeated pixels stay decorrelated.
  """
  w, h = config.film_width, config.film_height
  npix = w * h
  total = npix * num_iterations
  p = min(pool_size, total)

  base = first_iteration * npix

  def payload_for(sample_ids, end):
    pix = pixel_map[sample_ids % npix]
    st = make_lane_payload(scene, config, sample_ids, end)
    # reseed with the unique sample id so map repeats stay independent
    state = rng.seed(sample_ids.astype(jnp.uint32),
                     pix.astype(jnp.uint32) + jnp.uint32(0x85EBCA6B))
    state, wl_rnd = rng.next_float(state)
    wl = spmod.sample_wavelength(wl_rnd) if config.spectral else jnp.zeros_like(wl_rnd)
    px = (pix % w).astype(jnp.int32)
    py = (pix // w).astype(jnp.int32)
    state, jit_rnd = rng.next_2d(state)
    uv = camera_mod.film_uv(px, py, w, h, jit_rnd - 0.5)
    state, lens_rnd = rng.next_2d(state)
    rays = camera_mod.generate_ray(scene.camera, uv, lens_rnd, scene=scene,
                                   equirectangular=config.equirectangular)
    return st._replace(ray_o=rays.o, ray_d=rays.d, t_min=rays.t_min,
                       t_max=rays.t_max, rng_state=state, wl=wl,
                       pixel=pix,
                       sample_iter=(sample_ids // npix).astype(jnp.int32))

  ids0 = base + jnp.arange(p, dtype=jnp.int32)
  end = base + total
  state = payload_for(ids0, end)
  counter = jnp.int32(base + p)

  def cond(carry):
    state, counter, sums = carry
    return jnp.any(state.alive)

  def body(carry):
    state, counter, sums = carry
    new_state = pt_step(scene, config, state)
    died = state.alive & ~new_state.alive
    color = _lane_color(scene, config, new_state)
    px = jnp.where(died, new_state.pixel, 0)
    dmask = died[..., None].astype(jnp.float32)
    even = (died & ((new_state.sample_iter % 2) == 0))[..., None].astype(jnp.float32)
    alb = spx.to_film_rgb(new_state.view_albedo, new_state.wl, config.spectral)
    row = jnp.concatenate([color * dmask, new_state.view_normal * dmask,
                           alb * dmask, color * even, dmask, even], axis=-1)
    sums = FilmSums(sums.table.at[px].add(row))
    ranks = jnp.cumsum(died.astype(jnp.int32)) - 1
    new_ids = counter + ranks
    fresh = payload_for(jnp.where(died, new_ids, 0), end)
    regen = died & (new_ids < end)

    def pick(f, o):
      if f.ndim == 0:
        return o
      m = regen
      while m.ndim < f.ndim:
        m = m[..., None]
      return jnp.where(m, f, o)

    merged = jax.tree_util.tree_map(pick, fresh, new_state)
    merged = merged._replace(alive=jnp.where(died, regen, new_state.alive),
                             rays_traced=new_state.rays_traced)
    counter = counter + jnp.sum(died.astype(jnp.int32))
    return merged, counter, sums

  state, counter, sums = jax.lax.while_loop(cond, body, (state, counter, sums))
  return sums, state.rays_traced


def active_pixel_map(sums: FilmSums, width: int, threshold: float):
  """Noise-driven pixel map: unconverged pixel ids (5px-dilated), padded by
  tiling so the map always has npix entries. Returns (map, active_count)."""
  npix = sums.table.shape[0]
  h = npix // width
  count = jnp.maximum(sums.count, 1.0)
  vcount = jnp.maximum(sums.var_count, 1.0)
  lum_w = jnp.array([0.212671, 0.715160, 0.072169])
  full = jnp.sum(sums.cam_sum / count[..., None] * lum_w, axis=-1)
  half = jnp.sum(sums.var_sum / vcount[..., None] * lum_w, axis=-1)
  noise = jnp.abs(full - half) / jnp.maximum(jnp.abs(full), 1e-4)
  active = (noise > threshold).reshape(h, width)
  # 5px block dilation (film.cxx:302-330)
  k = _ADAPTIVE_DILATION
  pad = k // 2
  act = jnp.pad(active, pad)
  dil = jnp.zeros_like(active)
  for dy in range(k):
    for dx in range(k):
      dil = dil | act[dy:dy + h, dx:dx + width]
  flat = dil.reshape(-1)
  n_active = jnp.sum(flat.astype(jnp.int32))
  order = jnp.argsort(~flat)  # active pixels first (stable)
  ids = jnp.arange(npix, dtype=jnp.int32)[order]
  idx = jnp.arange(npix) % jnp.maximum(n_active, 1)
  return ids[idx], n_active


def render_adaptive(scene, config, max_iterations: int | None = None,
                    batch: int = 8):
  """Progressive render with adaptive per-pixel termination."""
  n = config.samples if max_iterations is None else max_iterations
  w, h = config.film_width, config.film_height
  warm = min(_ADAPTIVE_MIN_SAMPLES, n)
  sums, _ = render_samples(scene, config, 0, warm)
  done = warm
  while done < n:
    k = min(batch, n - done)
    pmap, n_active = active_pixel_map(sums, w, config.noise_threshold)
    if int(n_active) == 0:
      break
    sums, _ = render_samples_mapped(scene, config, pmap, done, k, sums)
    done += k
  return finalize_film(sums, done, w)


# ---------------------------------------------------------------------------
# Scatter-free pooled renderer.
#
# TPU scatter-add dominates the wavefront step (~2.3ms of ~2.9ms at 512^2),
# so the production path avoids it entirely: each lane statically OWNS
# npix/P pixels (pixel = slot*P + lane). Finished samples accumulate into a
# per-lane slot array with a tiny one-hot update; the film is ONE reshape at
# the end. Sample order per lane is (slot-major, iteration-minor) and RNG
# streams still key off (pixel, iteration), so results match the reference
# estimator exactly.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("config", "num_iterations", "pool_size"))
def render_samples_static(scene, config, first_iteration, num_iterations: int,
                          pool_size: int = 1 << 17, unroll: int = 4,
                          row_offset=0, full_height: int | None = None):
  """Pool with static lane->pixel ownership; returns (FilmSums, rays).

  row_offset/full_height: band rendering for the sharded path — see
  make_lane_payload. The returned FilmSums table stays band-local.

  unroll: pt_steps per while_loop iteration. Top-level loop iterations carry
  a large fixed dispatch overhead (~0.5 ms/iter through the device tunnel,
  measured with a scalar-carry fori_loop), so several wavefront steps are
  fused into one loop body to amortize it.

  The pool runs as a CASCADE of progressively narrower phases: the alive
  count is monotone non-increasing (a lane that exhausts its samples never
  revives), so when alive drops below the next width the surviving lanes
  are compacted 4x and the loop continues at 1/4 the VPU cost. This keeps
  utilization high through the Russian-roulette geometric tail (single-phase
  utilization measured ~34% on Cornell; the tail is ~2/3 of all steps).
  Film stays scatter-free in every phase: a lane only ever touches its
  s_slots own pixels (pixel = slot*p + lane), accumulated by slot one-hot.
  """
  w, h = config.film_width, config.film_height
  npix = w * h
  n = num_iterations
  # choose P dividing npix
  s_slots = max(1, (npix + pool_size - 1) // pool_size)
  while npix % s_slots:
    s_slots += 1
  p_base = npix // s_slots
  # iteration split: films smaller than the pool widen it with k lanes per
  # pixel, each owning a disjoint n//k slice of the iterations (small pools
  # are dispatch-overhead dominated: cornell 256^2 ran 3x slower per ray
  # than 512^2 before this)
  k = 1
  if s_slots == 1:
    k = max(1, min(n, pool_size // npix))
    while n % k:
      k -= 1
  p = p_base * k
  n_lane = n // k
  per_lane = s_slots * n_lane

  # deferred NEE: the pending shadow ray rides the next step's trace launch;
  # its contribution goes into the film under the slot/parity it was
  # generated with (pend_meta). Disabled with media (transmittance needs its
  # own walk) or a radiance clamp (clamping is per-sample total).
  deferred = (not config.has_media) and (not config.has_radiance_clamp)

  slot_ids = jnp.arange(s_slots)[None, :]

  def phase(state, counter, lanes, pend_meta, film_rows, threshold: int):
    """Run the pool at width lanes.shape[0] until alive <= threshold.

    film_rows: (W, s_slots, _SUMS_WIDTH) slot-keyed accumulation.
    Returns the final carry; pendings NOT drained (caller drains).
    """
    width = lanes.shape[0]

    def ids_for(counter):
      slot = counter // n_lane
      it = first_iteration + (lanes // p_base) * n_lane + (counter % n_lane)
      return it * npix + slot * p_base + (lanes % p_base)

    def nee_row(rgb, valid, meta):
      vmask = valid[..., None].astype(jnp.float32)
      even = meta[:, 1:2]
      z3 = jnp.zeros((width, 3))
      return jnp.concatenate([rgb * vmask, z3, z3, rgb * vmask * even,
                              jnp.zeros((width, 2))], axis=-1), \
          meta[:, 0].astype(jnp.int32)

    def body_once(carry):
      state, counter, film_rows, pend_meta = carry
      new_state = pt_step(scene, config, state, deferred_nee=deferred)
      died = state.alive & ~new_state.alive

      color = _lane_color(scene, config, new_state)
      dmask = died[..., None].astype(jnp.float32)
      even = (died & ((new_state.sample_iter % 2) == 0))[..., None].astype(jnp.float32)
      alb = spx.to_film_rgb(new_state.view_albedo, new_state.wl, config.spectral)
      row = jnp.concatenate([color * dmask, new_state.view_normal * dmask,
                             alb * dmask, color * even, dmask, even], axis=-1)
      slot = jnp.clip(counter // n_lane, 0, s_slots - 1)
      onehot = (slot[:, None] == slot_ids).astype(jnp.float32)
      film_rows = film_rows + row[:, None, :] * onehot[:, :, None]

      if deferred:
        # resolved NEE from LAST step, credited to its origin slot/parity
        nrow, nslot = nee_row(new_state.res_rgb, new_state.res_valid, pend_meta)
        nhot = (nslot[:, None] == slot_ids).astype(jnp.float32)
        film_rows = film_rows + nrow[:, None, :] * nhot[:, :, None]
        new_pend_meta = jnp.stack(
            [slot.astype(jnp.float32),
             ((new_state.sample_iter % 2) == 0).astype(jnp.float32)], axis=-1)
      else:
        new_pend_meta = pend_meta

      new_counter = counter + died.astype(jnp.int32)
      has_more = new_counter < per_lane
      fresh = make_lane_payload(scene, config,
                                ids_for(jnp.minimum(new_counter, per_lane - 1)),
                                jnp.int32(2 ** 30),
                                row_offset=row_offset, full_height=full_height)
      regen = died & has_more

      def pick(f, o):
        if f.ndim == 0:
          return o
        m = regen
        while m.ndim < f.ndim:
          m = m[..., None]
        return jnp.where(m, f, o)

      merged = jax.tree_util.tree_map(pick, fresh, new_state)
      merged = merged._replace(alive=jnp.where(died, regen, new_state.alive),
                               rays_traced=new_state.rays_traced,
                               # pending NEE survives lane regeneration: it
                               # belongs to the PREVIOUS sample, credited via
                               # pend_meta, resolved next step
                               psh_o=new_state.psh_o, psh_d=new_state.psh_d,
                               psh_tmax=new_state.psh_tmax,
                               psh_rgb=new_state.psh_rgb)
      return merged, new_counter, film_rows, new_pend_meta

    def body(carry):
      for _ in range(unroll):
        carry = body_once(carry)
      return carry

    if threshold > 0:
      def cond(carry):
        return jnp.sum(carry[0].alive.astype(jnp.int32)) > threshold
    else:
      def cond(carry):
        return jnp.any(carry[0].alive)

    return jax.lax.while_loop(cond, body,
                              (state, counter, film_rows, pend_meta))

  def drain(state, pend_meta, film_rows):
    """Resolve every lane's unresolved pending shadow ray."""
    if not deferred:
      return state, film_rows
    width = state.alive.shape[0]
    occ = trace_ops.trace_occluded(scene, state.psh_o, state.psh_d,
                                   jnp.full(width, em.kRayEpsilon),
                                   jnp.maximum(state.psh_tmax, 0.0))
    valid = (state.psh_tmax > 0.0) & ~occ
    rgb = jnp.where(valid[..., None], state.psh_rgb, 0.0)
    vmask = valid[..., None].astype(jnp.float32)
    even = pend_meta[:, 1:2]
    z3 = jnp.zeros((width, 3))
    nrow = jnp.concatenate([rgb * vmask, z3, z3, rgb * vmask * even,
                            jnp.zeros((width, 2))], axis=-1)
    nslot = pend_meta[:, 0].astype(jnp.int32)
    nhot = (nslot[:, None] == slot_ids).astype(jnp.float32)
    film_rows = film_rows + nrow[:, None, :] * nhot[:, :, None]
    return state._replace(psh_tmax=jnp.full(width, -1.0)), film_rows

  # cascade widths: p, p//4, p//16, ... (min 4096)
  widths = [p]
  while widths[-1] // 4 >= 4096 and len(widths) < 4:
    widths.append(widths[-1] // 4)

  lane0 = jnp.arange(p, dtype=jnp.int32)
  init_it = first_iteration + (lane0 // p_base) * n_lane
  state = make_lane_payload(
      scene, config,
      init_it * npix + (lane0 % p_base), jnp.int32(2 ** 30),
      row_offset=row_offset, full_height=full_height)
  counter = jnp.zeros(p, jnp.int32)
  lanes = lane0
  pend_meta = jnp.zeros((p, 2), jnp.float32)
  film_rows = jnp.zeros((p, s_slots, _SUMS_WIDTH))
  table = jnp.zeros((npix, _SUMS_WIDTH))

  for li, width in enumerate(widths):
    last = li == len(widths) - 1
    threshold = 0 if last else widths[li + 1]
    state, counter, film_rows, pend_meta = phase(
        state, counter, lanes, pend_meta, film_rows, threshold)
    # drain pendings at this width BEFORE dropping any lane
    state, film_rows = drain(state, pend_meta, film_rows)

    # fold this phase's film rows into the global table
    if width == p:
      # (width, s_slots, S) -> (s_slots, k, p_base, S): width is lane-major
      # with lane = q*p_base + x, so the k iteration-split copies of each
      # pixel sum out on axis 1; slot-major matches the table layout
      folded = jnp.transpose(film_rows, (1, 0, 2)).reshape(
          s_slots, k, p_base, _SUMS_WIDTH).sum(axis=1)
      table = table + folded.reshape(npix, _SUMS_WIDTH)
    else:
      pix = (jnp.arange(s_slots)[None, :] * p_base
             + (lanes % p_base)[:, None]).reshape(-1)
      table = table.at[pix].add(
          film_rows.reshape(width * s_slots, _SUMS_WIDTH))

    if last:
      break

    # compact the <=threshold surviving lanes into the next width
    nw = widths[li + 1]
    order = jnp.argsort(~state.alive)  # alive lanes first (stable)
    sel = order[:nw]

    def take(x):
      if getattr(x, "ndim", 0) == 0:
        return x
      return x[sel]

    state = jax.tree_util.tree_map(take, state)
    counter = counter[sel]
    lanes = lanes[sel]
    pend_meta = jnp.zeros((nw, 2), jnp.float32)
    film_rows = jnp.zeros((nw, s_slots, _SUMS_WIDTH))

  return FilmSums(table), state.rays_traced


# Whole-call jitted pool renderer. One device execution per call (the
# unjitted path runs each cascade phase + fold as separate dispatches), and
# — measured on v5e — XLA compiles the single fused graph ~5x faster than
# the per-phase eager path (71 s vs 403 s on Cornell 256²). first_iteration
# is a traced argument, so repeat calls with different offsets reuse the
# executable.
render_samples_compiled = jax.jit(
    render_samples_static,
    static_argnames=("config", "num_iterations", "pool_size", "unroll",
                     "full_height"))


def render_preview(scene, config, pixel_size: int = 8, iterations: int = 1,
                   pool_size: int = 1 << 17):
  """Progressive preview: render the film at 1/pixel_size resolution and
  upsample (Film::active_pixel pixel_size blocks, film.cxx:434-459 — the
  camera-move preview path of RTApplication, app.cxx:131-142).

  Returns a full-resolution (H, W, 3) image.
  """
  import dataclasses
  w, h = config.film_width, config.film_height
  pw = max(1, w // pixel_size)
  ph = max(1, h // pixel_size)
  small = dataclasses.replace(config, film_width=pw, film_height=ph)
  sums, _ = render_samples_static(scene, small, 0, iterations,
                                  pool_size=min(pool_size, pw * ph))
  img = finalize_film(sums, iterations, pw).camera.reshape(ph, pw, 3)
  img = jnp.repeat(jnp.repeat(img, pixel_size, axis=0), pixel_size, axis=1)
  return img[:h, :w]
