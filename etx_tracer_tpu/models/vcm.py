"""Vertex Connection and Merging (and BDPT / light tracing as sub-modes).

TPU-native rebuild of the reference VCM (rt/integrators/vcm_cpu.cxx +
rt/shared/vcm_shared.hxx): the same two-phase iteration and d_vcm/d_vc/d_vm
MIS recurrences, restructured as fixed-shape wavefronts —

- LIGHT PASS: one lane per light path; every bounce stores a vertex into a
  per-lane slot array (replacing the mutex-guarded vertex append,
  vcm_cpu.cxx:163-171) and splats a connection to the camera into the
  light film (atomic_add -> scatter-add).
- GRID BUILD: light vertices sort by spatial cell hash; cell ranges come
  from searchsorted (the "sort-then-segment-gather" merge of the north
  star) — replacing the parallel counting-sort (vcm_shared.cxx:49-152).
- CAMERA PASS: one lane per pixel. Vertex connections are LANE-ALIGNED
  (camera path i connects to light path i, as in the reference's
  light_paths[state.global_index]) so they need no gathers; merging
  gathers sorted vertices from the 8 neighbor cells with a bounded scan.

Disabling merging yields BDPT ("BDPTFull" estimator family); disabling
everything but connect-to-camera yields light tracing; camera-only modes
reduce to the PT estimators (bidirectional.cxx:323-331 mode set).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from etx_tracer_tpu.core import math as em
from etx_tracer_tpu.core import rng
from etx_tracer_tpu.core import spectrum as spmod
from etx_tracer_tpu.models import path_tracing as pt
from etx_tracer_tpu.ops import gather as gops
from etx_tracer_tpu.ops import trace as trace_ops
from etx_tracer_tpu.render import camera as camera_mod
from etx_tracer_tpu.render import emitters as emitters_mod
from etx_tracer_tpu.render import film as film_mod
from etx_tracer_tpu.render import spectral as spx
from etx_tracer_tpu.render.bsdf import dispatch as bsdf_dispatch
from etx_tracer_tpu.render.bsdf.lobes import ShadingData
from etx_tracer_tpu.scene import packed
from etx_tracer_tpu.scene.types import MaterialClass as MC


@dataclasses.dataclass(frozen=True)
class VCMOptions:
  """VCMOptions (vcm_shared.cxx:30-47): strategy toggles + radius schedule."""
  direct_hit: bool = True
  connect_to_light: bool = True
  connect_to_camera: bool = True
  connect_vertices: bool = True
  enable_merging: bool = True
  enable_mis: bool = True
  initial_radius: float = 0.0   # 0 -> 5*scene_radius/max_film_dim
  radius_decay: int = 256
  max_stored_vertices: int = 8
  # per-cell photon budget: overfull cells keep a RANDOM subset of this
  # many photons with energy rescaled by occupancy/budget (unbiased
  # stochastic subsampling). Bounds the merge scan — dense caustic cells
  # held thousands of photons and the scan is gather-bound on TPU. 0 = no
  # cap (the reference CPU scans every photon in range).
  max_photons_per_cell: int = 16
  # BDPTFast analogue (bidirectional.cxx:323-331,1079-1233): approximate
  # MIS weights that substitute each vertex's REVERSE pdf with its forward
  # pdf (already computed by the paired evaluate/sample call). The same
  # approximation applies at every site a given vertex's reverse pdf
  # appears, so the weights still partition unity and the estimator stays
  # unbiased — variance re-balances slightly. Skips every reverse-pdf
  # BSDF dispatch (the expensive half of connection/merge evals).
  fast_mis: bool = False


def bdpt_options() -> VCMOptions:
  """BDPT = VCM without merging (bidirectional.cxx BDPTFull analogue)."""
  return VCMOptions(enable_merging=False)


def bdpt_fast_options() -> VCMOptions:
  """BDPTFast analogue: approximate MIS weights, no reverse-pdf evals."""
  return VCMOptions(enable_merging=False, fast_mis=True)


def light_tracing_options() -> VCMOptions:
  # single-strategy estimator: MIS must be off (no competing techniques)
  return VCMOptions(direct_hit=False, connect_to_light=False,
                    connect_vertices=False, enable_merging=False,
                    enable_mis=False)


class VCMState(NamedTuple):
  """VCMPathState wavefront (vcm_shared.hxx:150-198)."""
  ray_o: jnp.ndarray
  ray_d: jnp.ndarray
  throughput: jnp.ndarray    # (R,C)
  gathered: jnp.ndarray      # (R,C) camera-side accumulation
  d_vcm: jnp.ndarray
  d_vc: jnp.ndarray
  d_vm: jnp.ndarray
  eta: jnp.ndarray
  medium: jnp.ndarray
  path_depth: jnp.ndarray    # total_path_depth
  path_distance: jnp.ndarray
  rng_state: jnp.ndarray
  wl: jnp.ndarray
  alive: jnp.ndarray
  delta_emitter: jnp.ndarray  # light paths only
  local_emitter: jnp.ndarray
  rays_traced: jnp.ndarray   # () float32 — closest + occlusion rays launched


class LightVertices(NamedTuple):
  """Per-lane stored light vertices (VCMLightVertex, vcm_shared.hxx:170+)."""
  pos: jnp.ndarray         # (R,V,3)
  nrm: jnp.ndarray         # (R,V,3)
  geo_n: jnp.ndarray       # (R,V,3)
  w_i: jnp.ndarray         # (R,V,3)
  tan: jnp.ndarray         # (R,V,3)
  btn: jnp.ndarray         # (R,V,3)
  uv: jnp.ndarray          # (R,V,2)
  throughput: jnp.ndarray  # (R,V,C)
  d_vcm: jnp.ndarray       # (R,V)
  d_vc: jnp.ndarray        # (R,V)
  d_vm: jnp.ndarray        # (R,V)
  mat: jnp.ndarray         # (R,V) int32
  path_length: jnp.ndarray  # (R,V) int32
  valid: jnp.ndarray       # (R,V) bool
  is_medium: jnp.ndarray   # (R,V) bool (VCMLightVertex::is_medium, :189)
  medium: jnp.ndarray      # (R,V) int32


def _alloc_vertices(r, v, c):
  z3 = jnp.zeros((r, v, 3))
  return LightVertices(
      pos=z3, nrm=z3, geo_n=z3, w_i=z3, tan=z3, btn=z3,
      uv=jnp.zeros((r, v, 2)), throughput=jnp.zeros((r, v, c)),
      d_vcm=jnp.zeros((r, v)), d_vc=jnp.zeros((r, v)), d_vm=jnp.zeros((r, v)),
      mat=jnp.zeros((r, v), jnp.int32), path_length=jnp.zeros((r, v), jnp.int32),
      valid=jnp.zeros((r, v), bool),
      is_medium=jnp.zeros((r, v), bool),
      medium=jnp.full((r, v), -1, jnp.int32))


def _shading_data(scene, state, pos, nrm, tan, btn, uv, mat):
  return ShadingData(w_i=state.ray_d, nrm=nrm, tan=tan, btn=btn,
                     geo_n=nrm, tex=uv, wl=state.wl,
                     medium=state.medium, mat=mat)


# ---------------------------------------------------------------------------
# Light pass
# ---------------------------------------------------------------------------


def _generate_light_state(scene, config, n_paths, iteration, vc_weight,
                          path_offset=0, n_valid=None):
  """vcm_generate_emitter_state (vcm_shared.hxx:310-349).

  path_offset: shift to GLOBAL light-path ids (sharded light pass — each
  device traces a slice of the path population with the same seeds the
  single-device pass would use). n_valid: global path count; paths with
  global id >= n_valid start dead (uneven-shard padding).
  """
  r = n_paths
  c = spx.channels(config.spectral)
  idx = jnp.arange(r, dtype=jnp.uint32) + jnp.uint32(path_offset)
  state = rng.seed(idx, jnp.full(r, iteration, jnp.uint32))
  state, wl_rnd = rng.next_float(state)
  wl = spmod.sample_wavelength(wl_rnd) if config.spectral else jnp.zeros(r)

  state, rnd_sel = rng.next_float(state)
  state, rnd_pos = rng.next_2d(state)
  state, rnd_dir = rng.next_2d(state)
  es = emitters_mod.sample_emission(scene, rnd_sel, rnd_pos, rnd_dir, wl, config.spectral)

  cos_t = em.dot(es.direction, es.normal)
  denom = es.pdf_dir * es.pdf_area * es.pdf_sample
  throughput = es.value * (cos_t / jnp.maximum(denom, 1e-20))[..., None]
  valid = (es.pdf_dir > 0.0) & (cos_t > 0.0)
  if n_valid is not None:
    valid = valid & (idx < jnp.uint32(n_valid))

  origin = jnp.where(
      (es.triangle_index >= 0)[..., None],
      em.offset_ray(es.origin, es.geo_n * jnp.where(em.dot(es.geo_n, es.direction) >= 0, 1.0, -1.0)[..., None]),
      es.origin)

  d_vcm = jnp.where(es.is_distant, 1.0 / jnp.maximum(es.pdf_area, 1e-20),
                    1.0 / jnp.maximum(es.pdf_dir, 1e-20))
  d_vc = jnp.where(es.is_delta, 0.0,
                   jnp.where(es.is_distant, 1.0, cos_t) / jnp.maximum(denom, 1e-20))
  d_vm = d_vc * vc_weight

  return VCMState(
      ray_o=origin, ray_d=es.direction,
      throughput=jnp.where(valid[..., None], throughput, 0.0),
      gathered=jnp.zeros((r, c)),
      d_vcm=d_vcm, d_vc=d_vc, d_vm=d_vm,
      eta=jnp.ones(r), medium=es.medium_index,
      path_depth=jnp.zeros(r, jnp.int32),
      path_distance=jnp.zeros(r),
      rng_state=state, wl=wl, alive=valid,
      delta_emitter=es.is_delta, local_emitter=~es.is_distant,
      rays_traced=jnp.zeros((), jnp.float32))


def light_pass(scene, config, options: VCMOptions, iteration, n_paths: int,
               vc_weight, vm_weight, path_offset=0, n_valid=None,
               splat_shape=None):
  """Trace light subpaths; returns (vertices, splat image, rng state).

  The walk runs to config.max_path_length under a while_loop with an
  any-alive early exit — path depth is NOT capped by vertex storage
  (reference parity: bidirectional.cxx:273-317 stores every vertex; here
  only the first max_stored_vertices are kept for camera-side connections,
  while deeper bounces keep contributing through connect-to-camera splats,
  direct hits and merging). Splats scatter straight into a film-sized
  image per bounce instead of per-slot buffers, so their count is
  unbounded too.

  splat_shape: (image_rows, true_film_height) — the splat image row count
  (padded for sharding) and the TRUE film height driving the NDC->pixel
  mapping. Defaults to (config.film_height,) * 2.
  """
  spectral = config.spectral
  classes = config.material_classes
  c = spx.channels(spectral)
  v_slots = options.max_stored_vertices
  state = _generate_light_state(scene, config, n_paths, iteration, vc_weight,
                                path_offset=path_offset, n_valid=n_valid)
  verts = _alloc_vertices(n_paths, v_slots, c)
  img_rows, true_h = splat_shape or (config.film_height, config.film_height)
  film_w = config.film_width
  splat_img = jnp.zeros((img_rows, film_w, 3))

  max_depth = config.max_path_length

  base_scene = scene
  wl0 = state.wl

  def make_body(r, with_verts):
   # with_verts=False: the tail phases past v_slots depths store nothing
   # lane-indexed, so the pool can compact freely (see cascade below)
   def body(carry):
    if with_verts:
      slot, state, verts, splat_img = carry
    else:
      slot, state, splat_img = carry
      verts = None
    scene = base_scene
    if spectral:
      # per-step SPD table (see path_tracing.pt_step): one MXU matmul
      # replaces the per-lane bank gathers for every query at state.wl
      from etx_tracer_tpu.core import spectrum as sp_mod
      scene = scene._replace(spec_at_wl=(
          state.wl, sp_mod.bank_at_wl(scene.spec_values, state.wl)))
    t_max = jnp.where(state.alive, em.kMaxFloat, 0.0)
    hit = trace_ops.trace_closest(scene, state.ray_o, state.ray_d,
                                  jnp.full(r, em.kRayEpsilon), t_max)
    found = hit.found & state.alive
    rays_ct = state.rays_traced + jnp.sum(state.alive.astype(jnp.float32))

    # medium free-path sampling (vcm_try_sampling_medium, vcm_shared.hxx:379)
    medium_event = jnp.zeros(r, bool)
    if config.has_media:
      from etx_tracer_tpu.render import media as media_mod
      rng_state_m = state.rng_state
      mv = media_mod.gather_medium(scene, state.medium, state.wl, spectral)
      seg_t = jnp.where(hit.found, hit.t, 2.0 * scene.bsphere_radius * 100.0)
      seg_t = jnp.where(state.alive & mv.valid, seg_t, 0.0)
      msample, rng_state_m = media_mod.sample_medium(
          scene, mv, state.wl, state.throughput, rng_state_m,
          state.ray_o, state.ray_d, jnp.maximum(seg_t, em.kRayEpsilon), spectral)
      in_medium = state.alive & mv.valid & (seg_t > 0.0)
      medium_event = in_medium & msample.sampled
      state = state._replace(
          throughput=jnp.where(in_medium[..., None],
                               state.throughput * msample.weight,
                               state.throughput),
          rng_state=rng_state_m)
      found = found & ~medium_event

    pos, nrm, tan, btn, uv, bc, tri, trows = pt._interpolate_hit(scene, hit, state.ray_d)
    mat = pt._gather_mat(scene, trows.mat)

    # boundary handling: pass through (depth unchanged)
    is_boundary = found & (mat.cls == MC.Boundary) if MC.Boundary in classes else jnp.zeros(r, bool)

    # vcm_update_light_vcm (vcm_shared.hxx:451-461)
    seg = state.path_distance + hit.t
    scale_vcm = jnp.where((state.path_depth > 0) | state.local_emitter, em.sqr(seg), 1.0)
    cos_prev = jnp.maximum(jnp.abs(em.dot(nrm, -state.ray_d)), 1e-6)
    upd = found & ~is_boundary
    d_vcm = jnp.where(upd, state.d_vcm * scale_vcm / cos_prev, state.d_vcm)
    d_vc = jnp.where(upd, state.d_vc / cos_prev, state.d_vc)
    d_vm = jnp.where(upd, state.d_vm / cos_prev, state.d_vm)
    path_distance = jnp.where(upd, 0.0, state.path_distance)
    if config.has_media:
      # fold boundary + medium segment (vcm_handle_sampled_medium :393-399)
      seg_m = state.path_distance + msample.t
      d_vcm = jnp.where(medium_event, state.d_vcm * em.sqr(seg_m), d_vcm)
      path_distance = jnp.where(medium_event, 0.0, path_distance)
    state = state._replace(d_vcm=d_vcm, d_vc=d_vc, d_vm=d_vm, path_distance=path_distance)

    sd = _shading_data(scene, state, pos, nrm, tan, btn, uv, mat)
    sd = sd._replace(geo_n=trows.geo_n)

    is_delta_mat = bsdf_dispatch.is_delta(sd)
    # storable: a physical connectable vertex (non-delta surface or medium
    # event). Storage additionally requires a free slot; camera connections
    # do NOT (deep vertices splat even when the slot array is full).
    storable = (upd & ~is_delta_mat) | medium_event
    needs_verts = options.connect_vertices or options.enable_merging
    store = storable & (slot < v_slots) if needs_verts \
        else jnp.zeros(r, bool)
    vslot = jnp.minimum(slot, v_slots - 1)

    def msel(surf_v, med_v):
      m = medium_event
      while m.ndim < surf_v.ndim:
        m = m[..., None]
      return jnp.where(m, med_v, surf_v)

    v_pos = msel(pos, msample.pos) if config.has_media else pos

    def put(field, value):
      m = store
      while m.ndim < value.ndim:
        m = m[..., None]
      return field.at[:, vslot].set(jnp.where(m, value, field[:, vslot]))

    zero3 = jnp.zeros((r, 3))
    if with_verts:
      verts = LightVertices(
        pos=put(verts.pos, v_pos),
        nrm=put(verts.nrm, msel(nrm, zero3) if config.has_media else nrm),
        geo_n=put(verts.geo_n, msel(trows.geo_n, zero3) if config.has_media else trows.geo_n),
        w_i=put(verts.w_i, state.ray_d),
        tan=put(verts.tan, tan), btn=put(verts.btn, btn),
        uv=put(verts.uv, uv),
        throughput=put(verts.throughput, state.throughput),
        d_vcm=put(verts.d_vcm, state.d_vcm),
        d_vc=put(verts.d_vc, state.d_vc),
        d_vm=put(verts.d_vm, state.d_vm),
        mat=put(verts.mat, jnp.where(medium_event, 0, trows.mat) if config.has_media else trows.mat),
        path_length=put(verts.path_length, state.path_depth + 1),
        # clamped-index writes past v_slots must PRESERVE (an unmasked set
        # at the clamped last slot erased its valid flag on deep walks)
        valid=verts.valid.at[:, vslot].set(verts.valid[:, vslot] | store),
        is_medium=verts.is_medium.at[:, vslot].set(
            jnp.where(store, medium_event, verts.is_medium[:, vslot])),
          medium=put(verts.medium, state.medium))

    # --- connect to camera (vcm_connect_to_camera, :463-536) ---
    rng_state = state.rng_state
    rng_state, lens_rnd = rng.next_2d(rng_state)
    conn_pos = v_pos  # surface hit or sampled medium position
    cam = camera_mod.sample_film(scene.camera, conn_pos, lens_rnd)
    w_o = cam.direction
    bsdf_val, bsdf_fwd_pdf = bsdf_dispatch.evaluate(scene, sd, w_o, spectral, classes, config.diffuse_variations)
    rev_pdf = bsdf_fwd_pdf if options.fast_mis else \
        bsdf_dispatch.reverse_pdf(scene, sd, w_o, spectral, classes)
    if config.has_media:
      # medium lanes scatter with the phase function (vcm_connect_to_camera
      # camera_at_medium branch)
      phase_cam = media_mod.phase_hg(state.ray_d, w_o, mv.phase_g)
      bsdf_val = jnp.where(medium_event[..., None], phase_cam[..., None], bsdf_val)
      rev_pdf = jnp.where(medium_event, phase_cam, rev_pdf)
    sh_o = pt._shading_pos(trows.geo_n, pos, w_o)
    if config.has_media:
      sh_o = jnp.where(medium_event[..., None], msample.pos, sh_o)
    dist = em.length(cam.position - sh_o)
    if config.has_media:
      # transmittance-aware connection (rt.cxx trace_transmittance usage in
      # the VCM/BDPT connection kernels)
      tr_con, rng_state = pt._trace_transmittance(
          scene, config, rng_state, state.medium, sh_o, cam.position,
          state.wl, spectral)
      occluded = jnp.max(tr_con, axis=-1) <= 0.0
    else:
      tr_con = None
      occluded = trace_ops.trace_occluded(
          scene, sh_o, w_o, jnp.full(r, em.kRayEpsilon), dist * (1.0 - 1e-3))
    if options.connect_to_camera:
      rays_ct = rays_ct + jnp.sum((storable & cam.valid).astype(jnp.float32))
    dist2 = jnp.maximum(em.dot(cam.position - conn_pos, cam.position - conn_pos), 1e-12)
    # pdf_dir_out of the camera (scene_camera.hxx:112); cam.weight encodes
    # importance/pdf (scene_camera.hxx:108-116)
    pdf_dir_out = 1.0 / jnp.maximum(
        scene.camera.area * jnp.maximum(-em.dot(cam.direction, scene.camera.direction), 1e-9) ** 3, 1e-12)
    cos_cam = jnp.abs(em.dot(nrm, w_o))
    vmw_cam = jnp.full(r, vm_weight)
    fix = bsdf_dispatch.fix_shading_normal(trows.geo_n, nrm, state.ray_d, w_o)
    if config.has_media:
      cos_cam = jnp.where(medium_event, 1.0, cos_cam)
      vmw_cam = jnp.where(medium_event, 0.0, vmw_cam)
      fix = jnp.where(medium_event, 1.0, fix)
    camera_pdf_area = pdf_dir_out * cos_cam / dist2
    w_light = camera_pdf_area * (vmw_cam + state.d_vcm + state.d_vc * rev_pdf)
    mis_w = jnp.where(options.enable_mis, 1.0 / (1.0 + w_light), 1.0)
    contrib = bsdf_val * state.throughput * (cam.weight * mis_w * fix)[..., None]
    if config.has_media:
      contrib = contrib * tr_con
    can_connect = (storable & options.connect_to_camera & cam.valid & ~occluded
                   & (state.path_depth + 2 <= config.max_path_length))
    if config.has_media:
      # explicit connections from media gated per medium (med.enable_explicit)
      can_connect = can_connect & jnp.where(medium_event,
                                            mv.explicit_connections, True)
    rgb = spx.to_film_rgb(contrib, state.wl, spectral)
    # normalization: splats average over light paths, scaled back to
    # per-pixel units (film.cxx:332-343 commit divides by iterations only;
    # each iteration traces n_paths paths for a film of w*h_local pixels —
    # sharded shards keep the same 1:1 path:pixel ratio so the factor
    # matches the single-device one)
    rgb = rgb / float(n_paths) * (config.film_width * config.film_height)
    # scatter-add this bounce's splats into the film image (the TPU form of
    # film.cxx:147-171 atomic_add_float; per-bounce so splat count is
    # unbounded by vertex storage)
    suv = cam.uv * 0.5 + 0.5
    fx = suv[..., 0] * film_w
    fy = suv[..., 1] * true_h
    if config.pixel_filter == "blackman-harris":
      # filter-consistent splatting (r5, BEYOND the reference: film.cxx
      # bins splats at raw positions = box while camera rays are
      # BH-jittered, which leaves a stationary pixel-scale PT-vs-VCM
      # difference ~0.8% on the light-layer share of the image). Jitter
      # the splat by the same radial BH kernel so every transport path
      # sees ONE reconstruction filter.
      rng_state, f_rnd = rng.next_2d(rng_state)
      fj = camera_mod.blackman_harris_jitter(f_rnd)
      fx = fx + fj[..., 0]
      fy = fy + fj[..., 1]
    sx = jnp.floor(fx).astype(jnp.int32)
    sy = jnp.floor(fy).astype(jnp.int32)
    s_ok = can_connect & (sx >= 0) & (sx < film_w) & (sy >= 0) & (sy < img_rows)
    sx = jnp.clip(sx, 0, film_w - 1)
    sy = jnp.clip(sy, 0, img_rows - 1)
    splat_img = splat_img.at[sy, sx].add(
        jnp.where(s_ok[..., None], rgb, 0.0))

    # --- bsdf sample + vcm_next_ray (:219-283) ---
    rng_state, rnd_bsdf = rng.next_n(rng_state, bsdf_dispatch.NUM_SAMPLE_RND)
    bs = bsdf_dispatch.sample(scene, sd, rnd_bsdf, spectral, classes,
                              config.diffuse_variations)
    fixn = bsdf_dispatch.fix_shading_normal(trows.geo_n, nrm, state.ray_d, bs.w_o)
    new_thr = state.throughput * bs.weight * fixn[..., None]
    rng_state, rr_rnd = rng.next_float(rng_state)
    new_depth = state.path_depth + 1
    cont, new_thr = pt._random_continue(new_depth, config.rr_start, state.eta * bs.eta, rr_rnd, new_thr)

    cos_bsdf = jnp.abs(em.dot(nrm, bs.w_o))
    rev2 = bs.pdf if options.fast_mis else \
        bsdf_dispatch.reverse_pdf(scene, sd, bs.w_o, spectral, classes)
    nd_vc = jnp.where(bs.is_delta, state.d_vc * cos_bsdf,
                      (cos_bsdf / jnp.maximum(bs.pdf, 1e-20))
                      * (state.d_vc * rev2 + state.d_vcm + vm_weight))
    nd_vm = jnp.where(bs.is_delta, state.d_vm * cos_bsdf,
                      (cos_bsdf / jnp.maximum(bs.pdf, 1e-20))
                      * (state.d_vm * rev2 + state.d_vcm * vc_weight + 1.0))
    nd_vcm = jnp.where(bs.is_delta, 0.0, 1.0 / jnp.maximum(bs.pdf, 1e-20))

    new_o = pt._shading_pos(trows.geo_n, pos, bs.w_o)
    surf_alive = upd & cont & (bs.pdf > 0.0) & (new_depth + 1 <= config.max_path_length) \
        & (jnp.max(new_thr, axis=-1) > 0.0)

    # boundary lanes: pass straight through
    ent = em.dot(nrm, state.ray_d) < 0.0
    b_medium = jnp.where(ent, mat.int_medium, mat.ext_medium)
    b_o = pt._shading_pos(trows.geo_n, pos, state.ray_d)

    if config.has_media:
      # phase continuation (vcm_handle_sampled_medium :405-435)
      rng_state, m_rnd_phase = rng.next_2d(rng_state)
      phase_dir = media_mod.sample_phase_hg(state.ray_d, mv.phase_g, m_rnd_phase)
      phase_pdf = media_mod.phase_hg(state.ray_d, phase_dir, mv.phase_g)
      inv_p = 1.0 / jnp.maximum(phase_pdf, 1e-20)
      md_vc = inv_p * (state.d_vc * phase_pdf + state.d_vcm)
      md_vm = inv_p * (state.d_vm * phase_pdf)
      md_vcm = inv_p
      rng_state, m_rr = rng.next_float(rng_state)
      m_thr = state.throughput
      m_cont, m_thr = pt._random_continue(state.path_depth + 1, config.rr_start,
                                          state.eta, m_rr, m_thr)
      med_alive = medium_event & m_cont \
          & (state.path_depth + 2 <= config.max_path_length)
      me = medium_event
      state = state._replace(
          ray_o=jnp.where(me[..., None], msample.pos, state.ray_o),
          ray_d=jnp.where(me[..., None], phase_dir, state.ray_d),
          throughput=jnp.where(me[..., None], m_thr, state.throughput),
          d_vcm=jnp.where(me, md_vcm, state.d_vcm),
          d_vc=jnp.where(me, md_vc, state.d_vc),
          d_vm=jnp.where(me, md_vm, state.d_vm),
          path_depth=jnp.where(me, state.path_depth + 1, state.path_depth))
    else:
      me = jnp.zeros(r, bool)

    state = state._replace(
        ray_o=jnp.where(me[..., None], state.ray_o,
                        jnp.where(is_boundary[..., None], b_o,
                                  jnp.where(upd[..., None], new_o, state.ray_o))),
        ray_d=jnp.where(upd[..., None], bs.w_o, state.ray_d),
        throughput=jnp.where(upd[..., None], new_thr, state.throughput),
        d_vcm=jnp.where(upd, nd_vcm, state.d_vcm),
        d_vc=jnp.where(upd, nd_vc, state.d_vc),
        d_vm=jnp.where(upd, nd_vm, state.d_vm),
        eta=jnp.where(upd, state.eta * bs.eta, state.eta),
        medium=jnp.where(is_boundary, b_medium, jnp.where(upd, bs.medium, state.medium)),
        path_depth=jnp.where(upd, new_depth, state.path_depth),
        path_distance=jnp.where(is_boundary, state.path_distance + hit.t, state.path_distance),
        rng_state=rng_state,
        alive=jnp.where(me, (med_alive if config.has_media else state.alive),
                        jnp.where(is_boundary, state.alive, surf_alive)),
        rays_traced=rays_ct)
    if config.validate:
      from etx_tracer_tpu.utils import validate as val
      amask = state.alive[..., None]
      val.check_finite("vcm:light_pass",
                       throughput=jnp.where(amask, state.throughput, 0.0),
                       d_vcm=jnp.where(state.alive, state.d_vcm, 0.0),
                       splat_img=splat_img)
    if with_verts:
      return slot + 1, state, verts, splat_img
    return slot + 1, state, splat_img
   return body

  # phase A: lane-aligned vertex stores for the first v_slots depths
  needs_verts = options.connect_vertices or options.enable_merging
  phase_a = min(v_slots, max_depth) if needs_verts else 0
  slot = jnp.int32(0)
  if phase_a > 0:
    body_a = make_body(n_paths, True)

    def cond_a(carry):
      return (carry[0] < phase_a) & jnp.any(carry[1].alive)

    slot, state, verts, splat_img = jax.lax.while_loop(
        cond_a, body_a, (slot, state, verts, splat_img))

  # tail cascade: nothing past phase A is lane-indexed (stores stopped;
  # splats scatter by film pixel), so dead lanes compact away freely
  widths = [n_paths]
  while widths[-1] // 4 >= _CAMERA_CASCADE_MIN and len(widths) < 4:
    widths.append(widths[-1] // 4)
  for li, width in enumerate(widths):
    last = li == len(widths) - 1
    body_t = make_body(width, False)
    if last:
      def cond_t(carry):
        return (carry[0] < max_depth) & jnp.any(carry[1].alive)
    else:
      thr_w = widths[li + 1]
      def cond_t(carry, _t=thr_w):
        return (carry[0] < max_depth) & \
            (jnp.sum(carry[1].alive.astype(jnp.int32)) > _t)
    slot, state, splat_img = jax.lax.while_loop(
        cond_t, body_t, (slot, state, splat_img))
    if last:
      break
    sel = jnp.argsort(~state.alive)[: widths[li + 1]]
    state = jax.tree_util.tree_map(
        lambda x: x[sel] if getattr(x, "ndim", 0) else x, state)

  # callers read .wl per ORIGINAL light path (merge-grid wavelengths);
  # the cascade may have narrowed the live state, so restore the
  # full-width wavelength array (wl never changes during the walk)
  return verts, splat_img, state._replace(wl=wl0)


# ---------------------------------------------------------------------------
# Spatial hash grid: sort vertices by cell, ranges via searchsorted
# ---------------------------------------------------------------------------


class MergeGrid(NamedTuple):
  sorted_cell: jnp.ndarray   # (N,) int32 cell id per sorted vertex
  pos: jnp.ndarray           # (N,3)
  nrm: jnp.ndarray           # (N,3)
  w_i: jnp.ndarray           # (N,3)
  d_vcm: jnp.ndarray         # (N,)
  d_vm: jnp.ndarray          # (N,)
  path_length: jnp.ndarray   # (N,) int32
  throughput_rgb: jnp.ndarray  # (N,3) throughput/sampling_pdf in RGB
  valid: jnp.ndarray         # (N,)
  grid_min: jnp.ndarray      # (3,)
  cell_size: jnp.ndarray     # ()
  table_mask: int
  # packed per-photon row [pos, nrm, w_i, d_vcm, d_vm, thr_rgb, valid, pad]
  # (N,16): the merge scan fetches ONE row gather instead of seven — TPU
  # gathers dominate the photon loop
  rows: jnp.ndarray = None
  cell_cap: int = 0  # static per-cell photon budget (0 = uncapped)


_HASH_MASK = (1 << 16) - 1


def _cell_hash(ix, iy, iz):
  """73856093/19349663/83492791 hash (vcm_shared.hxx:820-827)."""
  h = (ix * jnp.int32(73856093)) ^ (iy * jnp.int32(19349663)) ^ (iz * jnp.int32(83492791))
  return (h & jnp.int32(_HASH_MASK)).astype(jnp.int32)


def build_merge_grid(scene, verts: LightVertices, wl_lanes, radius,
                     spectral: bool, cell_cap: int = 16) -> MergeGrid:
  """Flatten + sort light vertices by cell hash (SoA payloads,
  vcm_shared.cxx:49-152 counting sort -> argsort + searchsorted).

  cell_cap > 0: overfull cells keep a random cell_cap-photon subset with
  throughput rescaled by occupancy/cap (unbiased; see
  VCMOptions.max_photons_per_cell). The random subsample = sorting each
  cell segment by a per-photon hash and keeping the first cap entries,
  which also leaves kept photons CONTIGUOUS at the segment start so the
  scan loop covers exactly min(occupancy, cap) slots.
  """
  r, v = verts.valid.shape
  n = r * v

  def flat(x):
    return x.reshape((n,) + x.shape[2:])

  pos = flat(verts.pos)
  # medium vertices are not mergeable (vcm_shared.hxx:416-421)
  valid = flat(verts.valid) & ~flat(verts.is_medium)
  cell_size = 2.0 * radius
  grid_min = scene.bsphere_center - scene.bsphere_radius - 2.0 * radius
  m = jnp.floor((pos - grid_min) / cell_size).astype(jnp.int32)
  cell = _cell_hash(m[:, 0], m[:, 1], m[:, 2])
  cell = jnp.where(valid, cell, jnp.int32(_HASH_MASK + 1))  # invalid sort last

  # sort by (cell, per-photon hash): random order within each cell segment
  h = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9)
  h = h ^ jax.lax.bitcast_convert_type(pos[:, 0].astype(jnp.float32), jnp.uint32)
  h = h * jnp.uint32(0x85EBCA6B)
  h = h ^ jax.lax.bitcast_convert_type(pos[:, 2].astype(jnp.float32), jnp.uint32)
  # uint32 composite key (x64 is disabled): cell (<= 2^16 incl. the
  # invalid sentinel) in the high bits, 15 hash bits below — max value
  # 65537*32768 < 2^32
  key = cell.astype(jnp.uint32) * jnp.uint32(32768) + (h >> 17)
  order = jnp.argsort(key)

  thr = flat(verts.throughput)
  if spectral:
    # grid stores throughput/sampling_pdf projected to RGB with the
    # luminance-basis scale (vcm_shared.hxx:873-877)
    wl_v = jnp.repeat(wl_lanes, v)
    thr_rgb = spx.to_film_rgb(thr, wl_v, True) * jnp.array([0.817660332, 1.05418909, 1.09945524])
  else:
    thr_rgb = thr

  nrm_f = flat(verts.nrm)
  w_i_f = flat(verts.w_i)
  d_vcm_f = flat(verts.d_vcm)
  d_vm_f = flat(verts.d_vm)
  packed_rows = jnp.concatenate([
      pos, nrm_f, w_i_f, d_vcm_f[:, None], d_vm_f[:, None], thr_rgb,
      valid.astype(jnp.float32)[:, None], jnp.zeros((n, 1))], axis=1)

  cell_s = cell[order]
  rows_s = packed_rows[order]
  valid_s = valid[order]
  if cell_cap and cell_cap > 0:
    seg_start = jnp.searchsorted(cell_s, cell_s, side="left")
    seg_end = jnp.searchsorted(cell_s, cell_s, side="right")
    rank = jnp.arange(n) - seg_start
    occ = (seg_end - seg_start).astype(jnp.float32)
    keep = rank < cell_cap
    scale = jnp.maximum(occ / cell_cap, 1.0)
    valid_s = valid_s & keep
    rows_s = rows_s.at[:, 11:14].multiply(scale[:, None])
    rows_s = rows_s.at[:, 14].set(valid_s.astype(jnp.float32))
    thr_scale = scale
  else:
    thr_scale = jnp.ones(n)

  return MergeGrid(
      sorted_cell=cell_s,
      pos=pos[order],
      nrm=nrm_f[order],
      w_i=w_i_f[order],
      d_vcm=d_vcm_f[order],
      d_vm=d_vm_f[order],
      path_length=flat(verts.path_length)[order],
      throughput_rgb=thr_rgb[order] * thr_scale[:, None],
      valid=valid_s,
      grid_min=grid_min, cell_size=jnp.asarray(cell_size),
      table_mask=_HASH_MASK,
      rows=rows_s,
      cell_cap=int(cell_cap or 0))


def _segment_range(grid: MergeGrid, cell):
  start = jnp.searchsorted(grid.sorted_cell, cell, side="left")
  end = jnp.searchsorted(grid.sorted_cell, cell, side="right")
  return start, end


# Max vertices examined per neighbor cell in the GLOSSY dispatcher pass (a
# static bound for fixed shapes). The Lambert pass instead runs a
# while_loop to the ACTUAL max cell occupancy, capped at _MERGE_SCAN_CAP —
# round-1's silent 32-photon clip is gone for the common path.
_MERGE_SCAN = 32
_MERGE_SCAN_CAP = 128

# camera-pass compaction cascade floor: films below this lane count run a
# single phase (tests at 16^2 keep exact single-phase behavior)
_CAMERA_CASCADE_MIN = 4096


def merge_gather(scene, grid: MergeGrid, sd: ShadingData, state: VCMState,
                 radius, vc_weight, options: VCMOptions, classes, spectral: bool,
                 variations: tuple = (0,), exit_mask=None, exit_weight=None,
                 participates=None):
  """Photon gather over the 8 neighbor cells (vcm_shared.hxx:886-924).

  Sorted-segment scan with a static per-cell bound; returns (R,3) RGB.
  exit_mask/exit_weight: lanes merging at a subsurface exit shade with the
  white-diffuse exit material scaled by the gather weight
  (vcm_camera_step :1067-1069 merging after SSS substitution).

  Two passes: (1) a K-batched ANALYTIC Lambert pass — on diffuse lanes
  the per-photon lobe quantities reduce to dot products (f/cos = albedo/pi,
  pdf = cos/pi), so 8*_MERGE_SCAN candidates run in 8*_MERGE_SCAN/K
  iterations of pure vector math; (2) a serial dispatcher pass for glossy
  (non-Lambert, non-delta) lanes, cond-skipped at runtime unless such a
  lane actually merges. participates: lanes that merge this step — when
  none do (the deep RR tail) both passes collapse to an any-reduce.
  """
  r = sd.w_i.shape[0]
  pos = state.ray_o  # query position = current camera vertex position
  m = (pos - grid.grid_min) / grid.cell_size
  mf = jnp.floor(m)
  md = m - mf
  ac = mf.astype(jnp.int32)
  bc = ac + jnp.where(md < 0.5, -1, 1)

  w_cam_base = state.d_vcm * vc_weight
  r2 = em.sqr(radius)

  # cells stacked to (8, R); segment ranges hoisted: ONE batched
  # searchsorted for all 8 neighbor cells
  cs = []
  for ci in range(8):
    ix = bc[:, 0] if ci & 1 else ac[:, 0]
    iy = bc[:, 1] if ci & 2 else ac[:, 1]
    iz = bc[:, 2] if ci & 4 else ac[:, 2]
    cs.append(_cell_hash(ix, iy, iz))
  cells = jnp.stack(cs, axis=0)  # (8, R)
  starts = jnp.searchsorted(grid.sorted_cell, cells, side="left")   # (8,R)
  ends = jnp.searchsorted(grid.sorted_cell, cells, side="right")    # (8,R)

  # lanes whose lobe needs the full dispatcher per photon (non-diffuse, or
  # diffuse variations beyond Lambert); Lambert lanes use the analytic path
  lambert_ok = tuple(variations) == (0,)
  is_lambert = (sd.mat.cls == MC.Diffuse) & lambert_ok
  if exit_mask is not None:
    # SSS exits shade white-diffuse — analytic too (weight applied below)
    is_lambert = is_lambert | exit_mask
  # textured scattering color for the analytic path, computed ONCE per lane
  # (diffuse_evaluate's _scattering, bsdf_various.hxx:36-72)
  from etx_tracer_tpu.render.bsdf import lobes as lobes_mod
  alb = lobes_mod._scattering(scene, sd, spectral)
  if exit_mask is not None:
    alb = jnp.where(exit_mask[..., None], exit_weight, alb)
  sd_hard = sd._replace(mat=sd.mat._replace(
      cls=jnp.where(is_lambert, -1, sd.mat.cls)))
  # entering-flipped shading normal: the diffuse lobe shades in the frame
  # oriented toward the incident side (lobes.normal_frame)
  n_eff = sd.nrm * jnp.where(em.dot(sd.w_i, sd.nrm) < 0.0, 1.0, -1.0)[..., None]
  rev_lambert = em.kInvPi * jnp.maximum(em.dot(-sd.w_i, n_eff), 0.0)

  def weighted_contrib(j, dist2, bsdf_pdf, rev_pdf, foc, kr_shape):
    """Shared MIS + kernel weighting given per-photon lobe quantities."""
    w_light = grid.d_vcm[j] * vc_weight + grid.d_vm[j] * bsdf_pdf
    w_camera = jnp.broadcast_to(w_cam_base, kr_shape) \
        + jnp.broadcast_to(state.d_vm, kr_shape) * rev_pdf
    weight = jnp.where(options.enable_mis, 1.0 / (1.0 + w_light + w_camera), 1.0)
    # Epanechnikov kernel (vcm_shared.hxx:863-868)
    kern = jnp.maximum(2.0 * (1.0 - dist2 / jnp.maximum(r2, 1e-20)), 0.0)
    fval = foc * jnp.broadcast_to(state.throughput, kr_shape + state.throughput.shape[-1:])
    if spectral:
      flat = fval.reshape(-1, fval.shape[-1])
      wlb = jnp.broadcast_to(state.wl, kr_shape).reshape(-1)
      c_rgb = spx.to_film_rgb(flat, wlb, True).reshape(kr_shape + (3,))
    else:
      c_rgb = fval
    return c_rgb * grid.throughput_rgb[j] * (kern * weight)[..., None]

  # ---- pass 1: analytic Lambert (the dominant merge receivers — photons
  # land on diffuse surfaces; per-photon cost is dot products). Each
  # while_loop iteration gathers ONE packed 16-float row per neighbor cell
  # per lane, and the loop runs only to the ACTUAL max cell occupancy ----
  occupancy = ends - starts                       # (8,R)
  scan_cap = grid.cell_cap if grid.cell_cap else _MERGE_SCAN_CAP
  kmax = jnp.minimum(jnp.max(occupancy), scan_cap)

  def lambert_body(carry):
    k, merged = carry
    j = jnp.minimum(starts + k, grid.pos.shape[0] - 1)   # (8,R)
    in_range = (starts + k) < ends
    rows = grid.rows[j]                                  # (8,R,16)
    vpos = rows[..., 0:3]
    vnrm = rows[..., 3:6]
    w_in = rows[..., 6:9]
    v_d_vcm = rows[..., 9]
    v_d_vm = rows[..., 10]
    v_thr = rows[..., 11:14]
    v_valid = rows[..., 14] > 0.5
    d = vpos - pos[None]
    dist2 = jnp.sum(d * d, axis=-1)
    ok = in_range & v_valid & (dist2 <= r2) & is_lambert[None]
    ok = ok & (jnp.sum(sd.nrm[None] * vnrm, axis=-1) > em.kEpsilon)
    # signed cos in the entering-oriented frame = the hemisphere gate the
    # full diffuse lobe applies (diffuse_evaluate valid = cos_o > eps)
    cos_sgn = jnp.sum(n_eff[None] * (-w_in), axis=-1)
    lam_valid = cos_sgn > em.kEpsilon
    foc = alb[None] * em.kInvPi * lam_valid[..., None]       # f/cos
    bsdf_pdf = jnp.where(lam_valid, cos_sgn * em.kInvPi, 0.0)
    rev_pdf = bsdf_pdf if options.fast_mis else \
        jnp.broadcast_to(rev_lambert[None], (8, r))

    w_light = v_d_vcm * vc_weight + v_d_vm * bsdf_pdf
    w_camera = w_cam_base[None] + state.d_vm[None] * rev_pdf
    weight = jnp.where(options.enable_mis, 1.0 / (1.0 + w_light + w_camera), 1.0)
    kern = jnp.maximum(2.0 * (1.0 - dist2 / jnp.maximum(r2, 1e-20)), 0.0)
    fval = foc * state.throughput[None]
    if spectral:
      c_rgb = spx.to_film_rgb(
          fval.reshape(8 * r, fval.shape[-1]),
          jnp.broadcast_to(state.wl[None], (8, r)).reshape(-1),
          True).reshape(8, r, 3)
    else:
      c_rgb = fval
    contrib = c_rgb * v_thr * (kern * weight)[..., None]
    ok = ok & (bsdf_pdf > 0.0)
    return k + 1, merged + jnp.sum(jnp.where(ok[..., None], contrib, 0.0), axis=0)

  # ---- pass 2: serial per-photon dispatch for glossy (non-Lambert,
  # non-delta) merge lanes; cond-skipped unless such a lane merges this
  # step (SDS caustics merge on the diffuse floor — this pass idles) ----
  glossy_classes = any(c not in (MC.Diffuse, MC.Mirror, MC.Void, MC.Boundary)
                       for c in classes)
  needs_glossy = glossy_classes or not lambert_ok

  def glossy_body(it, merged):
    ci = it // _MERGE_SCAN
    k = it % _MERGE_SCAN
    start = jax.lax.dynamic_index_in_dim(starts, ci, axis=0, keepdims=False)
    end = jax.lax.dynamic_index_in_dim(ends, ci, axis=0, keepdims=False)
    j = jnp.minimum(start + k, grid.pos.shape[0] - 1)
    in_range = (start + k) < end
    d = grid.pos[j] - pos
    dist2 = em.dot(d, d)
    ok = in_range & grid.valid[j] & (dist2 <= r2) & ~is_lambert
    ok = ok & (em.dot(sd.nrm, grid.nrm[j]) > em.kEpsilon)
    w_in = grid.w_i[j]
    bsdf_val, bsdf_pdf = bsdf_dispatch.evaluate(scene, sd_hard, -w_in,
                                                spectral, classes, variations)
    rev_pdf = bsdf_pdf if options.fast_mis else \
        bsdf_dispatch.reverse_pdf(scene, sd_hard, -w_in, spectral, classes)
    cos_o = jnp.abs(em.dot(sd.nrm, -w_in))
    foc = bsdf_val / jnp.maximum(cos_o, 1e-6)[..., None]
    contrib = weighted_contrib(j, dist2, bsdf_pdf, rev_pdf, foc, (r,))
    ok = ok & (bsdf_pdf > 0.0)
    return merged + jnp.where(ok[..., None], contrib, 0.0)

  part = participates if participates is not None else jnp.ones(r, bool)

  def run_lambert(merged):
    _, out = jax.lax.while_loop(
        lambda c: c[0] < kmax, lambert_body, (jnp.int32(0), merged))
    return out

  merged = jax.lax.cond(jnp.any(part & is_lambert), run_lambert,
                        lambda x: x, jnp.zeros((r, 3)))
  if needs_glossy:
    def run_glossy(m):
      return jax.lax.fori_loop(0, 8 * _MERGE_SCAN, glossy_body, m)
    merged = jax.lax.cond(jnp.any(part & ~is_lambert), run_glossy,
                          lambda m: m, merged)
  return merged


def camera_pass(scene, config, options: VCMOptions, iteration, verts: LightVertices,
                grid, radius, vc_weight, vm_weight, vm_normalization,
                pixel_offset=0, full_height: int | None = None,
                active_mask=None, return_rays: bool = False):
  """Camera subpaths with direct hit / NEE / vertex connections / merging
  (vcm_camera_step, vcm_shared.hxx:927-1079).

  pixel_offset/full_height: band rendering for the sharded path — pixel ids
  shift to GLOBAL film ids for RNG seeding, lane-aligned light-path pairing
  and camera UVs, so each shard reproduces the single-device lanes.

  active_mask: optional (npix,) bool — converged pixels start DEAD, so the
  compaction cascade drops them in the first pass (the film-level
  active-pixel skipping every reference CPU integrator gets from
  film.cxx:434-459). Skipped lanes return 0; the adaptive accumulator
  leaves their running means untouched.
  """
  spectral = config.spectral
  classes = config.material_classes
  w, h = config.film_width, config.film_height
  if full_height is None:
    full_height = h
  r = w * h
  c = spx.channels(spectral)

  idx = jnp.arange(r, dtype=jnp.uint32) + jnp.uint32(pixel_offset)
  rng_state = rng.seed(idx + jnp.uint32(0x9E3779B9), jnp.full(r, iteration, jnp.uint32))
  rng_state, wl_rnd = rng.next_float(rng_state)
  wl = spmod.sample_wavelength(wl_rnd) if spectral else jnp.zeros(r)
  # match the light path wavelength for lane-aligned connections: reuse the
  # light lane seeds (VCMLightPath.spect sharing, vcm_cpu.cxx:372-408)
  l_state = rng.seed(idx, jnp.full(r, iteration, jnp.uint32))
  l_state, l_wl_rnd = rng.next_float(l_state)
  wl = spmod.sample_wavelength(l_wl_rnd) if spectral else jnp.zeros(r)

  px = (idx % w).astype(jnp.int32)
  py = (idx // w).astype(jnp.int32)
  rng_state, jit_rnd = rng.next_2d(rng_state)
  # same pixel filter as PT (Film::sample applies the filter image for
  # every integrator, film.cxx:137-145)
  jitter = camera_mod.pixel_jitter(config.pixel_filter, jit_rnd, iteration)
  uv = camera_mod.film_uv(px, py, w, full_height, jitter)
  rng_state, lens_rnd = rng.next_2d(rng_state)
  rays = camera_mod.generate_ray(scene.camera, uv, lens_rnd, scene=scene,
                                 equirectangular=config.equirectangular)

  film_pdf = camera_mod.film_pdf_out(scene.camera, rays.o + rays.d)
  state = VCMState(
      ray_o=rays.o, ray_d=rays.d,
      throughput=jnp.ones((r, c)), gathered=jnp.zeros((r, c)),
      d_vcm=1.0 / jnp.maximum(film_pdf, 1e-20), d_vc=jnp.zeros(r), d_vm=jnp.zeros(r),
      eta=jnp.ones(r), medium=jnp.broadcast_to(scene.camera.medium_index, (r,)).astype(jnp.int32),
      path_depth=jnp.ones(r, jnp.int32), path_distance=jnp.zeros(r),
      rng_state=rng_state, wl=wl,
      alive=jnp.ones(r, bool) if active_mask is None else active_mask,
      delta_emitter=jnp.zeros(r, bool), local_emitter=jnp.zeros(r, bool),
      rays_traced=jnp.zeros((), jnp.float32))

  merged_total = jnp.zeros((r, 3))
  # the camera walk runs to the FULL path length budget — not capped by
  # vertex storage (ref default 1023, scene.hxx:41-46); the while_loop's
  # any-alive early exit makes deep budgets free once RR kills the tail
  max_depth = config.max_path_length

  base_scene = scene
  wl0 = wl

  def make_body(verts, r):
   # compaction-phase factory: `verts` and the lane count shadow the
   # outer full-width versions, so the same body text serves every
   # cascade width (compaction keeps lane-aligned connections: verts
   # rows travel with their camera lanes)
   def body(carry):
    step, state, merged_total = carry
    scene = base_scene
    if spectral:
      from etx_tracer_tpu.core import spectrum as sp_mod
      scene = scene._replace(spec_at_wl=(
          state.wl, sp_mod.bank_at_wl(scene.spec_values, state.wl)))
    t_max = jnp.where(state.alive, em.kMaxFloat, 0.0)
    hit = trace_ops.trace_closest(scene, state.ray_o, state.ray_d,
                                  jnp.full(r, em.kRayEpsilon), t_max)
    found = hit.found & state.alive
    rays_ct = state.rays_traced + jnp.sum(state.alive.astype(jnp.float32))
    rng_state = state.rng_state

    # medium free-path sampling (vcm_camera_step :933-996)
    medium_event = jnp.zeros(r, bool)
    if config.has_media:
      from etx_tracer_tpu.render import media as media_mod
      mv = media_mod.gather_medium(scene, state.medium, state.wl, spectral)
      seg_t = jnp.where(hit.found, hit.t, 2.0 * scene.bsphere_radius * 100.0)
      seg_t = jnp.where(state.alive & mv.valid, seg_t, 0.0)
      msample, rng_state = media_mod.sample_medium(
          scene, mv, state.wl, state.throughput, rng_state,
          state.ray_o, state.ray_d, jnp.maximum(seg_t, em.kRayEpsilon), spectral)
      in_medium = state.alive & mv.valid & (seg_t > 0.0)
      medium_event = in_medium & msample.sampled
      state = state._replace(
          throughput=jnp.where(in_medium[..., None],
                               state.throughput * msample.weight,
                               state.throughput))
      found = found & ~medium_event

    pos, nrm, tan, btn, uvt, bcc, tri, trows = pt._interpolate_hit(scene, hit, state.ray_d)
    mat = pt._gather_mat(scene, trows.mat)
    is_boundary = found & (mat.cls == MC.Boundary) if MC.Boundary in classes else jnp.zeros(r, bool)
    upd = found & ~is_boundary

    # miss -> environment (vcm_cam_handle_miss, :537-585)
    gathered = state.gathered
    if config.num_env_emitters > 0:
      env = emitters_mod.env_contribution(
          scene, state.ray_d, state.wl, state.path_depth <= 1,
          jnp.ones(r, bool), 1.0 / jnp.maximum(state.d_vcm, 1e-20),
          config.num_env_emitters, spectral)
      miss = state.alive & ~hit.found
      gathered = gathered + jnp.where(miss[..., None], state.throughput * env, 0.0)

    # vcm_update_camera_vcm (:589-595)
    cos_prev = jnp.maximum(jnp.abs(em.dot(nrm, -state.ray_d)), 1e-6)
    seg = state.path_distance + hit.t
    d_vcm = jnp.where(upd, state.d_vcm * em.sqr(seg) / cos_prev, state.d_vcm)
    d_vc = jnp.where(upd, state.d_vc / cos_prev, state.d_vc)
    d_vm = jnp.where(upd, state.d_vm / cos_prev, state.d_vm)
    path_distance = jnp.where(upd, 0.0, state.path_distance)
    if config.has_media:
      seg_m = state.path_distance + msample.t
      d_vcm = jnp.where(medium_event, state.d_vcm * em.sqr(seg_m), d_vcm)
      path_distance = jnp.where(medium_event, 0.0, path_distance)
    state = state._replace(d_vcm=d_vcm, d_vc=d_vc, d_vm=d_vm,
                           path_distance=path_distance)

    sd = ShadingData(w_i=state.ray_d, nrm=nrm, tan=tan, btn=btn,
                     geo_n=trows.geo_n, tex=uvt, wl=state.wl,
                     medium=state.medium, mat=mat)

    # --- direct emitter hit (vcm_handle_direct_hit + vcm_get_radiance) ---
    if options.direct_hit:
      emitter_idx = jnp.where(upd, trows.emitter, -1)
      e_value, e_pdf_area, e_pdf_dir, e_pdf_dir_out = emitters_mod.area_radiance(
          scene, emitter_idx, state.wl, state.ray_o, pos, uvt,
          state.path_depth == 1, spectral)
      e_disc = emitters_mod.discrete_pdf(scene, jnp.maximum(emitter_idx, 0))
      w_camera = state.d_vcm * e_pdf_area * e_disc + state.d_vc * e_pdf_dir_out * e_disc
      weight = jnp.where(options.enable_mis & (state.path_depth > 1),
                         1.0 / (1.0 + w_camera), 1.0)
      ok = upd & (e_pdf_dir > em.kEpsilon)
      gathered = gathered + jnp.where(ok[..., None],
                                      state.throughput * e_value * weight[..., None], 0.0)

    # --- BSDF sample (moved before connections: its lobe routes SSS, and
    # vcm_camera_step samples before connecting, vcm_shared.hxx:1024-1031) ---
    rng_state, rnd_bsdf = rng.next_n(rng_state, bsdf_dispatch.NUM_SAMPLE_RND)
    bs = bsdf_dispatch.sample(scene, sd, rnd_bsdf, spectral, classes,
                              config.diffuse_variations)

    # --- subsurface routing (vcm_camera_step :1033-1065): connections, NEE
    # and merging shade at the SSS exit with the white-diffuse exit material
    # scaled by the gather weight; continuation is a cosine lobe there ---
    sss_ok = jnp.zeros(r, bool)
    if config.has_subsurface:
      from etx_tracer_tpu.render import subsurface as sss_mod
      from etx_tracer_tpu.scene.types import SubsurfaceClass
      sss_path = (upd & (mat.subsurface_cls != SubsurfaceClass.Disabled)
                  & bs.is_reflection & bs.is_diffuse)
      sss_gather, rng_state = sss_mod.gather(
          scene, sd, trows.mat, pos, rng_state, sss_path, spectral,
          config.subsurface_classes)
      sss_ok = sss_path & sss_gather.found
      okn = sss_ok[..., None]
      pos = jnp.where(okn, sss_gather.pos, pos)
      nrm = jnp.where(okn, sss_gather.nrm, nrm)
      sd = sd._replace(
          w_i=jnp.where(okn, sss_gather.w_i, sd.w_i),
          nrm=jnp.where(okn, sss_gather.nrm, sd.nrm),
          tan=jnp.where(okn, sss_gather.tan, sd.tan),
          btn=jnp.where(okn, sss_gather.btn, sd.btn),
          geo_n=jnp.where(okn, sss_gather.geo_n, sd.geo_n),
          tex=jnp.where(okn, sss_gather.uv, sd.tex))
      rng_state, sss_rnd = rng.next_2d(rng_state)
      sss_dir = em.sample_cosine_distribution_n(sss_rnd, sss_gather.nrm, 1.0)
      sss_pdf = jnp.abs(em.dot(sss_dir, sss_gather.nrm)) * em.kInvPi
      bs = bs._replace(
          w_o=jnp.where(okn, sss_dir, bs.w_o),
          weight=jnp.where(okn, sss_gather.weight, bs.weight),
          pdf=jnp.where(sss_ok, sss_pdf, bs.pdf),
          eta=jnp.where(sss_ok, 1.0, bs.eta),
          is_delta=jnp.where(sss_ok, False, bs.is_delta))

    def _sss_override(val, pdf_f, rev, w_o):
      """Swap camera-side lobe results for the white-diffuse exit lobe."""
      if not config.has_subsurface:
        return val, pdf_f, rev
      white = em.kInvPi * jnp.maximum(em.dot(sd.nrm, w_o), 0.0)
      val = jnp.where(sss_ok[..., None], white[..., None] * sss_gather.weight, val)
      pdf_f = jnp.where(sss_ok, white, pdf_f)
      rev = jnp.where(sss_ok,
                      em.kInvPi * jnp.abs(em.dot(sd.w_i, sd.nrm)), rev)
      return val, pdf_f, rev

    # --- NEE (vcm_connect_to_light, :608-667) ---
    if options.connect_to_light:
      rng_state, rnd_sel = rng.next_float(rng_state)
      rng_state, rnd_em = rng.next_2d(rng_state)
      em_idx, _ = emitters_mod.sample_emitter_index(scene, rnd_sel)
      nee_pos = pos
      if config.has_media:
        nee_pos = jnp.where(medium_event[..., None], msample.pos, pos)
      esmp = emitters_mod.sample_emitter(scene, em_idx, rnd_em, nee_pos, state.wl, spectral,
                                         classes=config.emitter_classes)
      w_o = esmp.direction
      b_val, b_pdf = bsdf_dispatch.evaluate(scene, sd, w_o, spectral, classes, config.diffuse_variations)
      rev = b_pdf if options.fast_mis else \
          bsdf_dispatch.reverse_pdf(scene, sd, w_o, spectral, classes)
      b_val, b_pdf, rev = _sss_override(b_val, b_pdf, rev, w_o)
      if config.has_media:
        # camera_at_medium: phase function in place of the BSDF
        # (vcm_connect_to_light, :627-634)
        p_nee = media_mod.phase_hg(state.ray_d, w_o, mv.phase_g)
        b_val = jnp.where(medium_event[..., None], p_nee[..., None], b_val)
        b_pdf = jnp.where(medium_event, p_nee, b_pdf)
        rev = jnp.where(medium_event, p_nee, rev)
      sh_o = pt._shading_pos(sd.geo_n, pos, w_o)
      if config.has_media:
        sh_o = jnp.where(medium_event[..., None], msample.pos, sh_o)
      dist = em.length(esmp.origin - sh_o)
      if config.has_media:
        tr_nee, rng_state = pt._trace_transmittance(
            scene, config, rng_state, state.medium, sh_o, esmp.origin,
            state.wl, spectral)
        occluded = jnp.max(tr_nee, axis=-1) <= 0.0
      else:
        tr_nee = None
        occluded = trace_ops.trace_occluded(scene, sh_o, w_o,
                                            jnp.full(r, em.kRayEpsilon), dist * (1.0 - 1e-3))
      denom = esmp.pdf_dir * esmp.pdf_sample
      l_dot_e = jnp.maximum(jnp.abs(em.dot(esmp.direction, esmp.normal)), 1e-6)
      cam_factor = jnp.abs(em.dot(w_o, sd.geo_n))
      vmw_nee = jnp.full(r, vm_weight)
      if config.has_media:
        cam_factor = jnp.where(medium_event, 1.0, cam_factor)
        vmw_nee = jnp.where(medium_event, 0.0, vmw_nee)
      w_light = jnp.where(esmp.is_delta, 0.0, b_pdf / jnp.maximum(denom, 1e-20))
      w_cam = (esmp.pdf_dir_out * cam_factor) / jnp.maximum(esmp.pdf_dir * l_dot_e, 1e-20) \
          * (vmw_nee + state.d_vcm + state.d_vc * rev)
      weight = jnp.where(options.enable_mis, 1.0 / (1.0 + w_light + w_cam), 1.0)
      nee_lane = upd
      if config.has_media:
        nee_lane = upd | (medium_event & mv.explicit_connections)
      ok = (nee_lane & (denom > 0.0) & ~occluded & (b_pdf > 0.0)
            & (state.path_depth + 1 <= config.max_path_length))
      contrib = b_val * esmp.value * (weight / jnp.maximum(denom, 1e-20))[..., None]
      if config.has_media:
        contrib = contrib * tr_nee
      gathered = gathered + jnp.where(ok[..., None], state.throughput * contrib, 0.0)
      rays_ct = rays_ct + jnp.sum(nee_lane.astype(jnp.float32))

    # The connection/merge loops below evaluate the camera-vertex BSDF once
    # per stored vertex / per scanned photon. Lanes that cannot contribute
    # (no surface update, or a delta surface whose eval is zero by
    # definition) get a sentinel class so the dispatcher's per-class
    # lax.cond can skip entire expensive-lobe subgraphs when no
    # PARTICIPATING lane carries them — e.g. caustics merges happen on
    # diffuse floors while the only dielectric lanes sit on the (delta)
    # glass ring.
    participates = upd & ~bsdf_dispatch.is_delta(sd)
    sd_eval = sd._replace(mat=sd.mat._replace(
        cls=jnp.where(participates, sd.mat.cls, -1)))

    # --- lane-aligned vertex connections (vcm_connect_to_light_path) ---
    if options.connect_vertices:

      def connect_batched(carry_in):
        """All V connections in ONE batched eval + ONE occlusion (or
        transmittance) launch: the old per-slot fori serialized V trace
        launches with their fixed dispatch overheads — on the volumetric
        config the V sequential transmittance walks dominated the step.
        Flattening keeps slot-major order lane*V+v (reshape of (R,V,...)).

        Media (r5): per-(lane,slot) ratio-tracking transmittance runs as
        one (R*V)-wide walk with hash-DERIVED RNG streams
        (rng.seed(lane_state, slot)) instead of sequential per-lane draws —
        a documented sample-stream change (estimator unchanged: streams
        stay independent across slots and bounces because the lane state
        advances each bounce)."""
        gathered_in, rays_in = carry_in
        V = options.max_stored_vertices
        rV = r * V

        def fl(a):
          return a.reshape((rV,) + a.shape[2:])

        def rp(a):
          return jnp.repeat(a, V, axis=0)

        lv_pos = fl(verts.pos)
        lv_nrm = fl(verts.nrm)
        lv_geo = fl(verts.geo_n)
        lv_wi = fl(verts.w_i)
        lv_thr = fl(verts.throughput)
        lv_valid = fl(verts.valid)
        lv_mat = pt._gather_mat(scene, fl(verts.mat))
        target_len = rp(state.path_depth) + fl(verts.path_length) + 1
        # camera vertex position: the surface hit, or the sampled medium
        # point for camera-at-medium lanes (vcm_connect_to_light_vertex,
        # vcm_shared.hxx:673-678)
        cpos = pos
        if config.has_media:
          cpos = jnp.where(medium_event[..., None], msample.pos, pos)
        d = lv_pos - rp(cpos)
        dist2 = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12)
        w_o = d / jnp.sqrt(dist2)[..., None]

        wl_rep = rp(state.wl)
        scene_big = scene
        if spectral:
          cache = getattr(scene, "spec_at_wl", None)
          if cache is not None:
            scene_big = scene._replace(spec_at_wl=(wl_rep, rp(cache[1])))
        sd_big = jax.tree_util.tree_map(rp, sd_eval)._replace(wl=wl_rep)

        cb_val, cb_pdf = bsdf_dispatch.evaluate(
            scene_big, sd_big, w_o, spectral, classes, config.diffuse_variations)
        c_rev = cb_pdf if options.fast_mis else \
            bsdf_dispatch.reverse_pdf(scene_big, sd_big, w_o, spectral, classes)
        if config.has_subsurface:
          sss_ok_b = rp(sss_ok)
          white = em.kInvPi * jnp.maximum(
              jnp.sum(sd_big.nrm * w_o, axis=-1), 0.0)
          cb_val = jnp.where(sss_ok_b[..., None],
                             white[..., None] * rp(sss_gather.weight), cb_val)
          cb_pdf = jnp.where(sss_ok_b, white, cb_pdf)
          c_rev = jnp.where(
              sss_ok_b,
              em.kInvPi * jnp.abs(jnp.sum(sd_big.w_i * sd_big.nrm, axis=-1)),
              c_rev)
        if config.has_media:
          # camera_at_medium: phase function replaces the BSDF
          # (vcm_connect_to_light_vertex, vcm_shared.hxx:693-703)
          me_b = rp(medium_event)
          p_c = media_mod.phase_hg(rp(state.ray_d), w_o, rp(mv.phase_g))
          cb_val = jnp.where(me_b[..., None], p_c[..., None], cb_val)
          cb_pdf = jnp.where(me_b, p_c, cb_pdf)
          c_rev = jnp.where(me_b, p_c, c_rev)

        lsd = ShadingData(w_i=lv_wi, nrm=lv_nrm,
                          tan=fl(verts.tan), btn=fl(verts.btn),
                          geo_n=lv_geo, tex=fl(verts.uv), wl=wl_rep,
                          medium=rp(state.medium), mat=lv_mat)
        lb_val, lb_pdf = bsdf_dispatch.evaluate(
            scene_big, lsd, -w_o, spectral, classes, config.diffuse_variations)
        l_rev = lb_pdf if options.fast_mis else \
            bsdf_dispatch.reverse_pdf(scene_big, lsd, -w_o, spectral, classes)
        w_dot_l = -jnp.sum(lv_nrm * w_o, axis=-1)
        fix = bsdf_dispatch.fix_shading_normal(lv_geo, lv_nrm, lv_wi, -w_o)
        vmw_pair = jnp.full(rV, vm_weight)
        cam_factor = jnp.abs(jnp.sum(rp(nrm) * w_o, axis=-1))
        if config.has_media:
          # light vertex inside a medium: phase function on the light side
          # (vcm_connect_to_light_vertex, is_medium branch)
          lv_is_med = fl(verts.is_medium)
          lv_med = fl(verts.medium)
          lv_g = scene.mediums.phase_g[jnp.maximum(lv_med, 0)]
          p_l = media_mod.phase_hg(lv_wi, -w_o, lv_g)
          lb_val = jnp.where(lv_is_med[..., None], p_l[..., None], lb_val)
          lb_pdf = jnp.where(lv_is_med, p_l, lb_pdf)
          l_rev = jnp.where(lv_is_med, p_l, l_rev)
          w_dot_l = jnp.where(lv_is_med, 1.0, w_dot_l)
          fix = jnp.where(lv_is_med, 1.0, fix)
          vmw_pair = jnp.where(lv_is_med, 0.0, vmw_pair)
          # camera factor: |cos| at a camera surface, 1 at a medium event;
          # vmW_pair = 0 if either endpoint is in a medium (:742-755)
          cam_factor = jnp.where(me_b, 1.0, cam_factor)
          vmw_pair = jnp.where(me_b, 0.0, vmw_pair)
        cam_area_pdf = cb_pdf * jnp.abs(w_dot_l) / dist2
        light_area_pdf = lb_pdf * cam_factor / dist2
        w_light = cam_area_pdf * (vmw_pair + fl(verts.d_vcm)
                                  + fl(verts.d_vc) * l_rev)
        w_camera = light_area_pdf * (vmw_pair + rp(state.d_vcm)
                                     + rp(state.d_vc) * c_rev)
        weight = jnp.where(options.enable_mis,
                           1.0 / (1.0 + w_light + w_camera), 1.0)
        sh_o = pt._shading_pos(rp(sd.geo_n), rp(pos), w_o)
        conn_lane = rp(upd)
        if config.has_media:
          sh_o = jnp.where(me_b[..., None], rp(msample.pos), sh_o)
          # explicit connections from a medium event are gated per medium
          # (vcm_camera_step :961)
          conn_lane = conn_lane | (me_b & rp(mv.explicit_connections))
        seg_len = em.length(lv_pos - sh_o)
        if config.has_media:
          slot_ids = jnp.tile(jnp.arange(V, dtype=jnp.uint32), r)
          rng_rv = rng.seed(rp(state.rng_state), slot_ids)
          tr_vc, _ = pt._trace_transmittance(
              scene, config, rng_rv, rp(state.medium), sh_o, lv_pos,
              wl_rep, spectral)
          occ = jnp.max(tr_vc, axis=-1) <= 0.0
        else:
          tr_vc = None
          occ = trace_ops.trace_occluded(scene, sh_o, w_o,
                                         jnp.full(rV, em.kRayEpsilon),
                                         seg_len * (1.0 - 1e-3))
        ok = (conn_lane & lv_valid & ~occ & (cb_pdf > 0.0) & (lb_pdf > 0.0)
              & (target_len + 1 <= config.max_path_length))
        contrib = (cb_val * rp(state.throughput)) * (lb_val * lv_thr) \
            * (weight * fix / dist2)[..., None]
        if config.has_media:
          contrib = contrib * tr_vc
        contrib = jnp.where(ok[..., None], contrib, 0.0)
        rays_in = rays_in + jnp.sum((conn_lane & lv_valid).astype(jnp.float32))
        return (gathered_in + contrib.reshape(r, V, -1).sum(axis=1), rays_in)

      # deep-tail skip: the batched connections draw no LANE rng (media
      # transmittance uses hash-derived streams), so the cond is
      # stream-neutral; once no lane can connect the whole (R*V) eval +
      # trace collapse to one any-reduce
      conn_any = participates
      if config.has_media:
        conn_any = participates | (medium_event & mv.explicit_connections)
      gathered, rays_ct = jax.lax.cond(
          jnp.any(conn_any), connect_batched, lambda g: g,
          (gathered, rays_ct))

    # --- merging (photon gather; at the SSS exit when substituted) ---
    if options.enable_merging:
      mstate = state._replace(ray_o=pos)
      merged = merge_gather(scene, grid, sd_eval, mstate, radius, vc_weight,
                            options, classes, spectral,
                            config.diffuse_variations,
                            exit_mask=sss_ok if config.has_subsurface else None,
                            exit_weight=sss_gather.weight if config.has_subsurface else None,
                            participates=participates)
      merged_total = merged_total + jnp.where(upd[..., None], merged, 0.0)

    # --- medium phase continuation (vcm_camera_step :954-996) ---
    if config.has_media:
      rng_state, m_rnd_phase = rng.next_2d(rng_state)
      phase_dir = media_mod.sample_phase_hg(state.ray_d, mv.phase_g, m_rnd_phase)
      phase_pdf = media_mod.phase_hg(state.ray_d, phase_dir, mv.phase_g)
      inv_p = 1.0 / jnp.maximum(phase_pdf, 1e-20)
      md_vc = inv_p * (state.d_vc * phase_pdf + state.d_vcm)
      md_vm = inv_p * (state.d_vm * phase_pdf)
      md_vcm = inv_p
      rng_state, m_rr = rng.next_float(rng_state)
      m_thr = state.throughput
      m_cont, m_thr = pt._random_continue(state.path_depth + 1, config.rr_start,
                                          state.eta, m_rr, m_thr)
      med_alive = medium_event & m_cont \
          & (state.path_depth + 2 <= config.max_path_length)
      me = medium_event
      state = state._replace(
          ray_o=jnp.where(me[..., None], msample.pos, state.ray_o),
          ray_d=jnp.where(me[..., None], phase_dir, state.ray_d),
          throughput=jnp.where(me[..., None], m_thr, state.throughput),
          d_vcm=jnp.where(me, md_vcm, state.d_vcm),
          d_vc=jnp.where(me, md_vc, state.d_vc),
          d_vm=jnp.where(me, md_vm, state.d_vm),
          path_depth=jnp.where(me, state.path_depth + 1, state.path_depth))
    else:
      me = jnp.zeros(r, bool)

    # --- continue: recurrences on the (possibly SSS-substituted) sample ---
    new_thr = state.throughput * bs.weight
    rng_state, rr_rnd = rng.next_float(rng_state)
    new_depth = state.path_depth + 1
    cont, new_thr = pt._random_continue(new_depth, config.rr_start,
                                        state.eta * bs.eta, rr_rnd, new_thr)
    cos_bsdf = jnp.abs(em.dot(nrm, bs.w_o))
    rev2 = bs.pdf if options.fast_mis else \
        bsdf_dispatch.reverse_pdf(scene, sd, bs.w_o, spectral, classes)
    if config.has_subsurface:
      # vcm_next_ray subsurface branch: rev pdf of the exit cosine lobe
      # (vcm_shared.hxx:260-262)
      rev2 = jnp.where(sss_ok, em.kInvPi * jnp.abs(em.dot(sd.w_i, nrm)), rev2)
    nd_vc = jnp.where(bs.is_delta, state.d_vc * cos_bsdf,
                      (cos_bsdf / jnp.maximum(bs.pdf, 1e-20))
                      * (state.d_vc * rev2 + state.d_vcm + vm_weight))
    nd_vm = jnp.where(bs.is_delta, state.d_vm * cos_bsdf,
                      (cos_bsdf / jnp.maximum(bs.pdf, 1e-20))
                      * (state.d_vm * rev2 + state.d_vcm * vc_weight + 1.0))
    nd_vcm = jnp.where(bs.is_delta, 0.0, 1.0 / jnp.maximum(bs.pdf, 1e-20))
    new_o = pt._shading_pos(sd.geo_n, pos, bs.w_o)

    ent = em.dot(nrm, state.ray_d) < 0.0
    b_medium = jnp.where(ent, mat.int_medium, mat.ext_medium)
    b_o = pt._shading_pos(sd.geo_n, pos, state.ray_d)

    surf_alive = upd & cont & (bs.pdf > 0.0) & (new_depth <= config.max_path_length) \
        & (jnp.max(new_thr, axis=-1) > 0.0)
    if config.has_subsurface:
      # lanes that chose the SSS path but failed the gather die after their
      # surface connections (vcm_camera_step :1071-1073)
      surf_alive = surf_alive & ~(sss_path & ~sss_gather.found)

    state = state._replace(
        ray_o=jnp.where(me[..., None], state.ray_o,
                        jnp.where(is_boundary[..., None], b_o,
                                  jnp.where(upd[..., None], new_o, state.ray_o))),
        ray_d=jnp.where(upd[..., None], bs.w_o, state.ray_d),
        throughput=jnp.where(upd[..., None], new_thr, state.throughput),
        gathered=gathered,
        d_vcm=jnp.where(upd, nd_vcm, state.d_vcm),
        d_vc=jnp.where(upd, nd_vc, state.d_vc),
        d_vm=jnp.where(upd, nd_vm, state.d_vm),
        eta=jnp.where(upd, state.eta * bs.eta, state.eta),
        medium=jnp.where(is_boundary, b_medium, jnp.where(upd, bs.medium, state.medium)),
        path_depth=jnp.where(upd, new_depth, state.path_depth),
        path_distance=jnp.where(is_boundary, state.path_distance + hit.t, state.path_distance),
        rng_state=rng_state,
        alive=jnp.where(me, (med_alive if config.has_media else state.alive),
                        jnp.where(is_boundary, state.alive, surf_alive)),
        rays_traced=rays_ct)
    if config.validate:
      from etx_tracer_tpu.utils import validate as val
      amask = state.alive[..., None]
      val.check_finite("vcm:camera_pass",
                       gathered=state.gathered, merged=merged_total,
                       throughput=jnp.where(amask, state.throughput, 0.0))
    return step + 1, state, merged_total
   return body

  # COMPACTION CASCADE (render_samples_static's pattern): alive lanes decay
  # geometrically through the RR tail, but traces and evals cost O(width)
  # regardless — when the survivor count drops below the next width the
  # pool compacts 4x, banking each lane's accumulators by original index.
  widths = [r]
  while widths[-1] // 4 >= _CAMERA_CASCADE_MIN and len(widths) < 4:
    widths.append(widths[-1] // 4)

  orig = jnp.arange(r)
  out_gathered = jnp.zeros((r, c))
  out_merged = jnp.zeros((r, 3))
  verts_p = verts
  step = jnp.int32(0)
  for li, width in enumerate(widths):
    last = li == len(widths) - 1
    body = make_body(verts_p, width)
    if last:
      def cond(carry):
        return (carry[0] < max_depth) & jnp.any(carry[1].alive)
    else:
      thr_w = widths[li + 1]
      def cond(carry, _t=thr_w):
        return (carry[0] < max_depth) & \
            (jnp.sum(carry[1].alive.astype(jnp.int32)) > _t)
    step, state, merged_total = jax.lax.while_loop(
        cond, body, (step, state, merged_total))
    out_gathered = out_gathered.at[orig].add(state.gathered)
    out_merged = out_merged.at[orig].add(merged_total)
    if last:
      break
    nw = widths[li + 1]
    order = jnp.argsort(~state.alive)  # alive lanes first (stable)
    sel = order[:nw]

    def take(x):
      return x[sel] if getattr(x, "ndim", 0) else x

    state = jax.tree_util.tree_map(take, state)._replace(
        gathered=jnp.zeros((nw, c)))
    merged_total = jnp.zeros((nw, 3))
    verts_p = jax.tree_util.tree_map(lambda a: a[sel], verts_p)
    orig = orig[sel]

  gathered_rgb = spx.to_film_rgb(out_gathered, wl0, spectral)
  result = gathered_rgb + out_merged * vm_normalization
  if return_rays:
    return result, state.rays_traced
  return result


def radius_schedule(scene, config, options: VCMOptions, iteration):
  """Merge-radius schedule + derived MIS weights (vcm_cpu.cxx:95-113).

  Computed EAGERLY (outside any jit) so the single-device and sharded
  paths share bitwise-identical values — under jit, XLA's fusion can
  round 1/eta differently, and with per-cell photon subsampling a 1-ulp
  radius difference flips cell assignments and the sampled subsets.
  Returns (radius, vc_weight, vm_weight, vm_normalization) f32 scalars.
  """
  w, h = config.film_width, config.film_height
  npix = w * h
  if options.initial_radius > 0.0:
    radius0 = jnp.asarray(options.initial_radius)
  else:
    radius0 = 5.0 * scene.bsphere_radius / float(max(w, h))
  it = jnp.asarray(iteration, jnp.int32)
  radius = radius0 / (1.0 + it.astype(jnp.float32) / options.radius_decay)
  eta_vcm = em.kPi * em.sqr(radius) * npix
  vc_weight = 1.0 / eta_vcm
  vm_weight = eta_vcm if options.enable_merging else jnp.zeros(())
  vm_normalization = 1.0 / eta_vcm
  return radius, vc_weight, vm_weight, vm_normalization


def render_iteration(scene, config, options: VCMOptions, film_state, iteration):
  """One full VCM iteration: light pass -> grid -> camera pass -> film."""
  sched = radius_schedule(scene, config, options, iteration)
  return _render_iteration_jit(scene, config, options, film_state,
                               jnp.asarray(iteration, jnp.int32), sched)


def _render_iteration_body(scene, config, options: VCMOptions, film_state,
                           iteration, sched, with_rays: bool = False):
  w, h = config.film_width, config.film_height
  npix = w * h
  radius, vc_weight, vm_weight, vm_normalization = sched

  verts, splat_img, l_state = light_pass(
      scene, config, options, iteration, npix, vc_weight, vm_weight)

  grid = build_merge_grid(scene, verts, l_state.wl, radius, config.spectral,
                          cell_cap=options.max_photons_per_cell) \
      if options.enable_merging else None

  camera_out = camera_pass(scene, config, options, iteration, verts, grid,
                           radius, vc_weight, vm_weight, vm_normalization,
                           return_rays=with_rays)
  if with_rays:
    camera_rgb, cam_rays = camera_out
  else:
    camera_rgb = camera_out

  # fold this iteration's light-tracing splat image
  film_state = film_state._replace(
      light_iteration=film_state.light_iteration + splat_img)
  film_state = film_mod.commit_light_iteration(film_state)
  colors = camera_rgb.reshape(h, w, 3)
  zero = jnp.zeros((h, w, 3))
  film_state = film_mod.accumulate_camera(film_state, colors, zero, zero)
  if with_rays:
    return film_state, l_state.rays_traced + cam_rays
  return film_state


@functools.partial(jax.jit, static_argnames=("config", "options"))
def _render_iteration_jit(scene, config, options: VCMOptions, film_state,
                          iteration, sched):
  return _render_iteration_body(scene, config, options, film_state,
                                iteration, sched)


@functools.partial(jax.jit, static_argnames=("config", "options"))
def _render_iteration_stats_jit(scene, config, options: VCMOptions,
                                film_state, iteration, sched):
  return _render_iteration_body(scene, config, options, film_state,
                                iteration, sched, with_rays=True)


def render_iteration_stats(scene, config, options: VCMOptions, film_state,
                           iteration):
  """render_iteration + rays traced this iteration (Mrays/s metrics).

  One jitted dispatch per iteration — preferred over render_chunk_stats
  for MERGING configs at large films, where XLA compiles the fori_loop
  body ~16x slower at runtime (measured on the 256^2 caustics config:
  2.0 s/iter eager vs 33 s/iter chunked; the 64^2 gate and the no-merge
  volumetric chunk are unaffected)."""
  sched = radius_schedule(scene, config, options, iteration)
  return _render_iteration_stats_jit(scene, config, options, film_state,
                                     jnp.asarray(iteration, jnp.int32), sched)


@functools.partial(jax.jit,
                   static_argnames=("config", "options", "num_iterations"))
def render_chunk(scene, config, options: VCMOptions, film_state,
                 first_iteration, num_iterations: int):
  """`num_iterations` full VCM iterations fused into ONE device execution.

  A lax.fori_loop over the per-iteration body: one compile + one dispatch
  per chunk instead of one of each per iteration, which is what makes
  high-spp correctness gates (bench.py) affordable. The radius schedule is
  computed traced here (same jnp ops as the eager radius_schedule, so the
  values match up to fusion rounding); use render_iteration when bitwise
  parity with the sharded path matters.
  """
  def body(k, fs):
    it = first_iteration + k
    sched = radius_schedule(scene, config, options, it)
    return _render_iteration_body(scene, config, options, fs, it, sched)
  return jax.lax.fori_loop(0, num_iterations, body, film_state)


@functools.partial(jax.jit,
                   static_argnames=("config", "options", "num_iterations"))
def render_chunk_stats(scene, config, options: VCMOptions, film_state,
                       first_iteration, num_iterations: int):
  """render_chunk + total rays traced (closest + occlusion launches across
  light and camera passes) — the Mrays/s denominator for VCM/BDPT
  benchmarks. Returns (film_state, rays_traced)."""
  def body(k, carry):
    fs, rays = carry
    it = first_iteration + k
    sched = radius_schedule(scene, config, options, it)
    fs, r_it = _render_iteration_body(scene, config, options, fs, it, sched,
                                      with_rays=True)
    return fs, rays + r_it
  return jax.lax.fori_loop(0, num_iterations, body,
                           (film_state, jnp.zeros((), jnp.float32)))


def render(scene, config, options: VCMOptions | None = None, iterations: int | None = None):
  options = options or VCMOptions()
  n = config.samples if iterations is None else iterations
  fs = film_mod.allocate(config.film_width, config.film_height)
  for i in range(n):
    fs = render_iteration(scene, config, options, fs, i)
  return fs


@functools.partial(jax.jit, static_argnames=("config", "options"))
def _render_iteration_adaptive_jit(scene, config, options: VCMOptions,
                                   film_state, counts, iteration, sched,
                                   active):
  """One VCM iteration with film-level active-pixel skipping
  (film.cxx:434-459 applied to the camera pass; the light pass is
  pixel-agnostic and always runs in full, exactly like the reference's
  light gather which iterates path indices, vcm_cpu.cxx:126)."""
  w, h = config.film_width, config.film_height
  npix = w * h
  radius, vc_weight, vm_weight, vm_normalization = sched

  verts, splat_img, l_state = light_pass(
      scene, config, options, iteration, npix, vc_weight, vm_weight)

  grid = build_merge_grid(scene, verts, l_state.wl, radius, config.spectral,
                          cell_cap=options.max_photons_per_cell) \
      if options.enable_merging else None

  camera_rgb = camera_pass(scene, config, options, iteration, verts, grid,
                           radius, vc_weight, vm_weight, vm_normalization,
                           active_mask=active.reshape(-1))

  film_state = film_state._replace(
      light_iteration=film_state.light_iteration + splat_img)
  film_state = film_mod.commit_light_iteration(film_state)
  colors = camera_rgb.reshape(h, w, 3)
  return film_mod.accumulate_camera_masked(film_state, colors, counts, active)


def render_adaptive(scene, config, options: VCMOptions | None = None,
                    max_iterations: int | None = None, min_samples: int = 32):
  """Progressive VCM/BDPT render with adaptive camera-pass termination.

  Mirrors the reference film's adaptive sampling, which every CPU
  integrator inherits (film.cxx:233-330,434-459): after `min_samples`
  full iterations, pixels whose full/half-buffer relative deviation falls
  below config.noise_threshold stop spawning camera subpaths; the
  unconverged set is dilated to 5-px blocks. Light-pass splats continue to
  land everywhere (so the light layer stays unbiased), and the run
  auto-stops when no pixel remains active.
  """
  options = options or VCMOptions()
  n = config.samples if max_iterations is None else max_iterations
  w, h = config.film_width, config.film_height
  fs = film_mod.allocate(w, h)
  warm = min(min_samples, n)
  for i in range(warm):
    fs = render_iteration(scene, config, options, fs, i)
  counts = jnp.full((h, w), float(warm), jnp.float32)
  for i in range(warm, n):
    noise = film_mod.noise_estimate(fs)
    active = film_mod.dilate_mask(noise > config.noise_threshold)
    if not bool(jnp.any(active)):
      break
    sched = radius_schedule(scene, config, options, i)
    fs, counts = _render_iteration_adaptive_jit(
        scene, config, options, fs, counts, jnp.asarray(i, jnp.int32),
        sched, active)
  return fs, counts
