"""VCM / BDPT / light-tracing integrator tests (cross-integrator agreement —
the reference's own quality strategy, SURVEY.md §4)."""

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np
import pytest

from etx_tracer_tpu.models import path_tracing, vcm
from etx_tracer_tpu.render import film as film_mod
from etx_tracer_tpu.scene import cornell


@functools.lru_cache(maxsize=2)
def _scene():
  return cornell.build_cornell_box(film_size=(16, 16), diffuse_only=True,
                                   max_path_length=4).build()


@functools.lru_cache(maxsize=2)
def _pt_image():
  scene, config = _scene()
  fs = path_tracing.render(scene, config, iterations=64)
  return np.asarray(film_mod.result_image(fs))


class TestLightTracing:
  def test_matches_pt_on_non_emitter_pixels(self):
    scene, config = _scene()
    opts = dataclasses.replace(vcm.light_tracing_options(), max_stored_vertices=3)
    fs = vcm.render(scene, config, opts, iterations=32)
    lt = np.asarray(film_mod.result_image(fs))
    ptimg = _pt_image()
    assert np.isfinite(lt).all()
    mask = ptimg.max(-1) < 1.0
    ratio = lt[mask].mean() / ptimg[mask].mean()
    assert 0.8 < ratio < 1.15

  def test_splats_land_in_light_layer(self):
    scene, config = _scene()
    opts = dataclasses.replace(vcm.light_tracing_options(), max_stored_vertices=3)
    fs = vcm.render(scene, config, opts, iterations=2)
    assert float(np.asarray(fs.light).sum()) > 0.0
    assert float(np.asarray(fs.camera).sum()) == 0.0  # LT-only: no camera strategies


class TestBDPT:
  def test_matches_pt(self):
    scene, config = _scene()
    opts = dataclasses.replace(vcm.bdpt_options(), max_stored_vertices=3)
    fs = vcm.render(scene, config, opts, iterations=24)
    bd = np.asarray(film_mod.result_image(fs))
    ptimg = _pt_image()
    assert np.isfinite(bd).all()
    ratio = bd.mean() / ptimg.mean()
    assert 0.85 < ratio < 1.12
    mask = ptimg.max(-1) < 1.0
    ratio_ne = bd[mask].mean() / ptimg[mask].mean()
    assert 0.85 < ratio_ne < 1.15


class TestVCM:
  def test_full_vcm_matches_pt(self):
    scene, config = _scene()
    opts = dataclasses.replace(vcm.VCMOptions(), max_stored_vertices=3,
                               initial_radius=0.08)
    fs = vcm.render(scene, config, opts, iterations=16)
    v = np.asarray(film_mod.result_image(fs))
    ptimg = _pt_image()
    assert np.isfinite(v).all()
    ratio = v.mean() / ptimg.mean()
    assert 0.8 < ratio < 1.2

  def test_merge_grid_segments(self):
    scene, config = _scene()
    opts = dataclasses.replace(vcm.VCMOptions(), max_stored_vertices=3)
    verts, _, lst = vcm.light_pass(scene, config, opts, 0, 256, 1.0, 1.0)

    # uncapped grid keeps every stored vertex
    grid = vcm.build_merge_grid(scene, verts, lst.wl, 0.1, False, cell_cap=0)
    cell = np.asarray(grid.sorted_cell)
    assert (np.diff(cell) >= 0).all()  # sorted
    valid = np.asarray(grid.valid)
    n_valid = int(np.asarray(verts.valid).sum())
    assert int(valid.sum()) == n_valid
    total_energy = float(np.asarray(grid.throughput_rgb)[valid].sum())

    # capped grid: per-cell valid occupancy <= cap, kept photons contiguous
    # at the segment start, ENERGY CONSERVED in expectation via the
    # occupancy/cap rescale (exact per cell: kept*scale sums to occupancy
    # times the kept mean)
    cap = 4
    gc = vcm.build_merge_grid(scene, verts, lst.wl, 0.1, False, cell_cap=cap)
    cellc = np.asarray(gc.sorted_cell)
    validc = np.asarray(gc.valid)
    for c in np.unique(cellc[validc]):
      seg = validc[cellc == c]
      assert seg.sum() <= cap
      assert seg[: seg.sum()].all()  # kept photons lead the segment
    # rescaled energy stays within MC tolerance of the uncapped total
    energy_c = float(np.asarray(gc.throughput_rgb)[validc].sum())
    assert 0.5 * total_energy < energy_c < 2.0 * total_energy

  def test_spectral_vcm_matches_spectral_pt(self):
    """Spectral-mode cross-integrator agreement: exercises the per-step
    SPD-table cache (spec_at_wl) in both PT and the VCM passes."""
    scene, config = cornell.build_cornell_box(
        film_size=(16, 16), diffuse_only=True, max_path_length=4,
        spectral=True).build()
    fs_pt = path_tracing.render(scene, config, iterations=48)
    pt_img = np.asarray(film_mod.result_image(fs_pt))
    opts = dataclasses.replace(vcm.VCMOptions(), max_stored_vertices=3,
                               initial_radius=0.08)
    fs = vcm.render(scene, config, opts, iterations=16)
    v = np.asarray(film_mod.result_image(fs))
    assert np.isfinite(v).all() and np.isfinite(pt_img).all()
    ratio = v.mean() / pt_img.mean()
    assert 0.8 < ratio < 1.2

  def test_radius_schedule(self):
    # r_i = r0 / (1 + i/decay) (vcm_cpu.cxx:100-113)
    r0 = 5.0 * 2.0 / 640.0
    r128 = r0 / (1.0 + 128 / 256)
    assert r128 == pytest.approx(r0 / 1.5)


class TestVCMMedia:
  """VCM/BDPT with participating media: medium vertices, phase MIS
  recurrences, transmittance-aware connections (vcm_shared.hxx:379-460).

  Known residual: camera-at-medium vertex connections are not implemented,
  leaving ~10-20%% fog-scene bias for BDPT/VCM at low spp; LT < 1 because
  light tracing cannot render directly-visible emitters."""

  def _scene(self):
    from etx_tracer_tpu.scene import cornell
    b = cornell.build_cornell_box(film_size=(16, 16), diffuse_only=True,
                                  max_path_length=5, fog_scattering=0.25)
    return b.build()

  @pytest.mark.slow
  def test_fog_cross_integrator_agreement(self):
    from etx_tracer_tpu.models import path_tracing, vcm
    from etx_tracer_tpu.render import film as film_mod
    scene, config = self._scene()
    fs_pt = path_tracing.render(scene, config, iterations=8)
    ptm = float(np.asarray(film_mod.result_image(fs_pt)).mean())
    assert ptm > 0

    fs_lt = vcm.render(scene, config, iterations=8,
                       options=vcm.light_tracing_options())
    lt = float(np.asarray(film_mod.result_image(fs_lt)).mean()) / ptm
    assert 0.6 < lt < 1.1, lt

    fs_b = vcm.render(scene, config, iterations=8, options=vcm.bdpt_options())
    bd = float(np.asarray(film_mod.result_image(fs_b)).mean()) / ptm
    assert 0.85 < bd < 1.3, bd

    fs_v = vcm.render(scene, config, iterations=8)
    vc = float(np.asarray(film_mod.result_image(fs_v)).mean()) / ptm
    assert 0.85 < vc < 1.4, vc

  def test_emission_medium_index(self):
    from etx_tracer_tpu.render import emitters as em_mod
    from etx_tracer_tpu.core import rng
    scene, config = self._scene()
    r = 64
    st = rng.seed(jnp.arange(r, dtype=jnp.uint32), jnp.zeros(r, jnp.uint32))
    st, sel = rng.next_float(st)
    st, p2 = rng.next_2d(st)
    st, d2 = rng.next_2d(st)
    es = em_mod.sample_emission(scene, sel, p2, d2, jnp.zeros(r), False)
    # light sits inside the fog: emission starts in the fog medium
    assert int(np.asarray(es.medium_index).max()) >= 0


class TestVCMSubsurface:
  """VCM camera-pass SSS routing (vcm_camera_step, vcm_shared.hxx:1033-1073):
  connections/NEE/merge shade at the gather exit with the white-diffuse exit
  material x gather weight; continuation is a cosine lobe at the exit."""

  def _scene(self, cls):
    import dataclasses as dc
    from etx_tracer_tpu.core import spectrum as sp
    from etx_tracer_tpu.scene import types as st
    b = cornell.build_cornell_box(film_size=(16, 16), diffuse_only=True,
                                  max_path_length=5)
    gi = b.material_names["gray"]
    dist = b.add_spectrum(sp.SpectralDistribution.rgb_reflectance([0.3, 0.1, 0.05]))
    b.materials[gi] = dc.replace(b.materials[gi], subsurface_cls=cls,
                                 subsurface_spec=dist)
    return b.build()

  @pytest.mark.slow
  def test_vcm_sss_cross_integrator_agreement(self):
    from etx_tracer_tpu.scene import types as st
    scene, config = self._scene(st.SubsurfaceClass.RandomWalk)
    assert config.has_subsurface
    fs_pt = path_tracing.render(scene, config, iterations=8)
    ptm = float(np.asarray(film_mod.result_image(fs_pt)).mean())
    assert ptm > 0

    fs_b = vcm.render(scene, config, iterations=8, options=vcm.bdpt_options())
    img_b = np.asarray(film_mod.result_image(fs_b))
    assert np.isfinite(img_b).all()
    bd = float(img_b.mean()) / ptm
    assert 0.8 < bd < 1.3, bd

    fs_v = vcm.render(scene, config, iterations=8)
    img_v = np.asarray(film_mod.result_image(fs_v))
    assert np.isfinite(img_v).all()
    vc = float(img_v.mean()) / ptm
    assert 0.8 < vc < 1.4, vc


class TestDepthCapLifted:
  """Round-2: path depth is decoupled from vertex storage (VERDICT item 3;
  ref bidirectional.cxx:273-317 runs both passes to max_path_length)."""

  def test_light_splats_independent_of_vertex_storage(self):
    """Connect-to-camera splats happen at EVERY bounce, so shrinking the
    stored-vertex capacity must not change the light-tracing image."""
    import dataclasses
    from etx_tracer_tpu.scene import cornell
    scene, config = cornell.build_cornell_box(
        film_size=(16, 16), diffuse_only=True, max_path_length=16).build()
    imgs = []
    for vs in (2, 8):
      opts = dataclasses.replace(vcm.light_tracing_options(),
                                 max_stored_vertices=vs)
      fs = film_mod.allocate(16, 16)
      fs = vcm.render_iteration(scene, config, opts, fs, 0)
      imgs.append(np.asarray(fs.light))
    assert imgs[0].sum() > 0
    np.testing.assert_allclose(imgs[0], imgs[1], rtol=1e-6)

  @pytest.mark.slow
  def test_camera_walk_independent_of_vertex_storage(self):
    """Direct-hit-only VCM (pure BSDF walk) must reach max_path_length
    regardless of max_stored_vertices (the old cap was v_slots + 2)."""
    import dataclasses
    from etx_tracer_tpu.scene import cornell
    scene, config = cornell.build_cornell_box(
        film_size=(16, 16), diffuse_only=False, max_path_length=24).build()
    imgs = []
    for vs in (2, 8):
      opts = dataclasses.replace(
          vcm.VCMOptions(), max_stored_vertices=vs,
          connect_to_light=False, connect_to_camera=False,
          connect_vertices=False, enable_merging=False)
      fs = film_mod.allocate(16, 16)
      fs = vcm.render_iteration(scene, config, opts, fs, 0)
      imgs.append(np.asarray(fs.camera))
    assert imgs[0].sum() > 0
    np.testing.assert_allclose(imgs[0], imgs[1], rtol=1e-6)


class TestFastMIS:
  """BDPTFast analogue (bidirectional.cxx:323-331): approximate MIS that
  drops reverse-pdf terms CONSISTENTLY across every strategy — the
  weights still partition unity, so the estimator stays unbiased."""

  def test_bdpt_fast_agrees_with_pt(self):
    from etx_tracer_tpu.scene import cornell
    scene, config = cornell.build_cornell_box(
        film_size=(16, 16), diffuse_only=True, max_path_length=4).build()
    fs_pt = path_tracing.render(scene, config, iterations=48)
    pt_img = np.asarray(film_mod.result_image(fs_pt))
    fs = film_mod.allocate(16, 16)
    for i in range(48):
      fs = vcm.render_iteration(scene, config, vcm.bdpt_fast_options(), fs, i)
    img = np.asarray(film_mod.result_image(fs))
    assert np.isfinite(img).all()
    ratio = img.mean() / pt_img.mean()
    assert 0.85 < ratio < 1.15, ratio

  @pytest.mark.slow
  def test_fast_mis_full_vcm_finite(self):
    import dataclasses
    from etx_tracer_tpu.scene import cornell
    scene, config = cornell.build_cornell_box(
        film_size=(16, 16), diffuse_only=False, max_path_length=5).build()
    opts = dataclasses.replace(vcm.VCMOptions(), fast_mis=True)
    fs = film_mod.allocate(16, 16)
    fs = vcm.render_iteration(scene, config, opts, fs, 0)
    img = np.asarray(film_mod.result_image(fs))
    assert np.isfinite(img).all() and img.sum() > 0


@pytest.mark.slow
def test_camera_cascade_matches_single_phase(monkeypatch):
  """The camera-pass compaction cascade (active above
  _CAMERA_CASCADE_MIN lanes) must reproduce the single-phase result —
  compaction only drops dead lanes and banks accumulators exactly."""
  scene, config = cornell.build_cornell_box(
      film_size=(32, 32), diffuse_only=False, max_path_length=8).build()
  opts = vcm.VCMOptions()

  fs1 = film_mod.allocate(32, 32)
  fs1 = vcm.render_iteration(scene, config, opts, fs1, 0)
  single = np.asarray(fs1.camera)

  monkeypatch.setattr(vcm, "_CAMERA_CASCADE_MIN", 64)
  vcm._render_iteration_jit._clear_cache()
  fs2 = film_mod.allocate(32, 32)
  fs2 = vcm.render_iteration(scene, config, opts, fs2, 0)
  cascaded = np.asarray(fs2.camera)
  vcm._render_iteration_jit._clear_cache()

  np.testing.assert_allclose(cascaded, single, rtol=1e-4, atol=1e-6)


def test_deep_walk_preserves_last_vertex_slot():
  """Regression: walks deeper than the vertex capacity used to ERASE the
  last slot's valid flag (the clamped out-of-bounds .at[:, slot].set wrote
  False there every post-capacity step)."""
  scene, config = cornell.build_cornell_box(
      film_size=(16, 16), diffuse_only=True, max_path_length=16).build()
  opts = dataclasses.replace(vcm.VCMOptions(), max_stored_vertices=2)
  verts, _, _ = vcm.light_pass(scene, config, opts, 0, 256, 1.0, 1.0)
  valid = np.asarray(verts.valid)
  assert valid[:, 1].sum() > 0, "deep walk erased the last vertex slot"


def test_render_chunk_matches_eager_loop():
  """vcm.render_chunk (fori_loop-fused iterations, the bench gate's fast
  path) must reproduce the eager render_iteration loop; render_chunk_stats
  must report a plausible ray count."""
  scene, config = cornell.build_cornell_box(
      film_size=(16, 16), diffuse_only=True, max_path_length=4).build()
  opts = vcm.VCMOptions()
  n = 3
  fs0 = film_mod.allocate(16, 16)
  fs_a = fs0
  for i in range(n):
    fs_a = vcm.render_iteration(scene, config, opts, fs_a, i)
  fs_b, rays = vcm.render_chunk_stats(scene, config, opts, fs0, 0, n)
  a = np.asarray(film_mod.result_image(fs_a))
  b = np.asarray(film_mod.result_image(fs_b))
  np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-6)
  # each iteration traces at least one closest ray per light+camera lane
  assert float(rays) >= n * 2 * 256
