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
    verts, _, _, lst = vcm.light_pass(scene, config, opts, 0, 256, 1.0, 1.0)
    grid = vcm.build_merge_grid(scene, verts, lst.wl, 0.1, False)
    cell = np.asarray(grid.sorted_cell)
    assert (np.diff(cell) >= 0).all()  # sorted
    valid = np.asarray(grid.valid)
    n_valid = int(np.asarray(verts.valid).sum())
    assert int(valid.sum()) == n_valid
    # invalid vertices sort last
    assert valid[: int(valid.sum())].all()

  def test_radius_schedule(self):
    # r_i = r0 / (1 + i/decay) (vcm_cpu.cxx:100-113)
    r0 = 5.0 * 2.0 / 640.0
    r128 = r0 / (1.0 + 128 / 256)
    assert r128 == pytest.approx(r0 / 1.5)
