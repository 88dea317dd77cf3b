"""Spectrum-plot / thin-film-curve debug modes (debug.cxx Mode::Spectrums,
Mode::Thinfilm — VERDICT round-3 missing item 5)."""

import numpy as np

from etx_tracer_tpu.models import debug as dbg
from etx_tracer_tpu.scene import cornell


def _scene(w=72, h=72):
  return cornell.build_cornell_box(film_size=(w, h), diffuse_only=True,
                                   max_path_length=2).build()


class TestSpectrums:
  def test_halves_agree_per_band(self):
    """Left half (per-pixel spectral MC through the sech^2 sampler) must
    average to the right half (RGB integration path) for every band — the
    live spectral-pipeline validation the reference mode provides."""
    scene, config = _scene()
    img = np.asarray(dbg.render_debug(scene, config, dbg.DebugMode.Spectrums))
    assert np.isfinite(img).all()
    h, w, _ = img.shape
    for band in range(9):
      rows = slice(h - (band + 1) * h // 9, h - band * h // 9)
      left = img[rows, : w // 2].mean((0, 1))
      right = img[rows, w // 2:].mean((0, 1))
      # spectral estimate is 1-sample MC per pixel; the band mean over
      # ~288 pixels still carries noise — bound the relative gap loosely
      denom = max(float(np.abs(right).max()), 1e-3)
      assert np.max(np.abs(left - right)) / denom < 0.35, (
          f"band {band}: spectral {left} vs rgb {right}")

  def test_blackbody_bands_warm_to_cool(self):
    """2700K bottom band must be red-dominant; 20000K band blue-dominant."""
    scene, config = _scene()
    img = np.asarray(dbg.render_debug(scene, config, dbg.DebugMode.Spectrums))
    h, w, _ = img.shape
    rgbhalf = img[:, w // 2:]
    b0 = rgbhalf[h - h // 9:, :].mean((0, 1))       # band 0 = 2700K
    b4 = rgbhalf[h - 5 * h // 9: h - 4 * h // 9].mean((0, 1))  # 20000K
    assert b0[0] > b0[2], f"2700K not warm: {b0}"
    assert b4[2] > b4[0], f"20000K not cool: {b4}"


class TestThinfilmCurve:
  def test_interference_structure(self):
    scene, config = _scene()
    img = np.asarray(dbg.render_debug(scene, config,
                                      dbg.DebugMode.ThinfilmCurve))
    assert np.isfinite(img).all()
    h, w, _ = img.shape
    # thickness ~0 row: no interference -> near-neutral Fresnel of the
    # base dielectric; thick rows must oscillate (structured color)
    thin_row = img[0].mean(0)
    assert float(np.abs(thin_row - thin_row.mean()).max()) < 0.25
    # vertical oscillation at a fixed angle: the reflectance along
    # thickness must have several local extrema (interference fringes)
    col = img[:, w // 4, 1]
    sign_changes = int(np.sum(np.abs(np.diff(np.sign(np.diff(col)))) > 0))
    assert sign_changes >= 4, f"no fringes found ({sign_changes})"
