"""Viewer parity tests (VERDICT round-1 item 8): editors round-trip a
render restart; film layers and the reference-diff view serve frames.

The render thread is NOT started — ViewerState methods and the HTTP
handlers are exercised directly (layer images come from a synthesized
FilmState)."""

import json
import threading
import urllib.request

import numpy as np
import pytest


def _state():
  from etx_tracer_tpu.scene import cornell
  from etx_tracer_tpu.viewer import server as vs
  b = cornell.build_cornell_box(film_size=(16, 16), diffuse_only=False,
                                max_path_length=4)
  st = vs.ViewerState(b)
  st.dirty = False
  return st, vs


def _fake_film(st):
  from etx_tracer_tpu.render import film as film_mod
  h, w = st.image.shape[:2]
  rng = np.random.default_rng(0)
  fs = film_mod.FilmState(
      camera=rng.random((h, w, 3)).astype(np.float32),
      variance_half=rng.random((h, w, 3)).astype(np.float32),
      normals=rng.random((h, w, 3)).astype(np.float32) * 2 - 1,
      albedo=rng.random((h, w, 3)).astype(np.float32),
      light=rng.random((h, w, 3)).astype(np.float32),
      light_iteration=np.zeros((h, w, 3), np.float32),
      iteration=np.int32(4))
  st.film = fs
  st.image = np.asarray(fs.camera) + np.asarray(fs.light)
  return fs


def test_material_edit_round_trips_restart():
  st, vs = _state()
  info = st.scene_info()
  assert any(m["cls"] == "Conductor" for m in info["materials"])
  idx = next(i for i, m in enumerate(info["materials"]) if m["cls"] == "Conductor")
  st.edit_material(idx, {"roughness": 0.3, "cls": "Dielectric"})
  assert st.dirty  # edit restarts accumulation
  info2 = st.scene_info()
  assert info2["materials"][idx]["cls"] == "Dielectric"
  assert abs(info2["materials"][idx]["roughness"] - 0.3) < 1e-6
  # the edited builder still builds a valid scene
  scene, config = st._build()
  assert 4 in config.material_classes  # Dielectric compiled in


def test_emission_scale_creates_scaled_spectrum():
  st, vs = _state()
  info = st.scene_info()
  idx = next(i for i, m in enumerate(info["materials"]) if m["emissive"])
  before = st.builder.spectra[st.builder.materials[idx].emission_spec].integrated_rgb().copy()
  st.edit_material(idx, {"emission_scale": 2.0})
  after = st.builder.spectra[st.builder.materials[idx].emission_spec].integrated_rgb()
  np.testing.assert_allclose(after, before * 2.0, rtol=1e-6)
  assert st.dirty


def test_camera_edit_round_trips():
  st, vs = _state()
  st.edit_camera({"fov": 50.0, "lens_radius": 0.02, "focal_distance": 3.0})
  assert st.dirty
  info = st.scene_info()
  assert info["camera"]["fov"] == 50.0
  assert info["camera"]["lens_radius"] == 0.02


def test_layer_images_and_diff(tmp_path):
  from etx_tracer_tpu.utils import image_io
  st, vs = _state()
  _fake_film(st)
  for layer in ("result", "camera", "light", "normals", "albedo",
                "denoised", "noise"):
    img = st.layer_image(layer)
    assert img.shape == st.image.shape, layer
    assert np.isfinite(img).all(), layer
  # camera and light layers differ
  assert not np.allclose(st.layer_image("camera"), st.layer_image("light"))

  # reference diff: identical reference -> zero diff and zero rmse
  ref_path = str(tmp_path / "ref.exr")
  image_io.save_exr(ref_path, st.image)
  st.load_reference(ref_path)
  assert np.abs(st.layer_image("diff")).max() < 1e-5
  assert st.rmse() < 1e-5
  # different reference -> nonzero
  st.reference = st.reference * 0.5
  assert st.layer_image("reldiff").max() > 0
  assert st.rmse() > 0


def test_http_routes_serve():
  st, vs = _state()
  _fake_film(st)
  server = vs.make_server(st, port=0)
  port = server.server_address[1]
  t = threading.Thread(target=server.serve_forever, daemon=True)
  t.start()
  try:
    base = f"http://127.0.0.1:{port}"
    scene = json.loads(urllib.request.urlopen(base + "/scene").read())
    assert scene["materials"] and scene["camera"]["fov"] > 0
    png = urllib.request.urlopen(base + "/frame?layer=normals&exposure=1").read()
    assert png[:4] == b"\x89PNG"
    status = json.loads(urllib.request.urlopen(base + "/status").read())
    assert status["width"] == 16
    # POST a material edit through the wire
    req = urllib.request.Request(
        base + "/material", data=json.dumps({"index": 0, "roughness": 0.5}).encode(),
        method="POST")
    urllib.request.urlopen(req)
    assert st.dirty
  finally:
    server.shutdown()
