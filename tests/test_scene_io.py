"""Scene IO tests: OBJ/MTL/JSON loaders, SPD parsing, IOR database."""

import numpy as np
import pytest

from etx_tracer_tpu.core import spectrum as sp
from etx_tracer_tpu.scene import assets, ior, json_scene
from etx_tracer_tpu.scene.types import EmitterClass, MaterialClass


class TestSpd:
  def test_parse_um_wavelengths(self):
    text = "#class:conductor\n0.400 1.0 2.0\n0.700 1.5 3.0\n"
    cls, title, wl, v0, v1 = ior.parse_spd(text)
    assert cls == sp.SpectralDistribution.CLASS_CONDUCTOR
    np.testing.assert_allclose(wl, [400.0, 700.0])
    np.testing.assert_allclose(v0, [1.0, 1.5])
    np.testing.assert_allclose(v1, [2.0, 3.0])

  def test_load_file_extends_range(self, tmp_path):
    p = tmp_path / "test.spd"
    p.write_text("#class:dielectric\n500 1.5\n600 1.6\n")
    cls, eta, k = ior.load_spd_file(str(p))
    assert cls == sp.SpectralDistribution.CLASS_DIELECTRIC
    # extended: holds end values at the range boundaries
    assert eta.values[0] == pytest.approx(1.5, abs=1e-5)
    assert eta.values[-1] == pytest.approx(1.6, abs=1e-5)

  def test_builtin_conductors(self):
    db = ior.IORDatabase(folder="/nonexistent")
    found = db.find("silver")
    assert found is not None
    cls, eta, k = found
    assert cls == sp.SpectralDistribution.CLASS_CONDUCTOR
    assert k.values.max() > 1.0  # metals have large k

  def test_reference_spd_library_if_present(self):
    import os
    ref = "/root/reference/bin/spectrum"
    if not os.path.isdir(ref):
      pytest.skip("reference spd library not mounted")
    db = ior.IORDatabase(folder=ref)
    found = db.find("gold")
    assert found is not None
    cls, eta, k = found
    assert cls == sp.SpectralDistribution.CLASS_CONDUCTOR
    # gold: n < 1 in the green-red region, k ~ 2-4
    i_600 = int(600 - sp.kShortestWavelength)
    assert eta.values[i_600] < 1.0
    assert 2.0 < k.values[i_600] < 4.5


class TestCornellAsset:
  def test_roundtrip_and_build(self, tmp_path):
    path = assets.write_cornell_asset(str(tmp_path))
    b = json_scene.load_scene(path)
    assert b.samples == 32
    assert b.max_path_length == 1023
    assert b.film_size == (640, 640)
    scene, config = b.build()
    assert scene.tri_idx.shape[0] == 36
    # light instanced as area emitters (2 triangles)
    assert int((np.asarray(scene.tri_emitter) >= 0).sum()) == 2
    # material classes: diffuse + conductor
    assert MaterialClass.Diffuse in config.material_classes
    assert MaterialClass.Conductor in config.material_classes
    # conductor material: silver IOR loaded (k > 1 at 550nm)
    mats = scene.materials
    cond = int(np.argmax(np.asarray(mats.cls) == MaterialClass.Conductor))
    k_idx = int(np.asarray(mats.int_ior_k)[cond])
    assert k_idx >= 0
    k550 = float(np.asarray(scene.spec_values)[k_idx, 550 - 390])
    assert k550 > 1.0

  def test_srgb_conversion_of_kd(self, tmp_path):
    path = assets.write_cornell_asset(str(tmp_path))
    b = json_scene.load_scene(path)
    scene, config = b.build()
    # gray material Kd 0.906 -> linear ~0.79
    gray_idx = b.material_names["gray"]
    spec = int(np.asarray(scene.materials.scattering_spec)[gray_idx])
    rgb = np.asarray(scene.spec_rgb)[spec]
    assert abs(rgb[0] - 0.906 ** 2.4) < 0.08
    assert rgb[0] < 0.85

  def test_render_loaded_scene_smoke(self, tmp_path):
    from etx_tracer_tpu.models import path_tracing
    from etx_tracer_tpu.render import film as film_mod
    path = assets.write_cornell_asset(str(tmp_path))
    b = json_scene.load_scene(path)
    b.film_size = (32, 32)
    b.max_path_length = 6
    scene, config = b.build()
    fs = path_tracing.render(scene, config, iterations=2)
    img = np.asarray(film_mod.result_image(fs))
    assert np.isfinite(img).all() and img.mean() > 0.005


class TestObjDirectives:
  def test_medium_and_boundary(self, tmp_path):
    (tmp_path / "scene.mtl").write_text(
        "newmtl et::medium\nid fog\nscattering 0.8 0.8 0.8\ng 0.3\n\n"
        "newmtl fogbox\nmaterial class boundary\nint_medium fog\n")
    (tmp_path / "scene.obj").write_text(
        "mtllib scene.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl fogbox\nf 1 2 3\n")
    from etx_tracer_tpu.scene.obj_loader import ObjSceneLoader
    b = ObjSceneLoader().load(str(tmp_path / "scene.obj"))
    scene, config = b.build()
    assert MaterialClass.Boundary in config.material_classes
    assert "fog" in b.medium_names
    fog = b.medium_names["fog"]
    assert float(np.asarray(scene.mediums.phase_g)[fog]) == pytest.approx(0.3)
    mat = b.material_names["fogbox"]
    assert int(np.asarray(scene.materials.int_medium)[mat]) == fog

  def test_dir_and_env_emitters(self, tmp_path):
    (tmp_path / "scene.mtl").write_text(
        "newmtl et::env\ncolor nblackbody 12000 scale 0.1\n\n"
        "newmtl et::dir\ndirection 0 0.866 0.5\ncolor nblackbody 5800 scale 1.0\nangular_diameter 0.53\n\n"
        "newmtl floor\nmaterial class diffuse\nKd 1 1 1\n")
    (tmp_path / "scene.obj").write_text(
        "mtllib scene.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl floor\nf 1 2 3\n")
    from etx_tracer_tpu.scene.obj_loader import ObjSceneLoader
    b = ObjSceneLoader().load(str(tmp_path / "scene.obj"))
    scene, config = b.build()
    assert config.num_env_emitters == 2
    cls = np.asarray(scene.emitters.cls)
    assert (cls == EmitterClass.Environment).sum() == 1
    assert (cls == EmitterClass.Directional).sum() == 1
    # directional angular size in radians
    prof = np.asarray(scene.emitter_profiles.angular_size)
    assert abs(prof.max() - np.deg2rad(0.53)) < 1e-5


class TestMTLSaveBack:
  """Scene save-back to extended MTL (scene_representation.cxx:2502-2980)."""

  def test_roundtrip(self, tmp_path):
    import dataclasses as dc
    from etx_tracer_tpu.scene import cornell, save_mtl
    from etx_tracer_tpu.scene.obj_loader import ObjSceneLoader

    b = cornell.build_cornell_box(film_size=(32, 32), fog_scattering=0.2)
    fi = b.material_names["white"]
    b.materials[fi] = dc.replace(b.materials[fi], roughness=(0.25, 0.25),
                                 opacity=0.8)
    mtl = str(tmp_path / "scene.mtl")
    save_mtl.save_materials(mtl, b)
    text = open(mtl).read()
    assert "newmtl et::camera" in text
    assert "newmtl et::medium" in text

    loader = ObjSceneLoader()
    loader.load_materials(mtl)
    b2 = loader.b
    w = b2.materials[b2.material_names["white"]]
    assert abs(w.roughness[0] - 0.25) < 1e-4
    assert abs(w.opacity - 0.8) < 1e-5
    assert "fog" in b2.medium_names
    # non-emissive materials must not grow emitters on reload
    assert w.emission_spec < 0
    # the light does round-trip as an emitter
    lm = b2.materials[b2.material_names["light"]]
    assert lm.emission_spec >= 0


class TestViewer:
  """Web viewer server (raytracer/app.cxx analogue)."""

  def test_viewer_state_camera_controller(self):
    from etx_tracer_tpu.scene import cornell
    from etx_tracer_tpu.viewer.server import ViewerState
    b = cornell.build_cornell_box(film_size=(32, 32))
    st = ViewerState(b)
    o0 = st.origin.copy()
    st.orbit(40, 10)
    assert not np.allclose(st.origin, o0)
    # orbit preserves distance to target
    r0 = np.linalg.norm(o0 - st.target)
    r1 = np.linalg.norm(st.origin - st.target)
    assert abs(r0 - r1) < 1e-3
    st.dolly(500)
    assert np.linalg.norm(st.origin - st.target) > r1
    t0 = st.target.copy()
    st.pan(10, 5)
    assert not np.allclose(st.target, t0)
    assert st.dirty and st.preview

  def test_render_preview_and_heatmap(self):
    from etx_tracer_tpu.scene import cornell
    from etx_tracer_tpu.models import path_tracing
    from etx_tracer_tpu.render import film as film_mod
    b = cornell.build_cornell_box(film_size=(32, 32), diffuse_only=True,
                                  max_path_length=3)
    scene, config = b.build()
    img = np.asarray(path_tracing.render_preview(scene, config, pixel_size=4))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all() and img.mean() > 0
    hm = np.asarray(film_mod.sample_heatmap(
        np.random.RandomState(0).randint(4, 64, (8, 8))))
    assert hm.shape == (8, 8, 3)
    assert hm.min() >= 0.0 and hm.max() <= 1.0
