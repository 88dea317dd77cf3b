"""Blender exporter round-trip: serialize.py MTL blocks -> obj_loader.

The operator half needs bpy (Blender-only); the serializer is plain Python,
so parity is tested by writing an exported-shaped scene and loading it back
through the production OBJ/MTL loader (the reference exporter's output is
consumed by scene_representation.cxx the same way; logic.py:97-246).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "blender"))

from etx_tracer_tpu_exporter import serialize  # noqa: E402

from etx_tracer_tpu.core import spectrum as sp  # noqa: E402
from etx_tracer_tpu.scene import obj_loader  # noqa: E402
from etx_tracer_tpu.scene.types import MaterialClass, SubsurfaceClass  # noqa: E402

_TRI = {
    "name": "tri", "material": "skin",
    "vertices": [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)],
    "normals": [(0.0, 0.0, 1.0)] * 3,
    "uvs": [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)],
    "faces": [((0, 0, 0), (1, 1, 1), (2, 2, 2))],
}


def _write_scene(tmp_path, mtl_blocks):
  obj_path = str(tmp_path / "scene.obj")
  serialize.write_obj(obj_path, [_TRI])
  # write_obj doesn't emit mtllib; prepend it the way the operator's output
  # file layout implies (same basename)
  with open(obj_path) as f:
    body = f.read()
  with open(obj_path, "w") as f:
    f.write("mtllib scene.mtl\n" + body)
  with open(tmp_path / "scene.mtl", "w") as f:
    f.write("\n".join(mtl_blocks))
  return obj_path


class TestMediumSssRoundTrip:
  def test_medium_and_sss_material(self, tmp_path):
    med = serialize.medium_block({
        "id": "skin__vol",
        "absorption": (0.3, 0.5, 0.9),
        "scattering": (1.2, 1.1, 0.9),
        "anisotropy": 0.4,
    })
    mat = serialize.material_block("skin", {
        "cls": "principled",
        "base_color": (0.8, 0.5, 0.4),
        "roughness": 0.35,
        "int_medium": "skin__vol",
        "subsurface": {"distances": (1.0, 0.25, 0.08), "scale": 0.6},
        "thinfilm": {"min_nm": 250.0, "max_nm": 250.0, "ior": 1.33},
    })
    obj_path = _write_scene(tmp_path, [med, mat])
    loader = obj_loader.ObjSceneLoader()
    b = loader.load(obj_path)

    assert "skin__vol" in b.medium_names
    mdesc = b.mediums[b.medium_names["skin__vol"]]
    assert mdesc.phase_g == pytest.approx(0.4)
    assert mdesc.absorption_spec >= 0
    assert mdesc.scattering_spec >= 0

    m = b.materials[b.material_names["skin"]]
    assert m.cls == MaterialClass.Principled
    assert m.int_medium == b.medium_names["skin__vol"]
    assert m.subsurface_cls == SubsurfaceClass.RandomWalk
    assert m.subsurface_spec >= 0
    assert m.thinfilm_min == pytest.approx(250.0)
    assert m.thinfilm_max == pytest.approx(250.0)
    assert m.thinfilm_eta >= 0
    # Pr is sqrt(alpha) in the MTL dialect; loader squares it
    assert m.roughness[0] == pytest.approx(0.35 ** 2, rel=1e-4)

  def test_spectral_ior_name_and_blackbody(self, tmp_path):
    gold = serialize.material_block("gold_ring", {
        "cls": "conductor",
        "base_color": (1.0, 1.0, 1.0),
        "roughness": 0.1,
        "ior_name": "Au",
    })
    lamp = serialize.material_block("lamp", {
        "cls": "diffuse",
        "base_color": (0.0, 0.0, 0.0),
        "roughness": 0.0,
        "emission_blackbody": {"temperature": 3200.0, "strength": 2.5},
        "two_sided": True,
    })
    tri_gold = dict(_TRI, name="a", material="gold_ring")
    tri_lamp = dict(_TRI, name="b", material="lamp")
    obj_path = str(tmp_path / "scene.obj")
    serialize.write_obj(obj_path, [tri_gold, tri_lamp])
    with open(obj_path) as f:
      body = f.read()
    with open(obj_path, "w") as f:
      f.write("mtllib scene.mtl\n" + body)
    with open(tmp_path / "scene.mtl", "w") as f:
      f.write(gold + "\n" + lamp)

    loader = obj_loader.ObjSceneLoader()
    b = loader.load(obj_path)

    g = b.materials[b.material_names["gold_ring"]]
    assert g.cls == MaterialClass.Conductor
    assert g.int_ior_cls == sp.SpectralDistribution.CLASS_CONDUCTOR
    assert g.int_ior_eta >= 0 and g.int_ior_k >= 0

    l = b.materials[b.material_names["lamp"]]
    assert l.emission_spec >= 0
    assert l.two_sided

  def test_ext_medium_fog(self, tmp_path):
    med = serialize.medium_block({
        "id": "fog", "scattering": (0.1, 0.1, 0.1), "enclosed": True,
    })
    mat = serialize.material_block("glass", {
        "cls": "dielectric", "base_color": (1.0, 1.0, 1.0),
        "roughness": 0.0, "ior": 1.45, "ext_medium": "fog",
    })
    obj_path = _write_scene(tmp_path,
                            [med, mat.replace("newmtl glass", "newmtl skin")])
    loader = obj_loader.ObjSceneLoader()
    b = loader.load(obj_path)
    mdesc = b.mediums[b.medium_names["fog"]]
    assert not mdesc.explicit_connections
    m = b.materials[b.material_names["skin"]]
    assert m.cls == MaterialClass.Dielectric
    assert m.ext_medium == b.medium_names["fog"]
