"""glTF loader tests with a synthetic GLB."""

import base64
import json
import struct

import numpy as np

from etx_tracer_tpu.scene import gltf_loader
from etx_tracer_tpu.scene.types import MaterialClass


def _make_glb(tmp_path):
  positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
  normals = np.tile([0.0, 0.0, 1.0], (4, 1)).astype(np.float32)
  indices = np.array([0, 1, 2, 1, 3, 2], np.uint16)
  binary = positions.tobytes() + normals.tobytes() + indices.tobytes() + b"\x00\x00"

  doc = {
      "asset": {"version": "2.0"},
      "scene": 0,
      "scenes": [{"nodes": [0, 1]}],
      "nodes": [
          {"mesh": 0, "translation": [0, 0, -2]},
          {"camera": 0, "translation": [0, 0, 3]},
      ],
      "cameras": [{"type": "perspective",
                   "perspective": {"yfov": 0.7, "aspectRatio": 1.0}}],
      "meshes": [{"primitives": [{
          "attributes": {"POSITION": 0, "NORMAL": 1},
          "indices": 2, "material": 0}]}],
      "materials": [{
          "name": "pbr",
          "pbrMetallicRoughness": {
              "baseColorFactor": [0.8, 0.2, 0.1, 1.0],
              "metallicFactor": 0.3, "roughnessFactor": 0.5},
          "emissiveFactor": [1.0, 1.0, 1.0],
          "extensions": {"KHR_materials_emissive_strength": {"emissiveStrength": 2.0}},
      }],
      "accessors": [
          {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
          {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
          {"bufferView": 2, "componentType": 5123, "count": 6, "type": "SCALAR"},
      ],
      "bufferViews": [
          {"buffer": 0, "byteOffset": 0, "byteLength": 48},
          {"buffer": 0, "byteOffset": 48, "byteLength": 48},
          {"buffer": 0, "byteOffset": 96, "byteLength": 12},
      ],
      "buffers": [{"byteLength": len(binary)}],
  }
  js = json.dumps(doc).encode()
  js += b" " * ((4 - len(js) % 4) % 4)
  total = 12 + 8 + len(js) + 8 + len(binary)
  glb = struct.pack("<III", 0x46546C67, 2, total)
  glb += struct.pack("<II", len(js), 0x4E4F534A) + js
  glb += struct.pack("<II", len(binary), 0x004E4942) + binary
  p = tmp_path / "test.glb"
  p.write_bytes(glb)
  return str(p)


class TestGltf:
  def test_load_glb(self, tmp_path):
    path = _make_glb(tmp_path)
    b = gltf_loader.load_gltf(path)
    scene, config = b.build()
    assert scene.tri_idx.shape[0] == 2
    # node translation applied
    assert abs(float(np.asarray(scene.v_pos)[:, 2].mean()) + 2.0) < 1e-5
    # Principled material with metalness/transmission
    assert MaterialClass.Principled in config.material_classes
    m = b.material_names["pbr"]
    assert abs(float(np.asarray(scene.materials.metalness)[m]) - 0.3) < 1e-6
    # roughness squared (Pr convention)
    assert abs(float(np.asarray(scene.materials.roughness)[m, 0]) - 0.25) < 1e-6
    # emissive with strength 2 -> area emitters instanced
    assert int((np.asarray(scene.tri_emitter) >= 0).sum()) == 2
    # camera from the node
    np.testing.assert_allclose(np.asarray(scene.camera.position), [0, 0, 3], atol=1e-5)

  def test_textured_glb(self, tmp_path):
    """baseColor/metallicRoughness/normal textures wire into material rows
    (scene_representation.cxx:2271-2289 parity: channel selects become
    load-time greyscale splits)."""
    from etx_tracer_tpu.utils import image_io

    # base color: 2x2 sRGB-encoded red; metalRough: G=0.5 B=1.0 linear
    base_png = image_io.encode_png(
        np.tile(np.float32([1.0, 0.0, 0.0]), (2, 2, 1)),
        flip=False, tonemap=True)
    mr_png = image_io.encode_png(
        np.tile(np.float32([0.0, 0.5, 1.0]), (2, 2, 1)),
        flip=False, tonemap=False)

    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    uvs = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    indices = np.array([0, 1, 2], np.uint16)

    def pad4(bb):
      return bb + b"\x00" * ((4 - len(bb) % 4) % 4)

    binary = (pad4(positions.tobytes()) + pad4(uvs.tobytes())
              + pad4(indices.tobytes()) + pad4(base_png) + pad4(mr_png))
    o_uv = len(pad4(positions.tobytes()))
    o_idx = o_uv + len(pad4(uvs.tobytes()))
    o_base = o_idx + len(pad4(indices.tobytes()))
    o_mr = o_base + len(pad4(base_png))

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
            "indices": 2, "material": 0}]}],
        "materials": [{
            "name": "tex",
            "pbrMetallicRoughness": {
                "baseColorTexture": {"index": 0},
                "metallicRoughnessTexture": {"index": 1},
                "metallicFactor": 1.0, "roughnessFactor": 1.0}}],
        "textures": [{"source": 0}, {"source": 1}],
        "images": [{"bufferView": 3, "mimeType": "image/png"},
                   {"bufferView": 4, "mimeType": "image/png"}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": o_uv, "byteLength": 24},
            {"buffer": 0, "byteOffset": o_idx, "byteLength": 6},
            {"buffer": 0, "byteOffset": o_base, "byteLength": len(base_png)},
            {"buffer": 0, "byteOffset": o_mr, "byteLength": len(mr_png)},
        ],
        "buffers": [{"byteLength": len(binary)}],
    }
    js = json.dumps(doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    total = 12 + 8 + len(js) + 8 + len(binary)
    glb = struct.pack("<III", 0x46546C67, 2, total)
    glb += struct.pack("<II", len(js), 0x4E4F534A) + js
    glb += struct.pack("<II", len(binary), 0x004E4942) + binary
    p = tmp_path / "textured.glb"
    p.write_bytes(glb)

    b = gltf_loader.load_gltf(str(p))
    m = b.material_names["tex"]
    mat = b.materials[m]
    assert mat.scattering_img >= 0
    assert mat.reflectance_img == mat.scattering_img
    assert mat.roughness_img >= 0 and mat.metalness_img >= 0
    assert mat.roughness_img != mat.metalness_img

    # decoded contents: base color red round-trips sRGB; metalRough splits
    base_px = b.images[mat.scattering_img]["pixels"]
    np.testing.assert_allclose(base_px[0, 0, :3], [1, 0, 0], atol=2e-2)
    rough_px = b.images[mat.roughness_img]["pixels"]
    metal_px = b.images[mat.metalness_img]["pixels"]
    # rough split stores texel^2 (alpha convention), G=0.5 -> 0.25
    assert abs(float(rough_px[0, 0, 0]) - 0.25) < 2e-2
    assert abs(float(metal_px[0, 0, 0]) - 1.0) < 2e-2

    # and the scene renders with textures active
    from etx_tracer_tpu.models import path_tracing
    from etx_tracer_tpu.render import film as film_mod
    b.film_size = (8, 8)
    b.max_path_length = 2
    b.set_camera([0.3, 0.3, 2.0], [0.3, 0.3, 0.0], [0, 1, 0], 45.0, (8, 8))
    scene, config = b.build()
    fs = path_tracing.render(scene, config, iterations=1)
    assert np.isfinite(np.asarray(film_mod.result_image(fs))).all()

  def test_render_gltf_scene(self, tmp_path):
    from etx_tracer_tpu.models import path_tracing
    from etx_tracer_tpu.render import film as film_mod
    path = _make_glb(tmp_path)
    b = gltf_loader.load_gltf(path)
    b.film_size = (16, 16)
    b.max_path_length = 3
    scene, config = b.build()
    fs = path_tracing.render(scene, config, iterations=2)
    img = np.asarray(film_mod.result_image(fs))
    assert np.isfinite(img).all()
    assert img.max() > 0.0  # emissive quad visible
