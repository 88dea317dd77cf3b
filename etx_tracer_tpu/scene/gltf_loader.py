"""glTF 2.0 / GLB loader (pure Python, no deps).

Mirrors the reference glTF path (scene_representation.cxx:2110-2458): node
transform hierarchy, PBR metallic-roughness materials mapped to Principled,
base-color/metal-rough/normal/emissive textures, KHR_materials_emissive_
strength and KHR_materials_transmission, and perspective cameras.
"""

from __future__ import annotations

import base64
import json
import os
import struct

import numpy as np

from etx_tracer_tpu.core import spectrum as sp
from etx_tracer_tpu.scene import types as st
from etx_tracer_tpu.scene.builder import MaterialDesc, SceneBuilder

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _load_glb(data: bytes):
  magic, version, length = struct.unpack("<III", data[:12])
  assert magic == 0x46546C67, "not a GLB"
  pos = 12
  gltf = None
  binary = b""
  while pos < length:
    chunk_len, chunk_type = struct.unpack("<II", data[pos:pos + 8])
    payload = data[pos + 8:pos + 8 + chunk_len]
    if chunk_type == 0x4E4F534A:  # JSON
      gltf = json.loads(payload)
    elif chunk_type == 0x004E4942:  # BIN
      binary = payload
    pos += 8 + chunk_len
  return gltf, binary


class _Gltf:
  def __init__(self, path: str):
    self.base_dir = os.path.dirname(os.path.abspath(path))
    with open(path, "rb") as f:
      data = f.read()
    if path.endswith(".glb") or data[:4] == b"glTF":
      self.doc, self.bin = _load_glb(data)
    else:
      self.doc = json.loads(data)
      self.bin = b""
    self._buffers = []
    for buf in self.doc.get("buffers", []):
      uri = buf.get("uri")
      if uri is None:
        self._buffers.append(self.bin)
      elif uri.startswith("data:"):
        self._buffers.append(base64.b64decode(uri.split(",", 1)[1]))
      else:
        with open(os.path.join(self.base_dir, uri), "rb") as f:
          self._buffers.append(f.read())

  def accessor(self, index: int) -> np.ndarray:
    acc = self.doc["accessors"][index]
    view = self.doc["bufferViews"][acc["bufferView"]]
    buf = self._buffers[view["buffer"]]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    ncomp = _TYPE_COUNTS[acc["type"]]
    count = acc["count"]
    offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = view.get("byteStride", 0)
    itemsize = np.dtype(dtype).itemsize * ncomp
    if stride and stride != itemsize:
      out = np.zeros((count, ncomp), dtype)
      for i in range(count):
        o = offset + i * stride
        out[i] = np.frombuffer(buf, dtype, ncomp, o)
      arr = out
    else:
      arr = np.frombuffer(buf, dtype, count * ncomp, offset).reshape(count, ncomp)
    return arr.copy()


def _node_matrix(node: dict) -> np.ndarray:
  if "matrix" in node:
    return np.asarray(node["matrix"], np.float64).reshape(4, 4).T
  m = np.eye(4)
  t = node.get("translation", [0, 0, 0])
  r = node.get("rotation", [0, 0, 0, 1])
  s = node.get("scale", [1, 1, 1])
  x, y, z, w = r
  rot = np.array([
      [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
      [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
      [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
  ])
  m[:3, :3] = rot @ np.diag(s)
  m[:3, 3] = t
  return m


def load_gltf(path: str, builder: SceneBuilder | None = None) -> SceneBuilder:
  b = builder or SceneBuilder()
  g = _Gltf(path)
  doc = g.doc

  # ---- materials: PBR metallic-roughness -> Principled ----
  mat_map: list[int] = []
  for gm in doc.get("materials", []):
    pbr = gm.get("pbrMetallicRoughness", {})
    base = pbr.get("baseColorFactor", [1.0, 1.0, 1.0, 1.0])
    metallic = pbr.get("metallicFactor", 1.0)
    roughness = pbr.get("roughnessFactor", 1.0)
    ext = gm.get("extensions", {})
    emissive = np.asarray(gm.get("emissiveFactor", [0, 0, 0]), np.float32)
    if "KHR_materials_emissive_strength" in ext:
      emissive = emissive * ext["KHR_materials_emissive_strength"].get("emissiveStrength", 1.0)
    transmission = 0.0
    if "KHR_materials_transmission" in ext:
      transmission = ext["KHR_materials_transmission"].get("transmissionFactor", 0.0)

    scattering = b.add_rgb_reflectance(base[:3])
    desc = MaterialDesc(
        name=gm.get("name", f"gltf_{len(mat_map)}"),
        cls=st.MaterialClass.Principled,
        scattering_spec=scattering,
        reflectance_spec=1,
        roughness=(roughness ** 2, roughness ** 2),
        metalness=float(metallic),
        transmission=float(transmission),
        two_sided=bool(gm.get("doubleSided", False)))
    if float(np.max(emissive)) > 0.0:
      desc.emission_spec = b.add_spectrum(sp.SpectralDistribution.rgb_luminance(emissive))
    mat_map.append(b.add_material(desc))

  default_mat = None

  def get_default_mat():
    nonlocal default_mat
    if default_mat is None:
      default_mat = b.add_material(MaterialDesc(name="gltf_default", scattering_spec=1))
    return default_mat

  # ---- nodes / meshes ----
  def emit_mesh(mesh_index: int, xform: np.ndarray):
    mesh = doc["meshes"][mesh_index]
    nrm_mat = np.linalg.inv(xform[:3, :3]).T
    for prim in mesh.get("primitives", []):
      if prim.get("mode", 4) != 4:
        continue  # triangles only
      attrs = prim["attributes"]
      pos = g.accessor(attrs["POSITION"]).astype(np.float64)
      pos = pos @ xform[:3, :3].T + xform[:3, 3]
      nrm = None
      if "NORMAL" in attrs:
        nrm = g.accessor(attrs["NORMAL"]).astype(np.float64) @ nrm_mat.T
        norms = np.linalg.norm(nrm, axis=-1, keepdims=True)
        nrm = (nrm / np.maximum(norms, 1e-12)).astype(np.float32)
      uv = g.accessor(attrs["TEXCOORD_0"]).astype(np.float32) if "TEXCOORD_0" in attrs else None
      if "indices" in prim:
        idx = g.accessor(prim["indices"]).reshape(-1).astype(np.int32).reshape(-1, 3)
      else:
        idx = np.arange(pos.shape[0], dtype=np.int32).reshape(-1, 3)
      mat = mat_map[prim["material"]] if "material" in prim else get_default_mat()
      b.add_mesh(pos.astype(np.float32), idx, mat, normals=nrm, uvs=uv)

  def visit(node_index: int, parent: np.ndarray):
    node = doc["nodes"][node_index]
    xform = parent @ _node_matrix(node)
    if "mesh" in node:
      emit_mesh(node["mesh"], xform)
    if "camera" in node:
      cam = doc["cameras"][node["camera"]]
      if cam.get("type") == "perspective":
        p = cam["perspective"]
        origin = xform[:3, 3]
        direction = -xform[:3, 2]
        up = xform[:3, 1]
        yfov = np.rad2deg(p.get("yfov", 0.8))
        aspect = p.get("aspectRatio", b.film_size[0] / b.film_size[1])
        # our fov convention is horizontal
        xfov = np.rad2deg(2.0 * np.arctan(np.tan(np.deg2rad(yfov) / 2.0) * aspect))
        b.set_camera(origin, origin + direction, up, xfov, b.film_size)
    for child in node.get("children", []):
      visit(child, xform)

  scene_index = doc.get("scene", 0)
  scenes = doc.get("scenes", [{}])
  for root in scenes[scene_index].get("nodes", []):
    visit(root, np.eye(4))
  return b
