"""Blender operator: collects bpy data and writes OBJ/MTL/JSON via
serialize.py (reference blender/etx_tracer_exporter/operator.py +
logic.py:9-112)."""

from __future__ import annotations

import math
import os

import bpy
from bpy.props import IntProperty, StringProperty
from bpy_extras.io_utils import ExportHelper

from . import serialize


def _collect_mesh(obj, depsgraph):
  ev = obj.evaluated_get(depsgraph)
  mesh = ev.to_mesh()
  mesh.calc_loop_triangles()
  try:
    mesh.calc_normals_split()
  except AttributeError:
    pass  # 4.1+: loop normals always available
  mw = obj.matrix_world
  verts = [tuple(mw @ v.co) for v in mesh.vertices]
  nmat = mw.inverted_safe().transposed().to_3x3()
  uv_layer = mesh.uv_layers.active
  normals = []
  uvs = []
  faces = []
  for tri in mesh.loop_triangles:
    face = []
    for li in tri.loops:
      loop = mesh.loops[li]
      n = (nmat @ loop.normal).normalized()
      normals.append(tuple(n))
      ni = len(normals) - 1
      if uv_layer is not None:
        uvs.append(tuple(uv_layer.data[li].uv))
        ti = len(uvs) - 1
      else:
        ti = None
      face.append((loop.vertex_index, ti, ni))
    faces.append(tuple(face))
  mat_name = obj.active_material.name if obj.active_material else "default"
  out = {"name": obj.name, "material": mat_name, "vertices": verts,
         "normals": normals, "uvs": uvs, "faces": faces}
  ev.to_mesh_clear()
  return out


# Blender metallic presets -> spectral IOR database names (the reference
# maps its Metallic node to a named conductor, logic.py:1617-1620).
_METAL_IOR_NAMES = {"gold": "Au", "silver": "Ag", "copper": "Cu",
                    "aluminium": "Al", "aluminum": "Al"}


def _material_props(mat):
  props = {"cls": "principled", "base_color": (0.8, 0.8, 0.8),
           "roughness": 0.5, "metalness": 0.0, "transmission": 0.0,
           "ior": 1.5, "opacity": 1.0, "maps": {}}
  if mat is None or not mat.use_nodes:
    return props
  # custom property escape hatch: spectral IOR by database name
  ior_name = mat.get("etx_ior") if hasattr(mat, "get") else None
  if ior_name:
    props["ior_name"] = str(ior_name)
  for node in mat.node_tree.nodes:
    if node.type == "BSDF_PRINCIPLED":
      def val(name, default):
        s = node.inputs.get(name)
        return float(s.default_value) if s is not None else default

      base = node.inputs.get("Base Color")
      if base is not None:
        props["base_color"] = tuple(base.default_value)[:3]
      props["roughness"] = val("Roughness", 0.5)
      props["metalness"] = val("Metallic", 0.0)
      props["transmission"] = val("Transmission Weight", val("Transmission", 0.0))
      props["ior"] = val("IOR", 1.5)
      props["opacity"] = val("Alpha", 1.0)
      em = node.inputs.get("Emission Color") or node.inputs.get("Emission")
      if em is not None:
        props["emission"] = tuple(em.default_value)[:3]
        props["emission_strength"] = val("Emission Strength", 0.0)
        # Blackbody node feeding emission -> exact spectral emitter
        if em.is_linked and em.links and em.links[0].from_node.type == "BLACKBODY":
          bb = em.links[0].from_node
          props["emission_blackbody"] = {
              "temperature": float(bb.inputs["Temperature"].default_value),
              "strength": val("Emission Strength", 1.0),
              "normalized": True,
          }
      # subsurface: Weight>0 turns on the random-walk block
      # (reference logic.py:1462 socket aliases; loader `subsurface` token)
      sss_w = val("Subsurface Weight", val("Subsurface", 0.0))
      if sss_w > 1e-5:
        radius = node.inputs.get("Subsurface Radius")
        dist = tuple(radius.default_value)[:3] if radius is not None \
            else (1.0, 0.2, 0.04)
        props["subsurface"] = {
            "distances": dist,
            "scale": sss_w * val("Subsurface Scale", 1.0),
        }
      # thin film (Blender 4.2+ principled sockets)
      tf_thick = val("Thin Film Thickness", 0.0)
      if tf_thick > 1e-3:
        props["thinfilm"] = {
            "min_nm": tf_thick, "max_nm": tf_thick,
            "ior": val("Thin Film IOR", 1.33),
        }
      if props["metalness"] > 0.999 and "ior_name" not in props:
        # fully-metallic principled: prefer a named spectral conductor
        # when the material name hints at one
        lname = mat.name.lower()
        for hint, db_name in _METAL_IOR_NAMES.items():
          if hint in lname:
            props["ior_name"] = db_name
            break
      break
    if node.type == "BSDF_GLASS":
      props["cls"] = "dielectric"
    elif node.type == "BSDF_DIFFUSE":
      props["cls"] = "diffuse"
    elif node.type == "BSDF_METALLIC":
      props["cls"] = "conductor"
      props["ior_name"] = "Ag"
      lname = mat.name.lower()
      for hint, db_name in _METAL_IOR_NAMES.items():
        if hint in lname:
          props["ior_name"] = db_name
          break
  return props


def _extract_medium(mat, used_ids):
  """Volume Absorption / Volume Scatter nodes -> et::medium entry
  (reference logic.py:1839-1926). Returns (medium dict | None, id | None)."""
  if mat is None or not mat.use_nodes or mat.node_tree is None:
    return None, None
  output = None
  for node in mat.node_tree.nodes:
    if node.type == "OUTPUT_MATERIAL" and node.is_active_output:
      output = node
      break
  if output is None or "Volume" not in output.inputs \
      or not output.inputs["Volume"].is_linked:
    return None, None

  absorption = None
  scattering = None
  anisotropy = 0.0

  def walk(node):
    nonlocal absorption, scattering, anisotropy
    if node is None:
      return
    if node.type == "VOLUME_ABSORPTION":
      c = node.inputs["Color"].default_value
      d = float(node.inputs["Density"].default_value)
      absorption = [float(c[0]) * d, float(c[1]) * d, float(c[2]) * d]
      return
    if node.type == "VOLUME_SCATTER":
      c = node.inputs["Color"].default_value
      d = float(node.inputs["Density"].default_value)
      scattering = [float(c[0]) * d, float(c[1]) * d, float(c[2]) * d]
      aniso = node.inputs.get("Anisotropy")
      if aniso is not None:
        anisotropy = float(aniso.default_value)
      return
    for inp in node.inputs:
      if getattr(inp, "is_linked", False) and inp.links:
        walk(inp.links[0].from_node)

  walk(output.inputs["Volume"].links[0].from_node)
  if absorption is None and scattering is None:
    return None, None
  base = mat.name.replace(" ", "_") + "__vol"
  mid = base
  i = 1
  while mid in used_ids:
    mid = f"{base}_{i}"
    i += 1
  used_ids.add(mid)
  return {"id": mid, "absorption": absorption, "scattering": scattering,
          "anisotropy": anisotropy}, mid


def _camera_data(scene):
  cam_obj = scene.camera
  if cam_obj is None:
    return None
  cam = cam_obj.data
  mw = cam_obj.matrix_world
  origin = mw.translation
  fwd = mw.to_quaternion() @ bpy.app.mathutils_Vector((0, 0, -1)) \
      if hasattr(bpy.app, "mathutils_Vector") else None
  import mathutils
  fwd = mw.to_quaternion() @ mathutils.Vector((0.0, 0.0, -1.0))
  up = mw.to_quaternion() @ mathutils.Vector((0.0, 1.0, 0.0))
  rx = scene.render.resolution_x
  ry = scene.render.resolution_y
  fov = math.degrees(cam.angle_x)
  data = {
      "origin": tuple(origin), "target": tuple(origin + fwd),
      "up": tuple(up), "fov": fov, "width": rx, "height": ry,
      "panoramic": cam.type == "PANO",
      "focal_length_mm": cam.lens,
  }
  if cam.dof and cam.dof.use_dof:
    data["fstop"] = cam.dof.aperture_fstop
    data["focus_distance"] = cam.dof.focus_distance
  return data


class ExportEtxTracerTPU(bpy.types.Operator, ExportHelper):
  bl_idname = "export_scene.etx_tracer_tpu"
  bl_label = "Export etx-tracer-tpu"
  filename_ext = ".json"
  filter_glob: StringProperty(default="*.json", options={"HIDDEN"})
  samples: IntProperty(name="Samples", default=256, min=1)
  max_path_length: IntProperty(name="Max path length", default=65535, min=1)

  def execute(self, context):
    json_path = self.filepath
    base = os.path.splitext(json_path)[0]
    obj_path = base + ".obj"
    mtl_path = base + ".mtl"
    depsgraph = context.evaluated_depsgraph_get()

    meshes = []
    materials = {}
    mediums = []
    used_medium_ids = set()
    # a material shared by N objects must emit exactly ONE medium block
    # (and point every instance's int_medium at it), so cache per material
    medium_by_material = {}
    for obj in context.scene.objects:
      if obj.type != "MESH" or obj.hide_render:
        continue
      m = _collect_mesh(obj, depsgraph)
      meshes.append(m)
      mat = obj.active_material
      props = _material_props(mat)
      mat_key = mat.name if mat is not None else None
      if mat_key in medium_by_material:
        mid = medium_by_material[mat_key]
      else:
        med, mid = _extract_medium(mat, used_medium_ids)
        if med is not None:
          mediums.append(med)
        medium_by_material[mat_key] = mid
      if mid is not None:
        props["int_medium"] = mid
      materials[m["material"]] = props

    blocks = []
    cam = _camera_data(context.scene)
    if cam is not None:
      blocks.append(serialize.camera_block(cam))
    world = context.scene.world
    if world is not None and world.use_nodes:
      for node in world.node_tree.nodes:
        if node.type == "BACKGROUND":
          rgb = tuple(node.inputs[0].default_value)[:3]
          strength = float(node.inputs[1].default_value)
          blocks.append(serialize.env_block([c * strength for c in rgb]))
          break
    for obj in context.scene.objects:
      if obj.type == "LIGHT" and obj.data.type == "SUN":
        import mathutils
        d = obj.matrix_world.to_quaternion() @ mathutils.Vector((0, 0, -1))
        e = obj.data.energy
        c = tuple(obj.data.color)[:3]
        blocks.append(serialize.sun_block((-d.x, -d.y, -d.z),
                                          [ci * e for ci in c]))
    # medium blocks precede the materials that reference them — the loader
    # resolves int_medium/ext_medium by name at parse time
    for med in mediums:
      blocks.append(serialize.medium_block(med))
    for name, props in materials.items():
      blocks.append(serialize.material_block(name, props))

    serialize.write_obj(obj_path, meshes)
    with open(mtl_path, "w") as f:
      f.write("\n".join(blocks))
    serialize.write_scene_json(json_path, obj_path, mtl_path,
                               self.samples, self.max_path_length)
    self.report({"INFO"}, f"exported {json_path}")
    return {"FINISHED"}


def menu_func(self, context):
  self.layout.operator(ExportEtxTracerTPU.bl_idname,
                       text="etx-tracer-tpu (.json/.obj/.mtl)")


def register():
  bpy.utils.register_class(ExportEtxTracerTPU)
  bpy.types.TOPBAR_MT_file_export.append(menu_func)


def unregister():
  bpy.types.TOPBAR_MT_file_export.remove(menu_func)
  bpy.utils.unregister_class(ExportEtxTracerTPU)
