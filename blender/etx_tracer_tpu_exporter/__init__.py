"""Blender exporter for etx-tracer-tpu scenes.

Counterpart of the reference's Blender addon (blender/etx_tracer_exporter):
exports the active Blender scene to OBJ + extended MTL (`et::` directives)
plus a scene JSON that etx_tracer_tpu.scene.json_scene / obj_loader load.

Install: zip this folder and use Blender's "Install Add-on", or copy it to
the Blender addons directory.
"""

bl_info = {
    "name": "etx-tracer-tpu exporter",
    "author": "etx-tracer-tpu",
    "version": (0, 1, 0),
    "blender": (3, 0, 0),
    "location": "File > Export > etx-tracer-tpu (.json/.obj/.mtl)",
    "description": "Export scene to etx-tracer-tpu",
    "category": "Import-Export",
}

try:
  import bpy  # noqa: F401
  _HAS_BPY = True
except ImportError:
  _HAS_BPY = False

if _HAS_BPY:
  from etx_tracer_tpu_exporter.operator import register, unregister  # noqa
else:
  def register():
    raise RuntimeError("bpy not available — run inside Blender")

  def unregister():
    pass
