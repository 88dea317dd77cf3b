"""bpy-independent serialization: meshes/materials/camera -> OBJ/MTL/JSON.

Kept separate from the operator so it is unit-testable outside Blender
(the reference folds this into logic.py's _export_obj/_export_materials).
"""

from __future__ import annotations

import json
import os


def linear_to_srgb(x: float) -> float:
  if x <= 0.0031308:
    return 12.92 * x
  return 1.055 * (max(x, 0.0) ** (1.0 / 2.4)) - 0.055


def fmt_rgb(rgb) -> str:
  return " ".join(f"{float(c):.6f}" for c in rgb[:3])


def sanitize_name(name: str) -> str:
  out = []
  for ch in name:
    out.append(ch if (ch.isalnum() or ch in "_-.") else "_")
  s = "".join(out)
  return s or "material"


def write_obj(path: str, meshes: list) -> None:
  """meshes: [{name, material, vertices [(x,y,z)], normals, uvs,
  faces [((vi,ti,ni), ...)]}]. Indices are 0-based per mesh."""
  lines = ["# exported by etx-tracer-tpu blender addon"]
  v_off = 1
  vt_off = 1
  vn_off = 1
  for m in meshes:
    lines.append(f"o {sanitize_name(m['name'])}")
    for v in m["vertices"]:
      lines.append(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}")
    for vt in m.get("uvs", []):
      lines.append(f"vt {vt[0]:.6f} {vt[1]:.6f}")
    for vn in m.get("normals", []):
      lines.append(f"vn {vn[0]:.6f} {vn[1]:.6f} {vn[2]:.6f}")
    lines.append(f"usemtl {sanitize_name(m['material'])}")
    has_uv = bool(m.get("uvs"))
    has_n = bool(m.get("normals"))
    for face in m["faces"]:
      toks = []
      for (vi, ti, ni) in face:
        t = str(vi + v_off)
        if has_uv or has_n:
          t += "/" + (str(ti + vt_off) if has_uv and ti is not None else "")
          if has_n and ni is not None:
            t += "/" + str(ni + vn_off)
        toks.append(t)
      lines.append("f " + " ".join(toks))
    v_off += len(m["vertices"])
    vt_off += len(m.get("uvs", []))
    vn_off += len(m.get("normals", []))
  with open(path, "w") as f:
    f.write("\n".join(lines) + "\n")


def material_block(name: str, props: dict) -> str:
  """Extended-MTL block from a property dict (reference logic.py:97-246,
  1421-1663 — principled/glass/glossy/metallic/volume node extraction).

  props keys: cls, base_color (linear rgb), roughness, metalness,
  transmission, ior, ior_name (spectral IOR name, e.g. "Au" — wins over
  the scalar ior), emission (linear rgb), emission_strength,
  emission_blackbody {temperature, strength, normalized}, opacity,
  maps {kd, normal, roughness, metalness, transmission}, two_sided,
  int_medium / ext_medium (ids of medium_block entries),
  subsurface {distances (r,g,b), scale, approximate},
  thinfilm {min_nm, max_nm, ior (scalar or spectral name)}.
  """
  lines = [f"newmtl {sanitize_name(name)}"]
  cls = props.get("cls", "principled")
  lines.append(f"material class {cls}")
  base = props.get("base_color", (0.8, 0.8, 0.8))
  srgb = [linear_to_srgb(c) for c in base[:3]]
  lines.append("Kd " + fmt_rgb(srgb))
  if props.get("transmission", 0.0) > 0.0 or cls in ("dielectric", "translucent"):
    lines.append("Kt " + fmt_rgb(srgb))
  rough = props.get("roughness", 0.5)
  if rough > 1e-5:
    lines.append(f"Pr {rough:.6f}")
  if props.get("metalness", 0.0) > 1e-5:
    lines.append(f"metalness {props['metalness']:.6f}")
  if props.get("transmission", 0.0) > 1e-5:
    lines.append(f"transmission {props['transmission']:.6f}")
  if props.get("ior_name"):
    # spectral IOR by database name (reference logic.py:1617-1620)
    lines.append(f"int_ior {props['ior_name']}")
  elif abs(props.get("ior", 1.5) - 1.5) > 1e-5:
    lines.append(f"int_ior {props['ior']:.6f}")
  if props.get("opacity", 1.0) < 1.0:
    lines.append(f"opacity {props['opacity']:.6f}")
  if props.get("int_medium"):
    lines.append(f"int_medium {props['int_medium']}")
  if props.get("ext_medium"):
    lines.append(f"ext_medium {props['ext_medium']}")
  sss = props.get("subsurface")
  if sss:
    d = sss.get("distances", (1.0, 0.2, 0.04))
    tok = (f"subsurface distances {d[0]:.6f} {d[1]:.6f} {d[2]:.6f}"
           f" scale {sss.get('scale', 1.0):.6f}")
    if sss.get("approximate"):
      tok += " class approximate"
    lines.append(tok)
  tf = props.get("thinfilm")
  if tf:
    ior = tf.get("ior", 1.5)
    ior_tok = ior if isinstance(ior, str) else f"{ior:.6f}"
    lines.append(f"thinfilm range {tf.get('min_nm', 100.0):.3f} "
                 f"{tf.get('max_nm', 400.0):.3f} ior {ior_tok}")
  bb = props.get("emission_blackbody")
  em_rgb = props.get("emission")
  em_s = props.get("emission_strength", 0.0)
  if bb is not None:
    kind = "nblackbody" if bb.get("normalized", True) else "blackbody"
    tok = (f"emitter {kind} {bb['temperature']:.0f}"
           f" scale {bb.get('strength', 1.0):.6f}")
    if props.get("two_sided"):
      tok += " twosided"
    lines.append(tok)
  elif em_rgb is not None and em_s > 0.0 and max(em_rgb[:3]) > 0.0:
    scaled = [c * em_s for c in em_rgb[:3]]
    tok = "emitter color " + fmt_rgb(scaled)
    if props.get("two_sided"):
      tok += " twosided"
    lines.append(tok)
  maps = props.get("maps", {})
  if maps.get("kd"):
    lines.append(f"map_Kd {maps['kd']}")
  if maps.get("roughness"):
    lines.append(f"map_Pr {maps['roughness']}")
  if maps.get("metalness"):
    lines.append(f"map_Ml {maps['metalness']}")
  if maps.get("transmission"):
    lines.append(f"map_Tm {maps['transmission']}")
  if maps.get("normal"):
    lines.append(f"normalmap image {maps['normal']}")
  return "\n".join(lines) + "\n"


def medium_block(med: dict) -> str:
  """et::medium block (reference logic.py:1839-1926 volume-node extraction;
  parsed by scene/obj_loader.py:_parse_medium).

  med keys: id, absorption (rgb), scattering (rgb), anisotropy, volume
  (optional grid path), enclosed (bool: no explicit boundary connections).
  """
  lines = ["newmtl et::medium", f"id {med['id']}"]
  if med.get("absorption") is not None:
    lines.append("absorption " + fmt_rgb(med["absorption"]))
  if med.get("scattering") is not None:
    lines.append("scattering " + fmt_rgb(med["scattering"]))
  g = med.get("anisotropy", 0.0)
  if abs(g) > 1e-6:
    lines.append(f"anisotropy {g:.6f}")
  if med.get("volume"):
    lines.append(f"volume {med['volume']}")
  if med.get("enclosed"):
    lines.append("enclosed 1")
  return "\n".join(lines) + "\n"


def camera_block(cam: dict) -> str:
  """et::camera block (reference logic.py:910-1040)."""
  lines = ["newmtl et::camera"]
  lines.append("class " + ("eq" if cam.get("panoramic") else "perspective"))
  lines.append(f"viewport {int(cam['width'])} {int(cam['height'])}")
  lines.append("origin " + fmt_rgb(cam["origin"]))
  lines.append("target " + fmt_rgb(cam["target"]))
  lines.append("up " + fmt_rgb(cam["up"]))
  lines.append(f"fov {cam['fov']:.6f}")
  if cam.get("fstop") and cam.get("focus_distance"):
    # aperture radius from f-stop: r = focal_length / (2 N)
    fl_mm = cam.get("focal_length_mm", 50.0)
    radius = (fl_mm / 1000.0) / (2.0 * cam["fstop"])
    lines.append(f"lens-radius {radius:.6f}")
    lines.append(f"focal-distance {cam['focus_distance']:.6f}")
  lines.append("id camera")
  lines.append("active 1")
  return "\n".join(lines) + "\n"


def sun_block(direction, rgb, angular_diameter_deg: float = 0.545) -> str:
  lines = ["newmtl et::dir"]
  lines.append("direction " + fmt_rgb(direction))
  lines.append("color " + fmt_rgb(rgb))
  lines.append(f"angular_diameter {angular_diameter_deg:.6f}")
  return "\n".join(lines) + "\n"


def env_block(rgb, image_path: str | None = None) -> str:
  lines = ["newmtl et::env"]
  if image_path:
    lines.append(f"image {image_path}")
  lines.append("color " + fmt_rgb(rgb))
  return "\n".join(lines) + "\n"


def write_scene_json(path: str, obj_file: str, mtl_file: str,
                     samples: int = 256, max_path_length: int = 65535) -> None:
  desc = {
      "geometry": os.path.basename(obj_file),
      "materials": os.path.basename(mtl_file),
      "samples": samples,
      "max-path-length": max_path_length,
  }
  with open(path, "w") as f:
    json.dump(desc, f, indent=2)
