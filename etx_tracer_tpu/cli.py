"""Headless command-line renderer.

The app-layer replacement for the reference's interactive raytracer
(sources/raytracer/) in headless form: load a scene (JSON/OBJ), render with
a chosen integrator, write EXR/PNG, optionally compare against a reference
image (the viewer's diff modes, raytracer/options.hxx:9-18).

Usage:
  python -m etx_tracer_tpu.cli render scene.json -o out.exr [--spp N]
      [--integrator pt|bdpt|bdpt-fast|vcm|lt|debug] [--size WxH] [--spectral]
      [--aov normals] [--adaptive] [--devices N]
  python -m etx_tracer_tpu.cli compare a.exr b.exr
  python -m etx_tracer_tpu.cli cornell -o out.png   (built-in sample scene)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _load(path, args):
  from etx_tracer_tpu.scene import json_scene
  b = json_scene.load_scene(path)
  if args.size:
    w, h = args.size.lower().split("x")
    b.film_size = (int(w), int(h))
  if args.spp:
    b.samples = args.spp
  if args.spectral:
    b.spectral = True
  if args.max_path:
    b.max_path_length = args.max_path
  return b.build()


def _render_image(scene, config, args):
  """Dispatch to the selected integrator (the reference registers every
  integrator in the app, raytracer/app.hxx:72-82). Returns (H,W,3) np."""
  import numpy as np
  from etx_tracer_tpu.models import path_tracing
  from etx_tracer_tpu.render import film as film_mod

  spp = args.spp or config.samples
  kind = args.integrator

  if kind == "debug":
    from etx_tracer_tpu.models import debug as debug_mod
    mode = getattr(debug_mod.DebugMode, args.aov.capitalize(),
                   debug_mod.DebugMode.Normals)
    return np.asarray(debug_mod.render_debug(scene, config, mode))

  if kind in ("vcm", "bdpt", "bdpt-fast", "lt"):
    from etx_tracer_tpu.models import vcm
    options = {
        "vcm": vcm.VCMOptions(),
        "bdpt": vcm.bdpt_options(),
        "bdpt-fast": vcm.bdpt_fast_options(),
        "lt": vcm.light_tracing_options(),
    }[kind]
    adaptive = args.adaptive
    if adaptive and kind == "lt":
      # light tracing fills only the light layer; the adaptive stop tests
      # camera-layer variance, which is identically zero for lt and would
      # silently end the render at min_samples regardless of --spp
      print("[etx-tpu] --adaptive is camera-layer based and does not apply "
            "to the lt integrator; rendering all requested samples",
            file=sys.stderr)
      adaptive = False
    if adaptive:
      fs, _counts = vcm.render_adaptive(scene, config, options=options,
                                        max_iterations=spp)
    else:
      fs = vcm.render(scene, config, options=options, iterations=spp)
    return np.asarray(film_mod.result_image(fs))

  # unidirectional PT variants
  if args.devices and args.devices > 1:
    from etx_tracer_tpu.parallel import mesh as parallel
    mesh = parallel.make_mesh()
    n_dev = len(mesh.devices.flat)
    if n_dev < args.devices:
      print(f"[etx-tpu] only {n_dev} device(s) visible; using {n_dev}",
            file=sys.stderr)
    scene_r = parallel.replicate_scene(scene, mesh)
    sums, _ = parallel.render_samples_sharded(scene_r, config, 0, spp, mesh)
    fin = path_tracing.finalize_film(sums, spp, config.film_width)
    return np.asarray(fin.camera)
  if args.adaptive:
    fs = path_tracing.render_adaptive(scene, config, max_iterations=spp)
    return np.asarray(film_mod.result_image(fs))
  fs = path_tracing.render(scene, config, iterations=spp)
  return np.asarray(film_mod.result_image(fs))


def cmd_render(args):
  from etx_tracer_tpu.utils import image_io, prefs

  if args.scene == "recent":
    recent = prefs.recent_files()
    if not recent:
      print("[etx-tpu] no recent scene files", file=sys.stderr)
      return
    args.scene = recent[0]
    print(f"[etx-tpu] rendering most recent scene: {args.scene}",
          file=sys.stderr)
  if os.path.exists(args.scene):
    prefs.add_recent(args.scene, integrator=args.integrator)
  scene, config = _load(args.scene, args)
  print(f"[etx-tpu] scene loaded: {int(scene.tri_idx.shape[0])} triangles, "
        f"{config.film_width}x{config.film_height}, {config.samples} spp, "
        f"classes={config.material_classes}", file=sys.stderr)

  t0 = time.time()
  img = _render_image(scene, config, args)
  print(f"[etx-tpu] {args.integrator} rendered in {time.time() - t0:.1f}s",
        file=sys.stderr)

  out = args.output or "out.exr"
  if out.endswith(".png"):
    image_io.save_png(out, img)
  else:
    image_io.save_exr(out, img)
  print(f"[etx-tpu] wrote {out}", file=sys.stderr)

  if args.reference:
    ref = image_io.load_exr(args.reference)
    r = image_io.rmse(ref, img[::-1])
    print(json.dumps({"rmse_vs_reference": r}))


def cmd_cornell(args):
  import numpy as np
  from etx_tracer_tpu.models import path_tracing
  from etx_tracer_tpu.render import film as film_mod
  from etx_tracer_tpu.scene import cornell
  from etx_tracer_tpu.utils import image_io

  size = tuple(int(x) for x in (args.size or "512x512").lower().split("x"))
  b = cornell.build_cornell_box(film_size=size, samples=args.spp or 32,
                                spectral=args.spectral)
  scene, config = b.build()
  t0 = time.time()
  fs = path_tracing.render(scene, config)
  img = np.asarray(film_mod.result_image(fs))
  print(f"[etx-tpu] cornell {size[0]}x{size[1]} @ {config.samples}spp in "
        f"{time.time() - t0:.1f}s", file=sys.stderr)
  out = args.output or "cornell.png"
  (image_io.save_png if out.endswith(".png") else image_io.save_exr)(out, img)
  print(f"[etx-tpu] wrote {out}", file=sys.stderr)


def cmd_compare(args):
  from etx_tracer_tpu.utils import image_io
  a = image_io.load_exr(args.a)
  b = image_io.load_exr(args.b)
  print(json.dumps({"rmse": image_io.rmse(a, b)}))


def cmd_view(args):
  from etx_tracer_tpu.viewer import server as viewer_server
  if args.scene == "cornell":
    from etx_tracer_tpu.scene import cornell
    size = (512, 512)
    if args.size:
      w, h = args.size.lower().split("x")
      size = (int(w), int(h))
    b = cornell.build_cornell_box(film_size=size, max_path_length=8)
  else:
    from etx_tracer_tpu.scene import json_scene
    from etx_tracer_tpu.utils import prefs
    b = json_scene.load_scene(args.scene)
    if args.size:
      w, h = args.size.lower().split("x")
      b.film_size = (int(w), int(h))
    prefs.add_recent(args.scene)
  viewer_server.serve(b, port=args.port)


def main(argv=None):
  p = argparse.ArgumentParser(prog="etx-tpu")
  sub = p.add_subparsers(dest="cmd", required=True)

  pr = sub.add_parser("render")
  pr.add_argument("scene", help="scene file, 'cornell', or 'recent' (most recent from prefs)")
  pr.add_argument("-o", "--output", default=None)
  pr.add_argument("--spp", type=int, default=None)
  pr.add_argument("--size", default=None)
  pr.add_argument("--max-path", type=int, default=None, dest="max_path")
  pr.add_argument("--spectral", action="store_true")
  pr.add_argument("--integrator", default="pt",
                  choices=["pt", "bdpt", "bdpt-fast", "vcm", "lt", "debug"])
  pr.add_argument("--aov", default="normals")
  pr.add_argument("--adaptive", action="store_true",
                  help="adaptive per-pixel sampling (pt/vcm/bdpt; "
                       "ignored for lt, whose camera layer is empty)")
  pr.add_argument("--devices", type=int, default=None,
                  help="shard over N devices (pt only)")
  pr.add_argument("--reference", default=None)
  pr.set_defaults(fn=cmd_render)

  pc = sub.add_parser("cornell")
  pc.add_argument("-o", "--output", default=None)
  pc.add_argument("--spp", type=int, default=None)
  pc.add_argument("--size", default=None)
  pc.add_argument("--spectral", action="store_true")
  pc.set_defaults(fn=cmd_cornell)

  pm = sub.add_parser("compare")
  pm.add_argument("a")
  pm.add_argument("b")
  pm.set_defaults(fn=cmd_compare)

  pv = sub.add_parser("view")
  pv.add_argument("scene", nargs="?", default="cornell")
  pv.add_argument("--port", type=int, default=8612)
  pv.add_argument("--size", default=None)
  pv.set_defaults(fn=cmd_view)

  args = p.parse_args(argv)
  args.fn(args)


if __name__ == "__main__":
  main()
