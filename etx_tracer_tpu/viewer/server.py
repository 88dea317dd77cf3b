"""Interactive progressive web viewer.

TPU-native replacement for the reference's sokol/ImGui app
(raytracer/app.cxx, ui.cxx, camera_controller.hxx, render.cxx): a stdlib
HTTP server drives a background render thread; the browser canvas polls
tonemapped PNG frames. Camera moves drop to a pixel_size preview and
restart accumulation (app.cxx:131-142); options mirror the UI's integrator
picker, exposure and path-length controls.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>etx-tracer-tpu</title><style>
body{background:#111;color:#ccc;font-family:monospace;margin:0;display:flex}
#side{width:240px;padding:12px}
#view{flex:1;display:flex;align-items:center;justify-content:center;height:100vh}
canvas{image-rendering:pixelated;max-width:100%;max-height:100%}
label{display:block;margin-top:8px;font-size:12px}
input,select{width:100%}
#stats{margin-top:12px;font-size:11px;white-space:pre}
</style></head><body>
<div id="side">
  <b>etx-tracer-tpu</b>
  <label>integrator
    <select id="integrator"><option>pt</option><option>vcm</option><option>bdpt</option><option>lt</option></select>
  </label>
  <label>exposure <input id="exposure" type="range" min="-4" max="4" step="0.1" value="0"></label>
  <label>max path <input id="maxpath" type="number" value="8" min="1" max="64"></label>
  <div id="stats"></div>
  <p style="font-size:11px">drag: orbit &middot; shift-drag: pan<br>wheel: dolly &middot; WASD: move</p>
</div>
<div id="view"><canvas id="c"></canvas></div>
<script>
const c = document.getElementById('c'), ctx2 = () => c.getContext('2d');
let busy = false;
async function refresh(){
  if (busy) return; busy = true;
  try{
    const r = await fetch('/frame?exposure=' + Math.pow(2, exposure.value));
    const blob = await r.blob();
    const img = await createImageBitmap(blob);
    c.width = img.width; c.height = img.height;
    ctx2().drawImage(img, 0, 0);
    const s = await (await fetch('/status')).json();
    document.getElementById('stats').textContent =
      'iteration ' + s.iteration + '\\n' + s.width + 'x' + s.height +
      '\\n' + (s.preview ? 'preview' : 'accumulating');
  } finally { busy = false; }
}
setInterval(refresh, 250);
async function post(url, data){ await fetch(url, {method:'POST', body: JSON.stringify(data)}); }
let drag = null;
c.addEventListener('mousedown', e => drag = {x: e.clientX, y: e.clientY, pan: e.shiftKey});
window.addEventListener('mouseup', () => drag = null);
window.addEventListener('mousemove', e => {
  if (!drag) return;
  const dx = e.clientX - drag.x, dy = e.clientY - drag.y;
  drag.x = e.clientX; drag.y = e.clientY;
  post('/camera', drag.pan ? {pan: [dx, dy]} : {orbit: [dx, dy]});
});
c.addEventListener('wheel', e => { e.preventDefault(); post('/camera', {dolly: e.deltaY}); });
window.addEventListener('keydown', e => {
  const m = {w:[0,0,1], s:[0,0,-1], a:[-1,0,0], d:[1,0,0], q:[0,-1,0], e:[0,1,0]}[e.key];
  if (m) post('/camera', {move: m});
});
integrator.addEventListener('change', () => post('/options', {integrator: integrator.value}));
maxpath.addEventListener('change', () => post('/options', {max_path: +maxpath.value}));
</script></body></html>"""


class ViewerState:
  """Render-thread state machine (Integrator Stopped/Running/Preview,
  rt/integrators/integrator.hxx:12-98)."""

  def __init__(self, builder, integrator="pt", preview_pixel_size=8):
    self.builder = builder
    self.integrator = integrator
    self.preview_pixel_size = preview_pixel_size
    self.lock = threading.Lock()
    self.dirty = True          # camera/options changed -> restart
    self.preview = True
    self.iteration = 0
    self.image = np.zeros((builder.film_size[1], builder.film_size[0], 3), np.float32)
    self.running = True
    self.last_move = 0.0
    # orbit state around the camera target
    self.origin = np.array(builder.camera_origin, np.float32)
    self.target = np.array(builder.camera_target, np.float32)
    self.up = np.array(builder.camera_up, np.float32)

  # -- camera controller (raytracer/camera_controller.hxx:9-159) ----------

  def orbit(self, dx, dy):
    v = self.origin - self.target
    r = np.linalg.norm(v)
    theta = np.arctan2(v[0], v[2]) - dx * 0.01
    phi = np.arccos(np.clip(v[1] / max(r, 1e-6), -1, 1)) - dy * 0.01
    phi = np.clip(phi, 0.05, np.pi - 0.05)
    self.origin = self.target + r * np.array(
        [np.sin(phi) * np.sin(theta), np.cos(phi), np.sin(phi) * np.cos(theta)],
        np.float32)
    self._moved()

  def pan(self, dx, dy):
    fwd = self.target - self.origin
    fwd /= max(np.linalg.norm(fwd), 1e-6)
    side = np.cross(fwd, self.up)
    side /= max(np.linalg.norm(side), 1e-6)
    upv = np.cross(side, fwd)
    d = (-dx * side + dy * upv) * 0.005 * max(np.linalg.norm(self.target - self.origin), 0.1)
    self.origin += d
    self.target += d
    self._moved()

  def dolly(self, amount):
    v = self.origin - self.target
    self.origin = self.target + v * float(np.exp(amount * 0.001))
    self._moved()

  def move(self, m):
    fwd = self.target - self.origin
    fwd /= max(np.linalg.norm(fwd), 1e-6)
    side = np.cross(fwd, self.up)
    side /= max(np.linalg.norm(side), 1e-6)
    step = (m[0] * side + m[1] * self.up + m[2] * fwd) * 0.1 \
        * max(np.linalg.norm(self.target - self.origin), 0.1)
    self.origin += step
    self.target += step
    self._moved()

  def _moved(self):
    with self.lock:
      self.dirty = True
      self.preview = True
      self.last_move = time.time()

  # -- render thread -------------------------------------------------------

  def _build(self):
    self.builder.set_camera(self.origin, self.target, self.up,
                            self.builder.camera_fov, self.builder.film_size,
                            lens_radius=self.builder.lens_radius,
                            focal_distance=self.builder.focal_distance)
    return self.builder.build()

  def render_loop(self):
    from etx_tracer_tpu.models import path_tracing
    scene, config = self._build()
    sums = None
    vcm_fs = None
    iters_done = 0
    while self.running:
      with self.lock:
        dirty = self.dirty
        self.dirty = False
      if dirty:
        scene, config = self._build()
        sums = None
        vcm_fs = None
        iters_done = 0
      if self.preview and (time.time() - self.last_move < 0.4 or iters_done == 0):
        img = np.asarray(path_tracing.render_preview(
            scene, config, pixel_size=self.preview_pixel_size, iterations=1))
        with self.lock:
          if not self.dirty:
            self.image = img
            self.iteration = 0
            self.preview = False if time.time() - self.last_move > 0.4 else self.preview
        continue
      # accumulate one batch of full-res iterations
      if self.integrator in ("vcm", "bdpt", "lt"):
        from etx_tracer_tpu.models import vcm as vcm_mod
        from etx_tracer_tpu.render import film as film_mod
        opts = {"bdpt": vcm_mod.bdpt_options,
                "lt": vcm_mod.light_tracing_options}.get(self.integrator)
        options = opts() if opts else vcm_mod.VCMOptions()
        if vcm_fs is None:
          vcm_fs = film_mod.allocate(config.film_width, config.film_height)
        vcm_fs = vcm_mod.render_iteration(scene, config, options, vcm_fs, iters_done)
        img = np.asarray(film_mod.result_image(vcm_fs))
        iters_done += 1
      else:
        batch = 1
        new_sums, _ = path_tracing.render_samples_static(
            scene, config, iters_done, batch)
        sums = new_sums if sums is None else path_tracing.FilmSums(sums.table + new_sums.table)
        iters_done += batch
        img = np.asarray(path_tracing.finalize_film(sums, iters_done, config.film_width).camera)
      with self.lock:
        if not self.dirty:
          self.image = img
          self.iteration = iters_done
          self.preview = False


def serve(builder, host="127.0.0.1", port=8612, open_browser=False):
  from etx_tracer_tpu.utils import image_io

  state = ViewerState(builder)
  thread = threading.Thread(target=state.render_loop, daemon=True)
  thread.start()

  class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
      pass

    def _send(self, code, body, ctype="text/html"):
      self.send_response(code)
      self.send_header("Content-Type", ctype)
      self.send_header("Content-Length", str(len(body)))
      self.end_headers()
      self.wfile.write(body)

    def do_GET(self):
      if self.path.startswith("/frame"):
        exposure = 1.0
        if "exposure=" in self.path:
          try:
            exposure = float(self.path.split("exposure=")[1].split("&")[0])
          except ValueError:
            pass
        with state.lock:
          img = state.image
        self._send(200, image_io.encode_png(img, exposure=exposure), "image/png")
      elif self.path.startswith("/status"):
        with state.lock:
          body = json.dumps({
              "iteration": state.iteration,
              "preview": state.preview,
              "width": int(state.image.shape[1]),
              "height": int(state.image.shape[0]),
          }).encode()
        self._send(200, body, "application/json")
      else:
        self._send(200, _PAGE.encode())

    def do_POST(self):
      n = int(self.headers.get("Content-Length", 0))
      data = json.loads(self.rfile.read(n) or b"{}")
      if self.path == "/camera":
        if "orbit" in data:
          state.orbit(*data["orbit"])
        elif "pan" in data:
          state.pan(*data["pan"])
        elif "dolly" in data:
          state.dolly(data["dolly"])
        elif "move" in data:
          state.move(data["move"])
      elif self.path == "/options":
        if "integrator" in data:
          state.integrator = data["integrator"]
          state._moved()
        if "max_path" in data:
          state.builder.max_path_length = int(data["max_path"])
          state._moved()
      self._send(200, b"{}", "application/json")

  server = ThreadingHTTPServer((host, port), Handler)
  print(f"[etx-tpu] viewer at http://{host}:{port}")
  try:
    server.serve_forever()
  except KeyboardInterrupt:
    pass
  finally:
    state.running = False
  return server
