"""Procedural scenes for the five BASELINE.json benchmark configs.

The reference ships only the Cornell asset; the other configs are built
procedurally to match their described content (BASELINE.md):
1. cornell_pt     — diffuse Cornell, RGB, unidirectional PT
2. materials      — conductor/dielectric/thinfilm showcase, area+env, spectral
3. atmosphere     — sun/sky atmosphere + DOF, spectral
4. volumetric     — heterogeneous density grid + random-walk SSS
5. caustics       — SDS caustics (glass ring), full VCM, spectral
"""

from __future__ import annotations

import numpy as np

from etx_tracer_tpu.core import spectrum as sp
from etx_tracer_tpu.scene import types as st
from etx_tracer_tpu.scene.builder import MaterialDesc, MediumDesc, SceneBuilder
from etx_tracer_tpu.scene.cornell import build_cornell_box


def cornell_pt(size=(512, 512)):
  b = build_cornell_box(film_size=size, diffuse_only=True, max_path_length=1023)
  return b


def materials(size=(512, 512), spectral=True):
  """Spheres-on-a-floor material showcase (config 2)."""
  from etx_tracer_tpu.scene import ior as ior_mod
  b = build_cornell_box(film_size=size, max_path_length=16)
  b.spectral = spectral
  db = ior_mod.IORDatabase()

  # conductor (gold)
  au = db.find("Au") or db.find("au")
  if au is not None:
    cls, eta, k = au
    e = b.add_spectrum(eta)
    kk = b.add_spectrum(k) if k is not None else -1
  else:
    e = b.add_spectrum(sp.SpectralDistribution.constant(0.2, sp.SpectralDistribution.CLASS_CONDUCTOR))
    kk = b.add_spectrum(sp.SpectralDistribution.constant(3.0, sp.SpectralDistribution.CLASS_CONDUCTOR))
  m_gold = b.add_material(MaterialDesc(
      name="gold", cls=st.MaterialClass.Conductor,
      reflectance_spec=1, roughness=(0.05, 0.05),
      int_ior_eta=e, int_ior_k=kk,
      int_ior_cls=sp.SpectralDistribution.CLASS_CONDUCTOR))

  glass_e = b.add_spectrum(sp.SpectralDistribution.constant(
      1.5, sp.SpectralDistribution.CLASS_DIELECTRIC))
  m_glass = b.add_material(MaterialDesc(
      name="glass", cls=st.MaterialClass.Dielectric,
      reflectance_spec=1, scattering_spec=1, int_ior_eta=glass_e))

  tf_eta = b.add_spectrum(sp.SpectralDistribution.constant(
      1.35, sp.SpectralDistribution.CLASS_DIELECTRIC))
  m_tf = b.add_material(MaterialDesc(
      name="bubble", cls=st.MaterialClass.Thinfilm,
      reflectance_spec=1, scattering_spec=1,
      thinfilm_eta=tf_eta, thinfilm_min=300.0, thinfilm_max=600.0))

  def icosphere(center, radius, order=2):
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                 np.int32)
    for _ in range(order):
      nv = list(v)
      cache = {}
      nf = []
      def mid(a, bb):
        key = (min(a, bb), max(a, bb))
        if key not in cache:
          m = v[a] + v[bb]
          m = m / np.linalg.norm(m)
          cache[key] = len(nv)
          nv.append(m)
        return cache[key]
      for (a, bb, cc) in f:
        ab, bc, ca = mid(a, bb), mid(bb, cc), mid(cc, a)
        nf += [[a, ab, ca], [bb, bc, ab], [cc, ca, bc], [ab, bc, ca]]
      v = np.asarray(nv)
      f = np.asarray(nf, np.int32)
    verts = v * radius + np.asarray(center)
    return verts.astype(np.float32), f, v.astype(np.float32)

  for c, r, m in [((-0.55, 0.35, 0.2), 0.35, m_gold),
                  ((0.0, 0.35, -0.3), 0.35, m_glass),
                  ((0.55, 0.35, 0.2), 0.35, m_tf)]:
    verts, fcs, nrms = icosphere(c, r)
    b.add_mesh(verts, fcs, m, normals=nrms)
  return b


def atmosphere_scene(size=(512, 512)):
  """Sun/sky + ground plane + DOF (config 3)."""
  from etx_tracer_tpu.scene import atmosphere as atm
  b = SceneBuilder()
  b.spectral = True
  ground = b.add_material(MaterialDesc(name="ground", cls=st.MaterialClass.Diffuse,
                                       scattering_spec=1))
  b.add_mesh(np.array([[-50, 0, -50], [50, 0, -50], [50, 0, 50], [-50, 0, 50]], np.float32),
             np.array([[0, 1, 2], [0, 2, 3]], np.int32), ground)
  box = b.add_material(MaterialDesc(name="box", cls=st.MaterialClass.Diffuse,
                                    scattering_spec=1))
  bv = np.array([[-.5, 0, -.5], [.5, 0, -.5], [.5, 1, -.5], [-.5, 1, -.5],
                 [-.5, 0, .5], [.5, 0, .5], [.5, 1, .5], [-.5, 1, .5]], np.float32)
  bf = np.array([[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 3, 7], [0, 7, 4],
                 [1, 5, 6], [1, 6, 2], [3, 2, 6], [3, 6, 7]], np.int32)
  b.add_mesh(bv, bf, box)
  atm.add_atmosphere(b, direction=(0.3, 0.6, 0.5))
  b.set_camera((4.0, 1.2, 4.0), (0.0, 0.5, 0.0), (0, 1, 0), 45.0, size,
               lens_radius=0.02, focal_distance=5.5)
  b.max_path_length = 8
  return b


def _cloud_vol_path():
  """Generate the benchmark cloud as a Mitsuba .vol file once, then LOAD it
  back through the production density-grid loader — config 4 must exercise
  the real .nvdb/.vol path (BASELINE.md config 4; medium_pool.cxx:94-150),
  not an in-memory array."""
  import os
  import struct

  from etx_tracer_tpu.scene.obj_loader import _load_density_grid

  def _expected_grid():
    rs = np.random.RandomState(7)
    g = rs.uniform(0.0, 1.0, (24, 24, 24)).astype(np.float32)
    # smooth + spherical falloff = cloud-ish
    z, y, x = np.mgrid[0:24, 0:24, 0:24].astype(np.float32) / 23.0 - 0.5
    g *= np.clip(1.0 - 2.2 * np.sqrt(x * x + y * y + z * z), 0.0, 1.0)
    return g

  # per-user cache dir (NOT the shared system tempdir, where a predictable
  # path could collide with or be pre-created by another user)
  cache_dir = os.path.join(
      os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
      "etx_tracer_tpu")
  os.makedirs(cache_dir, exist_ok=True)
  path = os.path.join(cache_dir, "etx_bench_cloud_v1.vol")
  if os.path.isfile(path):
    g = _load_density_grid(path)
    if g is not None and g.shape == (24, 24, 24) \
        and np.allclose(np.asarray(g), _expected_grid(), atol=1e-6):
      return path
  g = _expected_grid()
  with open(path, "wb") as f:
    f.write(b"VOL")
    f.write(bytes([3]))                                  # version
    f.write(struct.pack("<iiiii", 1, 24, 24, 24, 1))     # enc, res, ch
    f.write(struct.pack("<6f", -0.5, -0.5, -0.5, 0.5, 0.5, 0.5))
    f.write(np.ascontiguousarray(g).tobytes())           # z,y,x order
  return path


def volumetric(size=(384, 384)):
  """Heterogeneous cloud grid (via the .vol loader) + SSS object (config 4)."""
  from etx_tracer_tpu.scene.obj_loader import _load_density_grid
  g = _load_density_grid(_cloud_vol_path())
  assert g is not None and g.shape == (24, 24, 24)
  b = build_cornell_box(film_size=size, diffuse_only=True, max_path_length=10,
                        fog_grid=np.asarray(g, np.float32))
  # make the short box SSS
  import dataclasses as dc
  d = b.add_spectrum(sp.SpectralDistribution.rgb_reflectance([0.6, 0.3, 0.1]))
  for name, idx in b.material_names.items():
    if "box" in name:
      b.materials[idx] = dc.replace(b.materials[idx],
                                    subsurface_cls=st.SubsurfaceClass.RandomWalk,
                                    subsurface_spec=d)
  return b


def caustics(size=(512, 512), spectral=True):
  """Glass torus over a floor, small bright light: SDS caustics (config 5)."""
  b = build_cornell_box(film_size=size, max_path_length=16)
  b.spectral = spectral
  glass_e = b.add_spectrum(sp.SpectralDistribution.constant(
      1.52, sp.SpectralDistribution.CLASS_DIELECTRIC))
  m_glass = b.add_material(MaterialDesc(
      name="ring", cls=st.MaterialClass.Dielectric,
      reflectance_spec=1, scattering_spec=1, int_ior_eta=glass_e))

  # torus
  R, r = 0.45, 0.12
  nu, nv = 32, 16
  us = np.linspace(0, 2 * np.pi, nu, endpoint=False)
  vs = np.linspace(0, 2 * np.pi, nv, endpoint=False)
  verts = []
  nrms = []
  for u in us:
    cu, su = np.cos(u), np.sin(u)
    for v in vs:
      cv, sv = np.cos(v), np.sin(v)
      verts.append(((R + r * cv) * cu, r * sv + r + 0.01, (R + r * cv) * su))
      nrms.append((cv * cu, sv, cv * su))
  verts = np.asarray(verts, np.float32)
  nrms = np.asarray(nrms, np.float32)
  faces = []
  for i in range(nu):
    for j in range(nv):
      a = i * nv + j
      bq = i * nv + (j + 1) % nv
      c = ((i + 1) % nu) * nv + (j + 1) % nv
      d = ((i + 1) % nu) * nv + j
      faces += [[a, bq, c], [a, c, d]]
  b.add_mesh(verts, np.asarray(faces, np.int32), m_glass, normals=nrms)
  return b


def _icosphere_mesh(center, radius, order=3):
  """Subdivided icosahedron: verts, faces, unit normals."""
  t = (1.0 + np.sqrt(5.0)) / 2.0
  v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
  v /= np.linalg.norm(v, axis=1, keepdims=True)
  f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
               np.int32)
  for _ in range(order):
    nv = list(v)
    cache = {}
    nf = []

    def mid(a, bb):
      key = (min(a, bb), max(a, bb))
      if key not in cache:
        m = v[a] + v[bb]
        cache[key] = len(nv)
        nv.append(m / np.linalg.norm(m))
      return cache[key]

    for (a, bb, cc) in f:
      ab, bc, ca = mid(a, bb), mid(bb, cc), mid(cc, a)
      nf += [[a, ab, ca], [bb, bc, ab], [cc, ca, bc], [ab, bc, ca]]
    v = np.asarray(nv)
    f = np.asarray(nf, np.int32)
  verts = (v * radius + np.asarray(center)).astype(np.float32)
  return verts, f, v.astype(np.float32)


def bigscene(size=(512, 512)):
  """Production-scale geometry stress (not a BASELINE config): a Cornell
  box filled with a 4x3 grid of order-3 icospheres (~16k triangles), which
  routes tracing through the Pallas DFS-stream BVH kernel (>4096 tris)."""
  b = build_cornell_box(film_size=size, diffuse_only=True, max_path_length=8)
  colors = [(0.8, 0.3, 0.2), (0.2, 0.7, 0.3), (0.3, 0.4, 0.8),
            (0.8, 0.7, 0.2), (0.7, 0.3, 0.7), (0.3, 0.7, 0.7)]
  rs = np.random.RandomState(5)
  for gx in range(4):
    for gy in range(3):
      cx = -0.65 + gx * 0.44
      cz = -0.5 + gy * 0.5
      r = 0.13 + 0.05 * rs.rand()
      m = b.add_material(MaterialDesc(
          name=f"s{gx}{gy}", cls=st.MaterialClass.Diffuse,
          scattering_spec=b.add_spectrum(sp.SpectralDistribution.rgb_reflectance(
              np.asarray(colors[(gx * 3 + gy) % len(colors)], np.float32)))))
      verts, fcs, nrms = _icosphere_mesh((cx, r + 0.3 * rs.rand(), cz), r)
      b.add_mesh(verts, fcs, m, normals=nrms)
  return b
