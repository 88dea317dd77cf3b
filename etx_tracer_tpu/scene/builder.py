"""Host-side scene staging and freezing into the device pytree.

Counterpart of the reference SceneRepresentation + SceneData
(render/host/scene_representation.cxx, scene_data.hxx): stages geometry,
materials, spectra, mediums and emitters with numpy, performs commit-time
work (normals/tangents fixup, per-triangle area-emitter instancing
(:840-963), power-based emitter distribution (:2460+), bounding sphere,
camera build (:579-598), BVH build), then freezes everything into a
`DeviceScene` pytree of jnp arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from etx_tracer_tpu.core import distribution as distlib
from etx_tracer_tpu.core import spectrum as sp
from etx_tracer_tpu.ops import bvh_build
from etx_tracer_tpu.scene import types as st

kInvalid = -1


@dataclasses.dataclass
class MaterialDesc:
  """Host material description with reference defaults (material.hxx:52-95)."""
  name: str = ""
  cls: int = st.MaterialClass.Diffuse
  reflectance_spec: int = kInvalid   # Ks
  reflectance_img: int = kInvalid
  scattering_spec: int = kInvalid    # Kd / Kt
  scattering_img: int = kInvalid
  emission_spec: int = kInvalid
  emission_img: int = kInvalid
  roughness: tuple = (0.0, 0.0)
  roughness_img: int = kInvalid
  metalness: float = 0.0
  metalness_img: int = kInvalid
  transmission: float = 0.0
  transmission_img: int = kInvalid
  int_ior_eta: int = kInvalid
  int_ior_k: int = kInvalid
  int_ior_cls: int = sp.SpectralDistribution.CLASS_DIELECTRIC
  ext_ior_eta: int = kInvalid
  ext_ior_k: int = kInvalid
  int_medium: int = kInvalid
  ext_medium: int = kInvalid
  normal_img: int = kInvalid
  normal_scale: float = 1.0
  two_sided: bool = False
  opacity: float = 1.0
  emission_collimation: float = 0.0
  diffuse_variation: int = 0
  subsurface_cls: int = st.SubsurfaceClass.Disabled
  subsurface_spec: int = kInvalid
  thinfilm_eta: int = kInvalid
  thinfilm_k: int = kInvalid
  thinfilm_img: int = kInvalid
  thinfilm_min: float = 0.0
  thinfilm_max: float = 0.0


@dataclasses.dataclass
class MediumDesc:
  name: str = ""
  cls: int = 1  # 1 homogeneous, 2 heterogeneous
  absorption_spec: int = kInvalid
  scattering_spec: int = kInvalid
  phase_g: float = 0.0
  grid: Optional[np.ndarray] = None  # (gz, gy, gx) densities in [0,1]
  bounds_min: tuple = (0.0, 0.0, 0.0)
  bounds_max: tuple = (1.0, 1.0, 1.0)
  explicit_connections: bool = True


@dataclasses.dataclass
class EmitterProfileDesc:
  cls: int = st.EmitterClass.Environment
  emission_spec: int = kInvalid
  emission_img: int = kInvalid
  direction: tuple = (0.0, 1.0, 0.0)
  angular_size: float = 0.0


class SceneBuilder:
  def __init__(self):
    self.positions: list[np.ndarray] = []
    self.normals: list[Optional[np.ndarray]] = []
    self.uvs: list[Optional[np.ndarray]] = []
    self.indices: list[np.ndarray] = []
    self.mesh_material: list[int] = []
    self.materials: list[MaterialDesc] = []
    self.material_names: dict[str, int] = {}
    self.spectra: list[sp.SpectralDistribution] = []
    self.mediums: list[MediumDesc] = []
    self.medium_names: dict[str, int] = {}
    self.distant_emitters: list[EmitterProfileDesc] = []
    self.images: list[np.ndarray] = []
    # camera defaults (reference fallback 1280x720, scene_representation.cxx:770)
    self.camera_origin = np.array([5.0, 5.0, 5.0], np.float32)
    self.camera_target = np.zeros(3, np.float32)
    self.camera_up = np.array([0.0, 1.0, 0.0], np.float32)
    self.camera_fov = 26.99
    self.film_size = (1280, 720)
    self.lens_radius = 0.0
    self.focal_distance = 0.0
    self.clip_near = 1.0 / 256.0
    self.clip_far = 1024.0
    self.camera_medium = kInvalid
    self.camera_lens_image = kInvalid
    self.camera_equirectangular = False
    # render settings (scene.hxx:41-46 defaults)
    self.samples = 256
    self.max_path_length = 65535
    self.min_path_length = 0
    self.rr_start = 6
    self.noise_threshold = 0.1
    self.radiance_clamp = 0.0
    self.spectral = False

    # spectrum 0 = black, 1 = white (scene.hxx named defaults)
    self.add_spectrum(sp.SpectralDistribution.null())
    self.add_spectrum(sp.SpectralDistribution.constant(1.0))
    # default IORs: vacuum 1.0, dielectric 1.5 (scene_representation defaults)
    self.vacuum_ior = self.add_spectrum(
        sp.SpectralDistribution.constant(1.0, sp.SpectralDistribution.CLASS_DIELECTRIC))
    self.default_dielectric_ior = self.add_spectrum(
        sp.SpectralDistribution.constant(1.5, sp.SpectralDistribution.CLASS_DIELECTRIC))

  # -- staging ------------------------------------------------------------

  def add_spectrum(self, sd: sp.SpectralDistribution) -> int:
    self.spectra.append(sd)
    return len(self.spectra) - 1

  def add_rgb_reflectance(self, rgb) -> int:
    return self.add_spectrum(sp.SpectralDistribution.rgb_reflectance(np.asarray(rgb, np.float32)))

  def add_rgb_luminance(self, rgb) -> int:
    return self.add_spectrum(sp.SpectralDistribution.rgb_luminance(np.asarray(rgb, np.float32)))

  def add_material(self, desc: MaterialDesc) -> int:
    self.materials.append(desc)
    if desc.name:
      self.material_names[desc.name] = len(self.materials) - 1
    return len(self.materials) - 1

  def add_medium(self, desc: MediumDesc) -> int:
    self.mediums.append(desc)
    if desc.name:
      self.medium_names[desc.name] = len(self.mediums) - 1
    return len(self.mediums) - 1

  def add_distant_emitter(self, desc: EmitterProfileDesc):
    self.distant_emitters.append(desc)

  def add_image(self, pixels: np.ndarray, build_cdf: bool = False,
                offset=(0.0, 0.0), u_scale: float = 1.0, uniform: bool = False) -> int:
    self.images.append({
        "pixels": np.asarray(pixels, np.float32),
        "build_cdf": build_cdf, "offset": offset,
        "u_scale": u_scale, "uniform": uniform})
    return len(self.images) - 1

  def add_image_file(self, path: str, build_cdf: bool = False,
                     offset=(0.0, 0.0), u_scale: float = 1.0,
                     srgb_to_linear: bool = True) -> int:
    from etx_tracer_tpu.utils import image_io
    return self.add_image(image_io.load_image(path, srgb_to_linear),
                          build_cdf=build_cdf, offset=offset, u_scale=u_scale)

  def add_mesh(self, positions, indices, material: int, normals=None, uvs=None):
    self.positions.append(np.asarray(positions, np.float32).reshape(-1, 3))
    self.indices.append(np.asarray(indices, np.int32).reshape(-1, 3))
    self.normals.append(None if normals is None else np.asarray(normals, np.float32).reshape(-1, 3))
    self.uvs.append(None if uvs is None else np.asarray(uvs, np.float32).reshape(-1, 2))
    self.mesh_material.append(material)

  def set_camera(self, origin, target, up, fov, film_size, lens_radius=0.0,
                 focal_distance=0.0, clip_near=None, clip_far=None):
    self.camera_origin = np.asarray(origin, np.float32)
    self.camera_target = np.asarray(target, np.float32)
    self.camera_up = np.asarray(up, np.float32)
    self.camera_fov = float(fov)
    self.film_size = (int(film_size[0]), int(film_size[1]))
    self.lens_radius = float(lens_radius)
    self.focal_distance = float(focal_distance)
    if clip_near is not None:
      self.clip_near = float(clip_near)
    if clip_far is not None:
      self.clip_far = float(clip_far)

  # -- commit ---------------------------------------------------------------

  def _merge_geometry(self):
    all_pos, all_nrm, all_uv, all_idx, all_mat = [], [], [], [], []
    base = 0
    for pos, idx, nrm, uv, mat in zip(self.positions, self.indices, self.normals, self.uvs, self.mesh_material):
      if nrm is None:
        nrm = _vertex_normals(pos, idx)
      if uv is None:
        uv = np.zeros((pos.shape[0], 2), np.float32)
      all_pos.append(pos)
      all_nrm.append(nrm)
      all_uv.append(uv)
      all_idx.append(idx + base)
      all_mat.append(np.full(idx.shape[0], mat, np.int32))
      base += pos.shape[0]
    if not all_pos:
      raise ValueError("scene has no geometry")
    return (np.concatenate(all_pos), np.concatenate(all_nrm), np.concatenate(all_uv),
            np.concatenate(all_idx), np.concatenate(all_mat))

  def build(self):
    pos, nrm, uv, idx, tri_mat = self._merge_geometry()
    num_t = idx.shape[0]

    v0 = pos[idx[:, 0]]
    e1 = pos[idx[:, 1]] - v0
    e2 = pos[idx[:, 2]] - v0
    geo_n_raw = np.cross(e1, e2)
    twice_area = np.linalg.norm(geo_n_raw, axis=-1)
    tri_area = (0.5 * twice_area).astype(np.float32)
    geo_n = geo_n_raw / np.maximum(twice_area, 1e-20)[:, None]

    tan, btn = _tangents(nrm, uv, idx, pos)

    # bounding sphere
    bb_min = pos.min(axis=0)
    bb_max = pos.max(axis=0)
    center = (bb_min + bb_max) * 0.5
    radius = float(np.linalg.norm(pos - center, axis=-1).max())
    radius = max(radius, 1e-3)

    # ---- area emitter instancing (scene_representation.cxx:840-906) ----
    mat_emitter_profile: dict[int, int] = {}
    profiles: list[EmitterProfileDesc] = list(self.distant_emitters)
    inst_cls, inst_profile, inst_tri, inst_area = [], [], [], []
    inst_spectrum_w, inst_additional_w = [], []

    for pi, p in enumerate(self.distant_emitters):
      inst_cls.append(p.cls)
      inst_profile.append(pi)
      inst_tri.append(kInvalid)
      inst_area.append(0.0)
      w = self.spectra[p.emission_spec].luminance() if p.emission_spec != kInvalid else 0.0
      inst_spectrum_w.append(w)
      inst_additional_w.append(np.pi * radius * radius)

    tri_emitter = np.full(num_t, kInvalid, np.int32)
    for t in range(num_t):
      m = self.materials[tri_mat[t]]
      if m.emission_spec == kInvalid:
        continue
      spectrum_weight = self.spectra[m.emission_spec].luminance()
      additional = (2.0 if m.two_sided else 1.0) * tri_area[t] * np.pi
      if spectrum_weight <= 0.0 or additional <= 0.0:
        continue
      mi = int(tri_mat[t])
      if mi not in mat_emitter_profile:
        mat_emitter_profile[mi] = len(profiles)
        profiles.append(EmitterProfileDesc(
            cls=st.EmitterClass.Area, emission_spec=m.emission_spec,
            emission_img=m.emission_img))
      tri_emitter[t] = len(inst_cls)
      inst_cls.append(st.EmitterClass.Area)
      inst_profile.append(mat_emitter_profile[mi])
      inst_tri.append(t)
      inst_area.append(float(tri_area[t]))
      inst_spectrum_w.append(spectrum_weight)
      inst_additional_w.append(additional)

    num_e = max(len(inst_cls), 1)
    weights = np.asarray([sw * aw for sw, aw in zip(inst_spectrum_w, inst_additional_w)], np.float64)
    if len(inst_cls) == 0:
      weights = np.zeros(1)
      inst_cls, inst_profile, inst_tri, inst_area = [st.EmitterClass.Undefined], [0], [kInvalid], [0.0]
      inst_spectrum_w, inst_additional_w = [0.0], [0.0]
    pdf, cdf, total_w = distlib.build(weights)

    env_idx = np.full(64, kInvalid, np.int32)
    env_count = 0
    for i, c in enumerate(inst_cls):
      if c in (st.EmitterClass.Environment, st.EmitterClass.Directional) and weights[i] > 0.0:
        env_idx[env_count] = i
        env_count += 1

    num_p = max(len(profiles), 1)
    if not profiles:
      profiles = [EmitterProfileDesc(cls=st.EmitterClass.Undefined)]
    prof_cls = np.asarray([p.cls for p in profiles], np.int32)
    prof_spec = np.asarray([p.emission_spec for p in profiles], np.int32)
    prof_img = np.asarray([p.emission_img for p in profiles], np.int32)
    prof_dir = np.asarray([_normalize(p.direction) for p in profiles], np.float32)
    prof_ang = np.asarray([p.angular_size for p in profiles], np.float32)
    prof_disk = 2.0 * np.tan(prof_ang / 2.0)
    prof_cos = np.cos(prof_ang / 2.0)

    # ---- materials SoA ----
    mats = self.materials if self.materials else [MaterialDesc()]

    def marr(fn, dtype):
      return np.asarray([fn(m) for m in mats], dtype)

    def ior_default(v, default):
      return v if v != kInvalid else default

    materials = st.Materials(
        cls=jnp.asarray(marr(lambda m: m.cls, np.int32)),
        reflectance_spec=jnp.asarray(marr(lambda m: ior_default(m.reflectance_spec, 1), np.int32)),
        reflectance_img=jnp.asarray(marr(lambda m: m.reflectance_img, np.int32)),
        scattering_spec=jnp.asarray(marr(lambda m: ior_default(m.scattering_spec, 1), np.int32)),
        scattering_img=jnp.asarray(marr(lambda m: m.scattering_img, np.int32)),
        roughness=jnp.asarray(marr(lambda m: m.roughness, np.float32)),
        roughness_img=jnp.asarray(marr(lambda m: m.roughness_img, np.int32)),
        metalness=jnp.asarray(marr(lambda m: m.metalness, np.float32)),
        metalness_img=jnp.asarray(marr(lambda m: m.metalness_img, np.int32)),
        transmission=jnp.asarray(marr(lambda m: m.transmission, np.float32)),
        transmission_img=jnp.asarray(marr(lambda m: m.transmission_img, np.int32)),
        int_ior_eta=jnp.asarray(marr(lambda m: ior_default(m.int_ior_eta, self.default_dielectric_ior), np.int32)),
        int_ior_k=jnp.asarray(marr(lambda m: m.int_ior_k, np.int32)),
        int_ior_cls=jnp.asarray(marr(lambda m: m.int_ior_cls, np.int32)),
        ext_ior_eta=jnp.asarray(marr(lambda m: ior_default(m.ext_ior_eta, self.vacuum_ior), np.int32)),
        ext_ior_k=jnp.asarray(marr(lambda m: m.ext_ior_k, np.int32)),
        int_medium=jnp.asarray(marr(lambda m: m.int_medium, np.int32)),
        ext_medium=jnp.asarray(marr(lambda m: m.ext_medium, np.int32)),
        normal_img=jnp.asarray(marr(lambda m: m.normal_img, np.int32)),
        normal_scale=jnp.asarray(marr(lambda m: m.normal_scale, np.float32)),
        two_sided=jnp.asarray(marr(lambda m: 1 if m.two_sided else 0, np.int32)),
        opacity=jnp.asarray(marr(lambda m: m.opacity, np.float32)),
        emission_collimation=jnp.asarray(marr(lambda m: m.emission_collimation, np.float32)),
        diffuse_variation=jnp.asarray(marr(lambda m: m.diffuse_variation, np.int32)),
        subsurface_cls=jnp.asarray(marr(lambda m: m.subsurface_cls, np.int32)),
        subsurface_spec=jnp.asarray(marr(lambda m: m.subsurface_spec, np.int32)),
        thinfilm_eta=jnp.asarray(marr(lambda m: m.thinfilm_eta, np.int32)),
        thinfilm_k=jnp.asarray(marr(lambda m: m.thinfilm_k, np.int32)),
        thinfilm_img=jnp.asarray(marr(lambda m: m.thinfilm_img, np.int32)),
        thinfilm_min=jnp.asarray(marr(lambda m: m.thinfilm_min, np.float32)),
        thinfilm_max=jnp.asarray(marr(lambda m: m.thinfilm_max, np.float32)),
    )

    # ---- spectra bank ----
    spec_values = np.stack([s.values for s in self.spectra]).astype(np.float32)
    spec_rgb = np.stack([s.integrated_rgb() for s in self.spectra]).astype(np.float32)

    # ---- mediums ----
    mediums = _build_mediums(self.mediums, self.spectra)

    # ---- images ----
    if self.images:
      from etx_tracer_tpu.render import images as images_mod
      images = images_mod.build_bank(self.images)
    else:
      images = _empty_image_bank()

    # ---- camera ----
    camera = _build_camera(self.camera_origin, self.camera_target, self.camera_up,
                           self.camera_fov, self.film_size, self.lens_radius,
                           self.focal_distance, self.clip_near, self.clip_far,
                           self.camera_medium, self.camera_lens_image)

    # ---- BVH ----
    bvh_arrays = bvh_build.build_bvh(v0, e1, e2)
    bvh = st.BVH(
        node_min=jnp.asarray(bvh_arrays["node_min"]),
        node_max=jnp.asarray(bvh_arrays["node_max"]),
        node_left=jnp.asarray(bvh_arrays["node_left"]),
        node_count=jnp.asarray(bvh_arrays["node_count"]),
        prim_index=jnp.asarray(bvh_arrays["prim_index"]),
        node_skip=jnp.asarray(bvh_arrays["node_skip"]),
        fat_rows=(jnp.asarray(bvh_arrays["fat_rows"])
                  if bvh_arrays.get("fat_rows") is not None else None),
    )

    emitters = st.Emitters(
        cls=jnp.asarray(inst_cls, jnp.int32),
        profile=jnp.asarray(inst_profile, jnp.int32),
        triangle=jnp.asarray(inst_tri, jnp.int32),
        weight=jnp.asarray(weights, jnp.float32),
        triangle_area=jnp.asarray(inst_area, jnp.float32),
        pdf=jnp.asarray(pdf),
        cdf=jnp.asarray(cdf),
        total_weight=jnp.asarray(total_w, jnp.float32),
        env_indices=jnp.asarray(env_idx),
        env_count=jnp.asarray(env_count, jnp.int32),
    )

    from etx_tracer_tpu.scene import packed

    emitter_profiles_nt = st.EmitterProfiles(
        cls=jnp.asarray(prof_cls), emission_spec=jnp.asarray(prof_spec),
        emission_img=jnp.asarray(prof_img), direction=jnp.asarray(prof_dir),
        angular_size=jnp.asarray(prof_ang),
        equivalent_disk_size=jnp.asarray(prof_disk.astype(np.float32)),
        angular_size_cos=jnp.asarray(prof_cos.astype(np.float32)))

    tri_table = packed.build_tri_table(
        pos, nrm, tan, btn, uv, idx, geo_n.astype(np.float32), tri_mat,
        tri_emitter, tri_area)

    scene = st.DeviceScene(
        v_pos=jnp.asarray(pos), v_nrm=jnp.asarray(nrm), v_tan=jnp.asarray(tan),
        v_btn=jnp.asarray(btn), v_uv=jnp.asarray(uv),
        tri_idx=jnp.asarray(idx), tri_mat=jnp.asarray(tri_mat),
        tri_geo_n=jnp.asarray(geo_n.astype(np.float32)),
        tri_area=jnp.asarray(tri_area),
        tri_emitter=jnp.asarray(tri_emitter),
        tri_v0=jnp.asarray(v0), tri_e1=jnp.asarray(e1), tri_e2=jnp.asarray(e2),
        bvh=bvh,
        materials=materials,
        emitter_profiles=emitter_profiles_nt,
        emitters=emitters,
        mediums=mediums,
        images=images,
        spec_values=jnp.asarray(spec_values),
        spec_rgb=jnp.asarray(spec_rgb),
        mat_table=packed.pack_materials(materials),
        tri_table=jnp.asarray(tri_table),
        em_table=packed.build_emitter_table(emitters),
        prof_table=packed.build_profile_table(emitter_profiles_nt),
        camera=camera,
        bsphere_center=jnp.asarray(center.astype(np.float32)),
        bsphere_radius=jnp.asarray(np.float32(radius)),
        radiance_clamp=jnp.asarray(np.float32(self.radiance_clamp)),
    )

    config = st.SceneConfig(
        film_width=self.film_size[0], film_height=self.film_size[1],
        spectral=self.spectral, samples=self.samples,
        max_path_length=min(self.max_path_length, 4096),
        min_path_length=self.min_path_length,
        rr_start=self.rr_start, noise_threshold=self.noise_threshold,
        has_media=len(self.mediums) > 0,
        has_subsurface=any(m.subsurface_cls != st.SubsurfaceClass.Disabled for m in mats),
        subsurface_classes=tuple(sorted(
            {m.subsurface_cls for m in mats
             if m.subsurface_cls != st.SubsurfaceClass.Disabled})) or (1,),
        has_env_emitters=env_count > 0,
        has_images=len(self.images) > 0,
        material_classes=tuple(sorted({m.cls for m in mats})),
        num_env_emitters=env_count,
        emitter_classes=tuple(sorted({int(c) for c in inst_cls
                                      if c != st.EmitterClass.Undefined})) or (0,),
        equirectangular=self.camera_equirectangular,
        has_radiance_clamp=self.radiance_clamp > 0.0,
        diffuse_variations=tuple(sorted({m.diffuse_variation for m in mats})) or (0,),
        has_alpha=(any(m.opacity < 1.0 for m in mats)
                   or any(m.scattering_img >= 0
                          and self.images[m.scattering_img]["pixels"].ndim == 3
                          and self.images[m.scattering_img]["pixels"].shape[-1] >= 4
                          and float(self.images[m.scattering_img]["pixels"][..., 3].min()) < 1.0
                          for m in mats)),
    )
    return scene, config


def _normalize(v):
  v = np.asarray(v, np.float32)
  return v / max(np.linalg.norm(v), 1e-20)


def _vertex_normals(pos, idx):
  n = np.zeros_like(pos)
  v0, v1, v2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
  face_n = np.cross(v1 - v0, v2 - v0)  # area-weighted
  for k in range(3):
    np.add.at(n, idx[:, k], face_n)
  norm = np.linalg.norm(n, axis=-1, keepdims=True)
  return (n / np.maximum(norm, 1e-20)).astype(np.float32)


def _tangents(nrm, uv, idx, pos):
  """Per-vertex tangent frames; UV-gradient based with graceful fallback."""
  tan = np.zeros_like(nrm)
  v0, v1, v2 = pos[idx[:, 0]], pos[idx[:, 1]], pos[idx[:, 2]]
  uv0, uv1, uv2 = uv[idx[:, 0]], uv[idx[:, 1]], uv[idx[:, 2]]
  du1 = uv1 - uv0
  du2 = uv2 - uv0
  r = du1[:, 0] * du2[:, 1] - du1[:, 1] * du2[:, 0]
  ok = np.abs(r) > 1e-12
  rr = np.where(ok, r, 1.0)
  t_face = ((v1 - v0) * du2[:, 1:2] - (v2 - v0) * du1[:, 1:2]) / rr[:, None]
  t_face = np.where(ok[:, None], t_face, 0.0)
  for k in range(3):
    np.add.at(tan, idx[:, k], t_face)
  # orthonormalize against normals; fallback to deterministic basis
  tan = tan - nrm * np.sum(tan * nrm, axis=-1, keepdims=True)
  ln = np.linalg.norm(tan, axis=-1, keepdims=True)
  fallback = _orthonormal_np(nrm)
  tan = np.where(ln > 1e-8, tan / np.maximum(ln, 1e-20), fallback)
  btn = np.cross(nrm, tan)
  btn /= np.maximum(np.linalg.norm(btn, axis=-1, keepdims=True), 1e-20)
  return tan.astype(np.float32), btn.astype(np.float32)


def _orthonormal_np(n):
  distinct = (n[:, 0] != n[:, 1]) | (n[:, 0] != n[:, 2])
  a = np.where(
      distinct[:, None],
      np.stack([n[:, 2] - n[:, 1], n[:, 0] - n[:, 2], n[:, 1] - n[:, 0]], axis=-1),
      np.stack([n[:, 2] - n[:, 1], n[:, 0] + n[:, 2], -n[:, 1] - n[:, 0]], axis=-1),
  )
  return a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-20)


def _build_camera(origin, target, up, fov_deg, film_size, lens_radius,
                  focal_distance, clip_near, clip_far, medium, lens_image=-1):
  """Reference build_camera (scene_representation.cxx:579-598) in numpy."""
  f = _normalize(np.asarray(target) - np.asarray(origin))
  s = _normalize(np.cross(f, np.asarray(up, np.float32)))
  u = np.cross(s, f)
  w, h = film_size
  fov = np.deg2rad(fov_deg)
  cot = np.cos(0.5 * fov) / np.sin(0.5 * fov)
  aspect = w / h
  tan_half_fov = 1.0 / cot
  area = (2.0 * tan_half_fov) * (2.0 * tan_half_fov / aspect)

  view = np.array([
      [s[0], s[1], s[2], -np.dot(s, origin)],
      [u[0], u[1], u[2], -np.dot(u, origin)],
      [-f[0], -f[1], -f[2], np.dot(f, origin)],
      [0, 0, 0, 1],
  ], np.float32)
  zn, zf = clip_near, clip_far
  proj = np.zeros((4, 4), np.float32)
  proj[0, 0] = cot
  proj[1, 1] = cot * aspect
  proj[2, 2] = zf / (zn - zf)
  proj[2, 3] = -(zf * zn) / (zf - zn)
  proj[3, 2] = -1.0
  view_proj = proj @ view

  return st.Camera(
      position=jnp.asarray(np.asarray(origin, np.float32)),
      direction=jnp.asarray(f.astype(np.float32)),
      side=jnp.asarray(s.astype(np.float32)),
      up=jnp.asarray(u.astype(np.float32)),
      view_proj=jnp.asarray(view_proj),
      tan_half_fov=jnp.asarray(np.float32(tan_half_fov)),
      aspect=jnp.asarray(np.float32(aspect)),
      area=jnp.asarray(np.float32(area)),
      lens_radius=jnp.asarray(np.float32(lens_radius)),
      focal_distance=jnp.asarray(np.float32(focal_distance)),
      clip_near=jnp.asarray(np.float32(clip_near)),
      clip_far=jnp.asarray(np.float32(clip_far)),
      medium_index=jnp.asarray(np.int32(medium)),
      lens_image=jnp.asarray(np.int32(lens_image)),
  )


def _build_mediums(descs: list[MediumDesc], spectra) -> st.Mediums:
  n = max(len(descs), 1)
  if not descs:
    descs = [MediumDesc(cls=0)]
  gz = max(max((d.grid.shape[0] if d.grid is not None else 1) for d in descs), 1)
  gy = max(max((d.grid.shape[1] if d.grid is not None else 1) for d in descs), 1)
  gx = max(max((d.grid.shape[2] if d.grid is not None else 1) for d in descs), 1)
  grids = np.ones((n, gz, gy, gx), np.float32)
  for i, d in enumerate(descs):
    if d.grid is not None:
      g = d.grid.astype(np.float32)
      m = g.max()
      if m > 0:
        g = g / m  # normalize to max=1 (medium_pool.cxx:94-150)
      grids[i, :g.shape[0], :g.shape[1], :g.shape[2]] = g

  def max_sigma(d: MediumDesc):
    s = spectra[d.scattering_spec].maximum_power() if d.scattering_spec != kInvalid else 0.0
    a = spectra[d.absorption_spec].maximum_power() if d.absorption_spec != kInvalid else 0.0
    return s + a

  return st.Mediums(
      cls=jnp.asarray([d.cls for d in descs], jnp.int32),
      absorption_spec=jnp.asarray([d.absorption_spec for d in descs], jnp.int32),
      scattering_spec=jnp.asarray([d.scattering_spec for d in descs], jnp.int32),
      phase_g=jnp.asarray([d.phase_g for d in descs], jnp.float32),
      max_sigma=jnp.asarray([max_sigma(d) for d in descs], jnp.float32),
      grid=jnp.asarray(grids),
      bounds_min=jnp.asarray([d.bounds_min for d in descs], jnp.float32),
      bounds_max=jnp.asarray([d.bounds_max for d in descs], jnp.float32),
      explicit_connections=jnp.asarray([1 if d.explicit_connections else 0 for d in descs], jnp.int32),
  )


def _empty_image_bank() -> st.ImageBank:
  return st.ImageBank(
      pixels=jnp.ones((1, 1, 1, 4), jnp.float32),
      size=jnp.ones((1, 2), jnp.int32),
      inv_size=jnp.ones((1, 2), jnp.float32),
      row_cdf=jnp.ones((1, 1, 1), jnp.float32),
      row_pdf=jnp.ones((1, 1, 1), jnp.float32),
      col_cdf=jnp.ones((1, 1), jnp.float32),
      col_pdf=jnp.ones((1, 1), jnp.float32),
      offset=jnp.zeros((1, 2), jnp.float32),
      scale_u=jnp.ones((1,), jnp.float32),
      normalization=jnp.ones((1,), jnp.float32),
      col_ap=jnp.ones((1, 1), jnp.float32),
      col_ai=jnp.zeros((1, 1), jnp.int32),
      row_ap=jnp.ones((1, 1, 1), jnp.float32),
      row_ai=jnp.zeros((1, 1, 1), jnp.int32),
  )
