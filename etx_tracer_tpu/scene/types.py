"""Device scene pytree + static render configuration.

The reference keeps one flat POD `Scene` struct of ArrayViews shared by CPU
and CUDA (render/shared/scene.hxx:22-65). The TPU equivalent is a NamedTuple
pytree of jnp arrays (SoA layout, static shapes) that flows through `jit`,
plus a small hashable `SceneConfig` carrying compile-time settings (spectral
mode, path-length bounds, film size) that select code paths at trace time.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp


class MaterialClass:
  """Material class ids (render/shared/material.hxx:53-68 order)."""
  Diffuse = 0
  Translucent = 1
  Plastic = 2
  Conductor = 3
  Dielectric = 4
  Thinfilm = 5
  Mirror = 6
  Boundary = 7
  Velvet = 8
  Principled = 9
  Void = 10
  Count = 11


class EmitterClass:
  """Emitter class ids (render/shared/emitter.hxx:8-14 order)."""
  Area = 0
  Environment = 1
  Directional = 2
  Undefined = 3


class SubsurfaceClass:
  Disabled = 0
  RandomWalk = 1
  ChristensenBurley = 2


class Camera(NamedTuple):
  """Camera arrays (render/shared/camera.hxx:8-39)."""
  position: jnp.ndarray      # (3,)
  direction: jnp.ndarray     # (3,)
  side: jnp.ndarray          # (3,)
  up: jnp.ndarray            # (3,)
  view_proj: jnp.ndarray     # (4,4) row-major: clip = view_proj @ [p,1]
  tan_half_fov: jnp.ndarray  # ()
  aspect: jnp.ndarray        # ()
  area: jnp.ndarray          # ()  image plane area for pdf conversions
  lens_radius: jnp.ndarray   # ()
  focal_distance: jnp.ndarray  # ()
  clip_near: jnp.ndarray     # ()
  clip_far: jnp.ndarray      # ()
  medium_index: jnp.ndarray  # () int32
  lens_image: jnp.ndarray    # () int32 aperture-shape image (-1 none)


class Materials(NamedTuple):
  """SoA material table (render/shared/material.hxx:52-95)."""
  cls: jnp.ndarray                 # (M,) int32
  reflectance_spec: jnp.ndarray    # (M,) int32 -> spectra bank
  reflectance_img: jnp.ndarray     # (M,) int32 -> image bank (-1 none)
  scattering_spec: jnp.ndarray     # (M,) int32
  scattering_img: jnp.ndarray      # (M,) int32
  roughness: jnp.ndarray           # (M,2) float32 (anisotropic u/v)
  roughness_img: jnp.ndarray       # (M,) int32
  metalness: jnp.ndarray           # (M,) float32
  metalness_img: jnp.ndarray       # (M,) int32
  transmission: jnp.ndarray        # (M,) float32
  transmission_img: jnp.ndarray    # (M,) int32
  int_ior_eta: jnp.ndarray         # (M,) int32 -> spectra bank
  int_ior_k: jnp.ndarray           # (M,) int32
  int_ior_cls: jnp.ndarray         # (M,) int32 SpectralDistribution class
  ext_ior_eta: jnp.ndarray         # (M,) int32
  ext_ior_k: jnp.ndarray           # (M,) int32
  int_medium: jnp.ndarray          # (M,) int32
  ext_medium: jnp.ndarray          # (M,) int32
  normal_img: jnp.ndarray          # (M,) int32
  normal_scale: jnp.ndarray        # (M,) float32
  two_sided: jnp.ndarray           # (M,) int32
  opacity: jnp.ndarray             # (M,) float32
  emission_collimation: jnp.ndarray  # (M,) float32
  diffuse_variation: jnp.ndarray   # (M,) int32
  subsurface_cls: jnp.ndarray      # (M,) int32
  subsurface_spec: jnp.ndarray     # (M,) int32 (distances SPD)
  thinfilm_eta: jnp.ndarray        # (M,) int32
  thinfilm_k: jnp.ndarray          # (M,) int32
  thinfilm_img: jnp.ndarray        # (M,) int32 (thickness map)
  thinfilm_min: jnp.ndarray        # (M,) float32
  thinfilm_max: jnp.ndarray        # (M,) float32


class EmitterProfiles(NamedTuple):
  """Emitter profile SoA (render/shared/emitter.hxx:7-42)."""
  cls: jnp.ndarray            # (P,) int32
  emission_spec: jnp.ndarray  # (P,) int32
  emission_img: jnp.ndarray   # (P,) int32
  direction: jnp.ndarray      # (P,3) float32
  angular_size: jnp.ndarray   # (P,) float32
  equivalent_disk_size: jnp.ndarray  # (P,) float32
  angular_size_cos: jnp.ndarray      # (P,) float32


class Emitters(NamedTuple):
  """Per-instance emitters (area = one per emissive triangle) + power CDF."""
  cls: jnp.ndarray             # (E,) int32
  profile: jnp.ndarray         # (E,) int32
  triangle: jnp.ndarray        # (E,) int32
  weight: jnp.ndarray          # (E,) float32 (spectrum*additional weight)
  triangle_area: jnp.ndarray   # (E,) float32
  pdf: jnp.ndarray             # (E,) float32 discrete selection pdf
  cdf: jnp.ndarray             # (E,) float32 inclusive cdf
  total_weight: jnp.ndarray    # () float32
  env_indices: jnp.ndarray     # (64,) int32, -1 padded (scene.hxx:16-20)
  env_count: jnp.ndarray       # () int32


class Mediums(NamedTuple):
  """Participating media SoA (render/shared/medium.hxx). Row 0 = vacuum."""
  cls: jnp.ndarray              # (D,) int32: 0 none, 1 homogeneous, 2 heterogeneous
  absorption_spec: jnp.ndarray  # (D,) int32
  scattering_spec: jnp.ndarray  # (D,) int32
  phase_g: jnp.ndarray          # (D,) float32
  max_sigma: jnp.ndarray        # (D,) float32
  grid: jnp.ndarray             # (D, gz, gy, gx) float32 density (1-voxel dummy when unused)
  bounds_min: jnp.ndarray       # (D,3)
  bounds_max: jnp.ndarray       # (D,3)
  explicit_connections: jnp.ndarray  # (D,) int32


class ImageBank(NamedTuple):
  """Padded texture bank; (I, H, W, 4) with per-image true sizes.

  Replaces the reference ImagePool (render/host/image_pool.cxx). Importance
  CDFs for env-map sampling are stored per image row/column.
  """
  pixels: jnp.ndarray     # (I, H, W, 4) float32
  size: jnp.ndarray       # (I, 2) int32 (w, h)
  inv_size: jnp.ndarray   # (I, 2) float32
  # conditional cdf over x per row, marginal cdf over y
  row_cdf: jnp.ndarray    # (I, H, W) float32
  row_pdf: jnp.ndarray    # (I, H, W) float32
  col_cdf: jnp.ndarray    # (I, H) float32
  col_pdf: jnp.ndarray    # (I, H) float32
  offset: jnp.ndarray     # (I, 2) float32 uv offset (env maps)
  scale_u: jnp.ndarray    # (I,) float32
  normalization: jnp.ndarray  # (I,) float32 CDF pdf normalization
  # O(1) alias tables (Vose) for importance sampling: the searchsorted CDF
  # walk gathered whole (R, W) rows per lane — hundreds of MB of HBM
  # traffic per NEE on big env maps. Same distribution, ~6 scalar gathers.
  col_ap: Optional[jnp.ndarray] = None  # (I, H) float32 alias probs
  col_ai: Optional[jnp.ndarray] = None  # (I, H) int32 alias targets
  row_ap: Optional[jnp.ndarray] = None  # (I, H, W) float32
  row_ai: Optional[jnp.ndarray] = None  # (I, H, W) int32


class BVH(NamedTuple):
  """Flattened 2-wide BVH (host-built). Leaf: count>0, prims at [first, first+count)."""
  node_min: jnp.ndarray   # (N,3)
  node_max: jnp.ndarray   # (N,3)
  node_left: jnp.ndarray  # (N,) int32: inner -> right child (left = i+1); leaf -> first prim
  node_count: jnp.ndarray  # (N,) int32: 0 for inner nodes
  prim_index: jnp.ndarray  # (T,) int32 reordered triangle ids
  # skip offsets for stream traversal: first pre-order node NOT in subtree(i)
  # (root skip = N). Host-computed; drives the Pallas DFS-stream kernel.
  node_skip: Optional[jnp.ndarray] = None  # (N,) int32
  # fat-node stream (inner nodes only, both children's boxes per row) for
  # the Pallas traversal — bvh_build.build_fat_rows layout
  fat_rows: Optional[jnp.ndarray] = None  # (Ni, 16) float32


class DeviceScene(NamedTuple):
  """The frozen device scene (render/shared/scene.hxx:22-65 analogue)."""
  # geometry
  v_pos: jnp.ndarray      # (V,3)
  v_nrm: jnp.ndarray      # (V,3)
  v_tan: jnp.ndarray      # (V,3)
  v_btn: jnp.ndarray      # (V,3)
  v_uv: jnp.ndarray       # (V,2)
  tri_idx: jnp.ndarray    # (T,3) int32
  tri_mat: jnp.ndarray    # (T,) int32
  tri_geo_n: jnp.ndarray  # (T,3)
  tri_area: jnp.ndarray   # (T,)
  tri_emitter: jnp.ndarray  # (T,) int32 (-1 none)
  # precomputed intersection arrays (Moller-Trumbore)
  tri_v0: jnp.ndarray     # (T,3)
  tri_e1: jnp.ndarray     # (T,3)
  tri_e2: jnp.ndarray     # (T,3)
  bvh: BVH
  # shading tables
  materials: Materials
  emitter_profiles: EmitterProfiles
  emitters: Emitters
  mediums: Mediums
  images: ImageBank
  spec_values: jnp.ndarray  # (S,441) float32 SPD bank
  spec_rgb: jnp.ndarray     # (S,3) float32 integrated RGB per SPD
  # packed row tables for MXU one-hot lookups (scene/packed.py)
  mat_table: jnp.ndarray    # (M, F)
  tri_table: jnp.ndarray    # (T, 39)
  em_table: jnp.ndarray     # (E, 6)
  prof_table: jnp.ndarray   # (P, 9)
  # camera & world
  camera: Camera
  bsphere_center: jnp.ndarray  # (3,)
  bsphere_radius: jnp.ndarray  # ()
  radiance_clamp: jnp.ndarray  # ()
  # per-step spectral cache, set ONLY inside a traced step: (wl_key, (R,S)
  # table of every SPD evaluated at each lane's wavelength). query_spd uses
  # it when the queried wl IS the key object (one MXU matmul replaces all
  # per-lane bank gathers for the step). None in stored/loaded scenes.
  spec_at_wl: Optional[tuple] = None


@dataclasses.dataclass(frozen=True)
class SceneConfig:
  """Static (trace-time) configuration — hashable, passed as a jit static arg."""
  film_width: int = 640
  film_height: int = 640
  spectral: bool = False
  samples: int = 256
  max_path_length: int = 65535
  min_path_length: int = 0
  rr_start: int = 6
  noise_threshold: float = 0.1
  # wavefront sizing
  has_media: bool = False
  has_subsurface: bool = False
  has_env_emitters: bool = False
  has_images: bool = False
  # default-material spectrum indices (scene.hxx:47-56)
  black_spectrum: int = 0
  white_spectrum: int = 1
  # material classes present (static -> dispatch compiles only these lobes)
  material_classes: tuple = (0,)
  # static environment-emitter count (compiled loop bound)
  num_env_emitters: int = 0
  # blue-noise first-bounce sampling (PTOptions::blue_noise analogue)
  blue_noise: bool = False
  # emitter classes present (static -> sampling compiles only these)
  emitter_classes: tuple = (0,)
  # panoramic camera (Camera::Class::Equirectangular)
  equirectangular: bool = False
  # diffuse variations present (material.hxx:86; 0 Lambert, 1 Heitz MS, 2 vMF)
  diffuse_variations: tuple = (0,)
  # stochastic alpha testing compiled in (alpha_test_pass, scene_bsdf.hxx:128)
  has_alpha: bool = False
  # subsurface classes present (1 RandomWalk, 2 ChristensenBurley)
  subsurface_classes: tuple = (1,)
  # a radiance clamp is configured (gates deferred NEE, which bypasses the
  # per-sample clamp)
  has_radiance_clamp: bool = False
  # pixel reconstruction filter: "blackman-harris" (Film::sample default,
  # film.cxx:63-67; iteration 0 renders pixel centers), "box" (uniform
  # in-pixel jitter) or "center" (the reference's empty-filter mode)
  pixel_filter: str = "blackman-harris"
  # runtime validation build: inject checkify finite-guards after each
  # integrator stage (ETX_VALIDATE, render/shared/base.hxx:16-48);
  # production configs compile zero extra code
  validate: bool = False
