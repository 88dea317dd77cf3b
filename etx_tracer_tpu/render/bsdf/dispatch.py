"""Masked BSDF dispatch over material classes (scene_bsdf.hxx:26-108).

Instead of the reference's per-ray switch, every lobe whose class appears in
the scene (a static tuple) evaluates on the whole wavefront and results are
blended by class masks. Principled is a deterministic mixture of
conductor/dielectric/plastic (the reference selects stochastically,
bsdf_principled.hxx:16-114 — a mixture has identical expectation and lower
variance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from etx_tracer_tpu.render import spectral as spx
from etx_tracer_tpu.render.bsdf import lobes
from etx_tracer_tpu.scene.types import MaterialClass as MC


def _select_sample(mask, a: lobes.BSDFSampleR, b: lobes.BSDFSampleR) -> lobes.BSDFSampleR:
  m1 = mask[..., None]
  return lobes.BSDFSampleR(
      w_o=jnp.where(m1, a.w_o, b.w_o),
      weight=jnp.where(m1, a.weight, b.weight),
      pdf=jnp.where(mask, a.pdf, b.pdf),
      eta=jnp.where(mask, a.eta, b.eta),
      is_delta=jnp.where(mask, a.is_delta, b.is_delta),
      is_diffuse=jnp.where(mask, a.is_diffuse, b.is_diffuse),
      is_reflection=jnp.where(mask, a.is_reflection, b.is_reflection),
      medium=jnp.where(mask, a.medium, b.medium),
  )


_SAMPLERS = {
    MC.Diffuse: lobes.diffuse_sample,
    MC.Translucent: lobes.translucent_sample,
    MC.Plastic: lobes.plastic_sample,
    MC.Conductor: lobes.conductor_sample,
    MC.Dielectric: lobes.dielectric_sample,
    MC.Thinfilm: lobes.thinfilm_sample,
    MC.Mirror: lobes.mirror_sample,
    MC.Boundary: lobes.boundary_sample,
    MC.Velvet: lobes.velvet_sample,
}

_EVALUATORS = {
    MC.Diffuse: lobes.diffuse_evaluate,
    MC.Translucent: lobes.translucent_evaluate,
    MC.Plastic: lobes.plastic_evaluate,
    MC.Conductor: lobes.conductor_evaluate,
    MC.Dielectric: lobes.dielectric_evaluate,
    MC.Velvet: lobes.velvet_evaluate,
    # Mirror/Boundary/Thinfilm/Void are delta or null: evaluate -> 0
}

# number of random columns each sampler may consume:
# 0,1 microfacet/cosine; 2 lobe select; 3,4 secondary direction;
# 5 principled metalness pick; 6 principled transmission pick
NUM_SAMPLE_RND = 7

# classes whose lobes run Heitz MS walks: their sample/evaluate take a
# `mask` start-mask so the while_loop only iterates for consuming lanes
_WALK_CLASSES = frozenset({MC.Plastic, MC.Conductor, MC.Dielectric})

# classes expensive enough to wrap in lax.cond when multiple classes are
# compiled: the branch is skipped entirely on bounces whose wavefront holds
# no lanes of the class. Kept EVEN under the r5 all-LUT backends: removing
# the conds was measured at materials 5.7 -> 1.5 Mrays/s (r5) — by the
# mid-path bounces large parts of the wavefront are diffuse-only, and the
# skipped specular subgraphs (incl. the E_d one-hot lookups) far outweigh
# the ~0.3 ms cond launch floor.
_COND_CLASSES = frozenset({MC.Plastic, MC.Conductor, MC.Dielectric,
                           MC.Thinfilm, MC.Principled, MC.Velvet})


def _cond_classes():
  return _COND_CLASSES


# --- material-sorted tile dispatch ----------------------------------------
#
# Masked dispatch pays every present class over the FULL wavefront each
# bounce (the reference's per-ray switch costs nothing extra on divergent
# warps it doesn't have; a TPU wavefront does). Sorted mode counting-sorts
# lanes by class, runs a lax.scan over fixed tiles with a lax.switch per
# tile: a tile whose lanes all share one class evaluates ONLY that class's
# lobe; the <=(C-1) boundary tiles fall back to the masked blend. Per-bounce
# cost becomes proportional to the actual class mix instead of
# (num classes) x width. Match: scene_bsdf.hxx:56-62 dispatch roles.

SORTED_MIN_WIDTH = 0       # 0 = disabled: measured NET-NEGATIVE on TPU at
                           # 262k lanes (sample 44 -> 61 ms): the lane
                           # permute routes through scalar-unit gathers
                           # (~250 ms for the full tree). Revisit with
                           # packed-row permutes / state-level sorting.
_SORT_TILE_DIV = 32        # tiles per wavefront (power-of-two widths)


def _sorted_tile(r: int, classes: tuple) -> int:
  """Static tile size for sorted dispatch, or 0 to use masked dispatch."""
  if len(classes) < 2 or not SORTED_MIN_WIDTH or r < SORTED_MIN_WIDTH:
    return 0
  t = max(2048, r // _SORT_TILE_DIV)
  return t if r % t == 0 else 0


def _class_perm(cls, classes: tuple):
  """Counting-sort permutation by class. Returns (perm, inv, tile_branch)
  builder inputs: k (R,) class index with len(classes)=sink for unknowns."""
  r = cls.shape[0]
  nc = len(classes)
  k = jnp.full(r, nc, jnp.int32)
  for i, c in enumerate(classes):
    k = jnp.where(cls == c, jnp.int32(i), k)
  onehot = k[:, None] == jnp.arange(nc + 1, dtype=jnp.int32)[None, :]
  counts = jnp.sum(onehot, axis=0, dtype=jnp.int32)
  base = jnp.concatenate([jnp.zeros(1, jnp.int32),
                          jnp.cumsum(counts)[:-1].astype(jnp.int32)])
  rank = jnp.sum(jnp.cumsum(onehot, axis=0, dtype=jnp.int32) * onehot,
                 axis=1) - 1
  pos = base[k] + rank                       # lane -> sorted slot (stable)
  perm = jnp.zeros(r, jnp.int32).at[pos].set(jnp.arange(r, dtype=jnp.int32))
  return perm, pos, k


def _tile_branches(k_sorted, tile: int, nc: int):
  """Per-tile switch index: the class when uniform, else `nc` (mixed)."""
  kt = k_sorted.reshape(-1, tile)
  lo = jnp.min(kt, axis=1)
  hi = jnp.max(kt, axis=1)
  return jnp.where(lo == hi, lo, jnp.int32(nc))


def _permute(tree, idx):
  return jax.tree_util.tree_map(lambda a: a[idx], tree)


def _scan_tiles(branch_fns, branches, tiled_xs, tile: int):
  """lax.scan over tiles, lax.switch per tile. tiled_xs leaves have leading
  (n_tiles, tile, ...)."""
  def body(carry, x):
    b, xs = x
    out = jax.lax.switch(b, branch_fns, xs)
    return carry, out
  _, out = jax.lax.scan(body, 0, (branches, tiled_xs))
  return out


def _tile_reshape(tree, n_tiles: int, tile: int):
  return jax.tree_util.tree_map(
      lambda a: a.reshape((n_tiles, tile) + a.shape[1:]), tree)


def _tile_flatten(tree, r: int):
  return jax.tree_util.tree_map(
      lambda a: a.reshape((r,) + a.shape[2:]), tree)


def sample(scene, sd: lobes.ShadingData, rnd, spectral: bool,
           classes: tuple, variations: tuple = (0,)) -> lobes.BSDFSampleR:
  """bsdf::sample over the wavefront. `classes`: static material class set."""
  tile = _sorted_tile(sd.w_i.shape[0], classes)
  if tile:
    return _sample_sorted(scene, sd, rnd, spectral, classes, variations, tile)
  return _sample_masked(scene, sd, rnd, spectral, classes, variations)


def _sample_masked(scene, sd: lobes.ShadingData, rnd, spectral: bool,
                   classes: tuple, variations: tuple = (0,)) -> lobes.BSDFSampleR:
  r = sd.w_i.shape[0]
  c = spx.channels(spectral)
  result = lobes.BSDFSampleR(
      w_o=sd.w_i, weight=jnp.zeros((r, c)), pdf=jnp.zeros(r),
      eta=jnp.ones(r), is_delta=jnp.ones(r, bool),
      is_diffuse=jnp.zeros(r, bool), is_reflection=jnp.zeros(r, bool),
      medium=sd.medium)
  zeros = result
  for cls in classes:
    cls_mask = sd.mat.cls == cls
    if cls == MC.Principled:
      fn = lambda m: _principled_sample(scene, sd, rnd, spectral, mask=m)
    elif cls == MC.Diffuse:
      fn = lambda m: lobes.diffuse_sample(scene, sd, rnd, spectral,
                                          variations, mask=m)
    elif cls in _WALK_CLASSES:
      fn = functools.partial(
          lambda c, m: _SAMPLERS[c](scene, sd, rnd, spectral, mask=m), cls)
    elif cls in _SAMPLERS:
      fn = functools.partial(
          lambda c, m: _SAMPLERS[c](scene, sd, rnd, spectral), cls)
    else:  # Void
      continue
    if len(classes) > 1 and cls in _cond_classes():
      # real control flow: a bounce whose wavefront holds no lanes of this
      # class skips its whole subgraph (classes localize spatially)
      out = jax.lax.cond(jnp.any(cls_mask),
                         lambda fn=fn, m=cls_mask: fn(m), lambda: zeros)
    else:
      out = fn(cls_mask)
    result = _select_sample(cls_mask, out, result)
  return result


def _sample_branch_fns(scene, spectral, classes, variations):
  """lax.switch branches for sorted sample: one per class + mixed/sink."""
  fns = []
  for cls in classes:
    if cls == MC.Principled:
      f = lambda xs: _principled_sample(scene, xs[0], xs[1], spectral)
    elif cls == MC.Diffuse:
      f = lambda xs: lobes.diffuse_sample(scene, xs[0], xs[1], spectral,
                                          variations)
    elif cls in _SAMPLERS:
      f = functools.partial(
          lambda c, xs: _SAMPLERS[c](scene, xs[0], xs[1], spectral), cls)
    else:  # Void: null lobe -> init result (masked loop skips it too)
      f = lambda xs: _sample_init(xs[0], spectral)
    fns.append(f)
  fns.append(lambda xs: _sample_masked(scene, xs[0], xs[1], spectral,
                                       classes, variations))
  return fns


def _sample_sorted(scene, sd, rnd, spectral, classes, variations, tile):
  r = sd.w_i.shape[0]
  perm, pos, k = _class_perm(sd.mat.cls, classes)
  sd_s = _permute(sd, perm)
  rnd_s = rnd[perm]
  branches = _tile_branches(k[perm], tile, len(classes))
  n_tiles = r // tile
  xs = (_tile_reshape(sd_s, n_tiles, tile),
        rnd_s.reshape(n_tiles, tile, -1))
  out = _scan_tiles(_sample_branch_fns(scene, spectral, classes, variations),
                    branches, xs, tile)
  return _permute(_tile_flatten(out, r), pos)


def _sample_init(sd, spectral) -> lobes.BSDFSampleR:
  r = sd.w_i.shape[0]
  c = spx.channels(spectral)
  return lobes.BSDFSampleR(
      w_o=sd.w_i, weight=jnp.zeros((r, c)), pdf=jnp.zeros(r),
      eta=jnp.ones(r), is_delta=jnp.ones(r, bool),
      is_diffuse=jnp.zeros(r, bool), is_reflection=jnp.zeros(r, bool),
      medium=sd.medium)


def evaluate(scene, sd: lobes.ShadingData, w_o, spectral: bool, classes: tuple,
             variations: tuple = (0,)):
  """bsdf::evaluate: returns (bsdf_with_cos (R,C), pdf (R,))."""
  tile = _sorted_tile(sd.w_i.shape[0], classes)
  if tile:
    return _evaluate_sorted(scene, sd, w_o, spectral, classes, variations,
                            tile)
  return _evaluate_masked(scene, sd, w_o, spectral, classes, variations)


def _evaluate_branch_fns(scene, spectral, classes, variations):
  fns = []
  for cls in classes:
    if cls == MC.Principled:
      f = lambda xs: _principled_evaluate(scene, xs[0], xs[1], spectral)
    elif cls == MC.Diffuse:
      f = lambda xs: lobes.diffuse_evaluate(scene, xs[0], xs[1], spectral,
                                            variations)
    elif cls in _EVALUATORS:
      f = functools.partial(
          lambda c, xs: _EVALUATORS[c](scene, xs[0], xs[1], spectral), cls)
    else:  # delta/null classes evaluate to zero
      f = lambda xs: _evaluate_zeros(xs[0], spectral)
    fns.append(f)
  fns.append(lambda xs: _evaluate_masked(scene, xs[0], xs[1], spectral,
                                         classes, variations))
  return fns


def _evaluate_zeros(sd, spectral):
  r = sd.w_i.shape[0]
  return jnp.zeros((r, spx.channels(spectral))), jnp.zeros(r)


def _evaluate_sorted(scene, sd, w_o, spectral, classes, variations, tile):
  r = sd.w_i.shape[0]
  perm, pos, k = _class_perm(sd.mat.cls, classes)
  sd_s = _permute(sd, perm)
  branches = _tile_branches(k[perm], tile, len(classes))
  n_tiles = r // tile
  xs = (_tile_reshape(sd_s, n_tiles, tile), w_o[perm].reshape(n_tiles, tile, 3))
  b, p = _scan_tiles(
      _evaluate_branch_fns(scene, spectral, classes, variations),
      branches, xs, tile)
  return b.reshape(r, -1)[pos], p.reshape(r)[pos]


def _evaluate_masked(scene, sd: lobes.ShadingData, w_o, spectral: bool,
                     classes: tuple, variations: tuple = (0,)):
  r = sd.w_i.shape[0]
  c = spx.channels(spectral)
  bsdf = jnp.zeros((r, c))
  pdf = jnp.zeros(r)
  zeros = (bsdf, pdf)
  for cls in classes:
    cls_mask = sd.mat.cls == cls
    if cls == MC.Principled:
      fn = lambda m: _principled_evaluate(scene, sd, w_o, spectral, mask=m)
    elif cls == MC.Diffuse:
      fn = lambda m: lobes.diffuse_evaluate(scene, sd, w_o, spectral,
                                            variations, mask=m)
    elif cls in _WALK_CLASSES:
      fn = functools.partial(
          lambda c, m: _EVALUATORS[c](scene, sd, w_o, spectral, mask=m), cls)
    elif cls in _EVALUATORS:
      fn = functools.partial(
          lambda c, m: _EVALUATORS[c](scene, sd, w_o, spectral), cls)
    else:
      continue
    if len(classes) > 1 and cls in _cond_classes():
      b, p = jax.lax.cond(jnp.any(cls_mask),
                          lambda fn=fn, m=cls_mask: fn(m), lambda: zeros)
    else:
      b, p = fn(cls_mask)
    bsdf = jnp.where(cls_mask[..., None], b, bsdf)
    pdf = jnp.where(cls_mask, p, pdf)
  return bsdf, pdf


_PDFS = {
    MC.Diffuse: lobes.diffuse_pdf,
    MC.Translucent: lobes.translucent_pdf,
    MC.Plastic: lobes.plastic_pdf,
    MC.Conductor: lobes.conductor_pdf,
    MC.Dielectric: lobes.dielectric_pdf,
    MC.Velvet: lobes.velvet_pdf,
}


def pdf(scene, sd: lobes.ShadingData, w_o, spectral: bool, classes: tuple):
  # per-lobe analytic pdfs: evaluating the full MS walks just for a pdf
  # would instantiate their while_loops at every reverse_pdf call site
  # (pdfs never depend on the diffuse variation, bsdf_various.hxx:113-121)
  r = sd.w_i.shape[0]
  p = jnp.zeros(r)
  for cls in classes:
    if cls == MC.Principled:
      pp = _principled_pdf(scene, sd, w_o, spectral)
    elif cls in _PDFS:
      pp = _PDFS[cls](scene, sd, w_o, spectral)
    else:
      continue
    p = jnp.where(sd.mat.cls == cls, pp, p)
  return p


def reverse_pdf(scene, sd: lobes.ShadingData, w_o, spectral: bool, classes: tuple):
  """pdf of sampling the reverse direction (scene_bsdf.hxx:80-90)."""
  rev_sd = sd._replace(w_i=-w_o)
  return pdf(scene, rev_sd, -sd.w_i, spectral, classes)


def fix_shading_normal(geo_n, sh_n, w_i, w_o):
  """Light-transport shading-normal correction (bsdf.hxx:232-239)."""
  import jax.numpy as jnp
  from etx_tracer_tpu.core import math as em
  w_i_g = em.dot(w_i, geo_n)
  w_i_s = em.dot(w_i, sh_n)
  w_o_g = em.dot(w_o, geo_n)
  w_o_s = em.dot(w_o, sh_n)
  den = jnp.maximum(em.kInvMaxHalf, jnp.abs(w_o_s * w_i_g))
  return jnp.abs(w_o_g * w_i_s) / den


def albedo(scene, sd: lobes.ShadingData, spectral: bool):
  """bsdf::albedo — scattering color (conductor: reflectance)."""
  scat = spx.query_spd(scene, sd.mat.scattering_spec, sd.wl, spectral)
  refl = spx.query_spd(scene, sd.mat.reflectance_spec, sd.wl, spectral)
  use_refl = (sd.mat.cls == MC.Conductor) | (sd.mat.cls == MC.Mirror)
  return jnp.where(use_refl[..., None], refl, scat)


def is_delta(sd: lobes.ShadingData):
  """Static-material delta test (scene_bsdf.hxx is_delta dispatch)."""
  rough_max = jnp.maximum(sd.mat.roughness[..., 0], sd.mat.roughness[..., 1])
  cls = sd.mat.cls
  rough_delta = rough_max <= lobes.kDeltaAlpha
  always = (cls == MC.Mirror) | (cls == MC.Thinfilm) | (cls == MC.Void)
  rough_classes = (cls == MC.Conductor) | (cls == MC.Dielectric)
  return always | (rough_classes & rough_delta)


# ---------------------------------------------------------------------------
# Principled: deterministic conductor/dielectric/plastic mixture
# ---------------------------------------------------------------------------


def _principled_variants(scene, sd):
  """Three material views with IORs overridden as the reference does."""
  # conductor view: default conductor eta/k (constantish high-k metal)
  mc = sd.mat._replace(
      int_ior_cls=jnp.full_like(sd.mat.int_ior_cls, 2),  # CLASS_CONDUCTOR
  )
  sdc = sd._replace(mat=mc)
  # dielectric/plastic view keeps the material's dielectric IOR
  return sdc, sd


def _principled_factors(scene, sd):
  """Image-modulated metalness/transmission (glTF metallicRoughness B
  channel and KHR transmission textures; scene_representation.cxx:2277-2283
  channel selects — split to greyscale images at load, channel 0 here).

  Intentional deviation from the reference: bsdf_principled.hxx:46/82/108
  uses the RAW transmission factor (only metalness samples its texture);
  here transmissionTexture modulates the factor as the KHR_materials_
  transmission spec requires. Consistent across sample/evaluate/pdf."""
  from etx_tracer_tpu.render import images as images_mod
  ch0 = jnp.zeros_like(sd.mat.metalness_img)
  metal = sd.mat.metalness * images_mod.scalar_image(
      scene, sd.mat.metalness_img, sd.tex, ch0, 1.0)
  trans = sd.mat.transmission * images_mod.scalar_image(
      scene, sd.mat.transmission_img, sd.tex, ch0, 1.0)
  return metal, trans


def _principled_pdf(scene, sd, w_o, spectral):
  """Walk-free principled pdf: the same metal/transmission mixture as
  _principled_evaluate but over the analytic per-lobe pdfs."""
  metal, trans = _principled_factors(scene, sd)
  sdc, sdd = _principled_variants(scene, sd)
  p_c = lobes.conductor_pdf(scene, sdc, w_o, spectral)
  p_d = lobes.dielectric_pdf(scene, sdd, w_o, spectral)
  p_p = lobes.plastic_pdf(scene, sdd, w_o, spectral)
  return p_c * metal + p_d * (1.0 - metal) * trans \
      + p_p * (1.0 - metal) * (1.0 - trans)


def _principled_sample(scene, sd, rnd, spectral, mask=None):
  metal, trans = _principled_factors(scene, sd)
  sdc, sdd = _principled_variants(scene, sd)
  pick_metal = rnd[..., 5] < metal
  pick_trans = rnd[..., 6] < trans
  m = jnp.ones_like(pick_metal) if mask is None else mask
  s_cond = lobes.conductor_sample(scene, sdc, rnd, spectral,
                                  mask=m & pick_metal)
  s_diel = lobes.dielectric_sample(scene, sdd, rnd, spectral,
                                   mask=m & ~pick_metal & pick_trans)
  s_plas = lobes.plastic_sample(scene, sdd, rnd, spectral,
                                mask=m & ~pick_metal & ~pick_trans)
  non_metal = _select_sample(pick_trans, s_diel, s_plas)
  return _select_sample(pick_metal, s_cond, non_metal)


def _principled_evaluate(scene, sd, w_o, spectral, mask=None):
  metal, trans = _principled_factors(scene, sd)
  sdc, sdd = _principled_variants(scene, sd)
  w_c = metal
  w_d = (1.0 - metal) * trans
  w_p = (1.0 - metal) * (1.0 - trans)
  m = jnp.ones_like(w_c, bool) if mask is None else mask
  b_c, p_c = lobes.conductor_evaluate(scene, sdc, w_o, spectral,
                                      mask=m & (w_c > 0.0))
  b_d, p_d = lobes.dielectric_evaluate(scene, sdd, w_o, spectral,
                                       mask=m & (w_d > 0.0))
  b_p, p_p = lobes.plastic_evaluate(scene, sdd, w_o, spectral,
                                    mask=m & (w_p > 0.0))
  bsdf = b_c * w_c[..., None] + b_d * w_d[..., None] + b_p * w_p[..., None]
  p = p_c * w_c + p_d * w_d + p_p * w_p
  return bsdf, p
