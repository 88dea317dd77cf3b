"""BSDF system: vectorized lobes + masked dispatch over material classes.

Counterpart of the reference's per-class BSDF namespaces + switch dispatch
(render/shared/scene_bsdf.hxx:5-108, bsdf_*.hxx). On TPU there is no
per-ray branching: every lobe evaluates on the whole wavefront and results
are selected by material-class masks (each lobe is tens of VPU flops, far
cheaper than sorting/compaction for the lobe count involved).
"""

from etx_tracer_tpu.render.bsdf.dispatch import sample, evaluate, pdf, albedo, is_delta  # noqa: F401
