"""Multi-chip scaling: device meshes, sharded rendering, film reductions.

The reference parallelizes over pixels with an enkiTS work-stealing pool
(render/host/tasks.cxx) inside one process. The TPU-native equivalent is
SPMD: pixels shard across a `jax.sharding.Mesh`, every device runs the same
wavefront step on its film slice, and cross-device reductions (light-image
psum, adaptive-sampling stats) ride ICI via XLA collectives.
"""

from etx_tracer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, render_iteration_sharded, render_samples_sharded,
    vcm_render_iteration_sharded)
