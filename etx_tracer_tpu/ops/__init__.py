"""Hot kernels: BVH build/traversal, ray-triangle intersection, compaction.

TPU-native replacement for the reference's native tracing backends (Embree in
rt/rt.cxx, OptiX in gpu/optix.cxx): host-built flattened BVH + batched
vectorized traversal, with Pallas kernels for the hottest paths.
"""
