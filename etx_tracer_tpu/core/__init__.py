"""Core layer: math, RNG, spectra, distributions, options, logging.

TPU-native counterpart of the reference's `etx-core` + `render/shared` math
(sources/etx/core/, sources/etx/render/shared/math.hxx): instead of scalar
structs compiled for CPU+CUDA, everything operates on batched jnp arrays.
"""
