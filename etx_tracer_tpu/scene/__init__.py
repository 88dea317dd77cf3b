"""Scene layer: host-side loaders/staging and the frozen device-scene pytree.

Counterpart of the reference's render/host (SceneRepresentation, pools) and
render/shared/scene.hxx: the host stages geometry/materials/spectra with
numpy, then freezes one flat pytree of padded jnp arrays that every kernel
reads — the TPU analogue of the reference's ArrayView-based POD Scene.
"""

from etx_tracer_tpu.scene.types import DeviceScene, SceneConfig, MaterialClass, EmitterClass  # noqa: F401
