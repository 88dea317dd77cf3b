"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding logic is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), per the project's test strategy —
real-TPU runs happen in bench.py and the driver's dryrun.
"""

import os

# force CPU even when the shell pre-sets JAX_PLATFORMS (e.g. axon TPU):
# tests validate semantics; TPU runs happen in bench.py / the driver.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
