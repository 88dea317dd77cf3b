"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding logic is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), per the project's test strategy —
real-TPU runs happen in bench.py and the driver's dryrun.

NOTE: env vars are NOT enough here. The axon sitecustomize (PYTHONPATH=
/root/.axon_site) imports jax at interpreter startup — before conftest —
and register() forces jax_platforms="axon,cpu", so JAX_PLATFORMS=cpu in
the environment is silently ignored and every jit would compile through
the TPU tunnel (~40s per compile). jax.config.update after import wins as
long as backends are not yet initialized, which is the case at conftest
import time.
"""

import os

# XLA_FLAGS is read at backend initialization (later than import), so the
# env route still works for the virtual device count.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses that escape axon

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent executable cache: the suite is dominated by XLA:CPU compiles of
# the big pooled-render graphs; caching them makes repeat runs (and the fast
# tier) start in seconds instead of minutes.
jax.config.update("jax_compilation_cache_dir", "/tmp/etx_jaxcache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; axon sitecustomize re-forced the TPU backend")


def pytest_configure(config):
  # Heavy cross-integrator / media / SSS tests carry this marker so local
  # iteration can run `-m "not slow"`; the full suite (and the driver)
  # still runs everything.
  config.addinivalue_line("markers", "slow: multi-minute compile-heavy test")
