"""Runtime validation mode — the TPU analogue of ETX_VALIDATE.

The reference wraps ~300 sites with NaN/Inf guards compiled in only for
validation builds (render/shared/base.hxx:16-48). Here a static
``SceneConfig.validate`` flag injects `checkify` finite-checks after each
integrator stage; production configs compile zero extra code.

Usage: build the config with ``validate=True``, transform the step with
``checked(fn)`` and call it — the returned error names the first failing
stage (e.g. "non-finite in pt:bsdf_sample").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def check_finite(tag: str, **arrays) -> None:
  """Assert every array is finite; reports the stage and field name.

  Call sites gate on the static config flag, so this only traces in
  validating builds (ETX_CHECK_FINITE, render/shared/base.hxx:31-48).
  """
  for name, a in arrays.items():
    checkify.check(jnp.all(jnp.isfinite(a)),
                   f"non-finite in {tag}:{name}")


def checked(fn):
  """Wrap a (possibly jitted) step function so calls return the result and
  RAISE checkify.JaxRuntimeError on the first failed stage check."""
  cfn = checkify.checkify(fn, errors=checkify.user_checks)

  def run(*args, **kwargs):
    err, out = cfn(*args, **kwargs)
    checkify.check_error(err)
    return out

  return run
