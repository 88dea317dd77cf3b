"""Atmosphere precompute tests."""

import numpy as np

from etx_tracer_tpu.scene import atmosphere as atm


class TestAtmosphere:
  def test_density_profile(self):
    d0 = atm.density(np.array([0.0]))
    d10k = atm.density(np.array([10000.0]))
    assert d0[0, 0] == 1.0 and d0[0, 1] == 1.0
    assert d10k[0, 0] < d0[0, 0] and d10k[0, 1] < d0[0, 1]
    # ozone peaks in the stratosphere (~25km), low at ground
    d25k = atm.density(np.array([25000.0]))
    assert d25k[0, 2] > d0[0, 2]

  def test_rayleigh_wavelength_dependence(self):
    # Rayleigh ~ 1/lambda^4: blue scatters much more than red
    assert atm.rayleigh_spectrum(450.0) > 3.0 * atm.rayleigh_spectrum(700.0)

  def test_sky_is_blue_and_sun_warm(self):
    lut = atm.build_optical_length_lut(64)
    sky = atm.generate_sky_image(atm.Parameters(), (64, 32), (0.0, 0.866, 0.5), lut)
    assert np.isfinite(sky).all()
    upper = sky[16:, :, :3]  # above-horizon rows (image stored top-down)
    assert upper[..., 2].mean() > upper[..., 0].mean()  # blue sky
    sun = atm.generate_sun_image(atm.Parameters(), (16, 16), (0.0, 0.866, 0.5))
    c = sun[8, 8, :3]
    assert c[0] > c[2]  # sun reddened by extinction
    assert np.isfinite(sun).all()

  def test_add_atmosphere_builds_emitters(self):
    from etx_tracer_tpu.scene.builder import SceneBuilder, MaterialDesc
    from etx_tracer_tpu.scene import types as st
    b = SceneBuilder()
    m = b.add_material(MaterialDesc(cls=st.MaterialClass.Diffuse, scattering_spec=1))
    b.add_mesh(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
               np.array([[0, 1, 2]], np.int32), m)
    atm.add_atmosphere(b, sky_size=(32, 16), sun_size=(8, 8))
    scene, config = b.build()
    assert config.num_env_emitters == 2
    cls = np.asarray(scene.emitters.cls)
    assert (cls == st.EmitterClass.Environment).sum() == 1
    assert (cls == st.EmitterClass.Directional).sum() == 1
