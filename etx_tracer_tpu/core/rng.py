"""Counter-based per-ray RNG, vectorized over whole wavefronts.

Reproduces the stream semantics of the reference sampler
(`/root/reference/sources/etx/render/shared/sampler.hxx`): a TEA-style hash of
(pixel_index, iteration) seeds a 32-bit mix-and-advance generator. Being
stateless-per-draw with a carried uint32 array, it is ideal for TPU: no
sequential dependence across rays, every draw is a handful of VPU integer ops.

The "fixed sample" mechanism (sampler.hxx:38-48) that lets integrators inject
externally chosen (e.g. blue-noise) numbers into the next draws is modelled
explicitly: callers pass pre-drawn arrays where the reference would have
pushed fixed values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def seed(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
  """TEA-style 16-round hash of two uint32 streams (sampler.hxx:54-64)."""
  v0 = a.astype(_U32)
  v1 = b.astype(_U32)
  s0 = _U32(0)

  def round_fn(i, carry):
    v0, v1, s0 = carry
    s0 = s0 + _U32(0x9E3779B9)
    v0 = v0 + ((((v1 << 4) + _U32(0xA341316C)) ^ (v1 + s0)) ^ ((v1 >> 5) + _U32(0xC8013EA4)))
    v1 = v1 + ((((v0 << 4) + _U32(0xAD90777D)) ^ (v0 + s0)) ^ ((v0 >> 5) + _U32(0x7E95761E)))
    return v0, v1, s0

  v0, v1, s0 = jax.lax.fori_loop(0, 16, round_fn, (v0, v1, s0))
  return v0


def next_float(state: jnp.ndarray):
  """Advance the generator; returns (new_state, uniform float32 in [0,1)).

  Matches sampler.hxx:66-77: xorshift/multiply mix, then mantissa-bitcast.
  """
  s = state
  s = (s ^ _U32(61)) ^ (s >> 16)
  s = s * _U32(9)
  s = s ^ (s >> 4)
  s = s * _U32(0x27D4EB2D)
  s = s ^ (s >> 15)
  bits = (s >> 9) | _U32(0x3F800000)
  f = jax.lax.bitcast_convert_type(bits, jnp.float32) - 1.0
  return s, f


def next_2d(state: jnp.ndarray):
  state, a = next_float(state)
  state, b = next_float(state)
  return state, jnp.stack([a, b], axis=-1)


def next_n(state: jnp.ndarray, n: int):
  """Draw n floats; returns (state, array with new trailing axis of size n)."""
  outs = []
  for _ in range(n):
    state, f = next_float(state)
    outs.append(f)
  return state, jnp.stack(outs, axis=-1)
