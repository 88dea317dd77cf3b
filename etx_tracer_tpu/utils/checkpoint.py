"""Render checkpoint/resume: film state + progress to/from disk.

The reference cannot resume renders (SURVEY.md §5: restartable, not
resumable); this adds the film-state checkpointing the TPU build was asked
to provide: all film accumulators + iteration counter round-trip through a
single .npz. RNG needs no state — streams derive from (pixel, iteration).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from etx_tracer_tpu.render import film as film_mod

_FIELDS = ("camera", "variance_half", "normals", "albedo", "light",
           "light_iteration", "iteration")


def save_film(path: str, film_state: film_mod.FilmState):
  np.savez_compressed(path, **{
      f: np.asarray(getattr(film_state, f)) for f in _FIELDS})


def load_film(path: str) -> film_mod.FilmState:
  data = np.load(path)
  return film_mod.FilmState(**{f: jnp.asarray(data[f]) for f in _FIELDS})


def resume_iteration(film_state: film_mod.FilmState) -> int:
  """Next iteration index to render (deterministic continuation)."""
  return int(film_state.iteration)
