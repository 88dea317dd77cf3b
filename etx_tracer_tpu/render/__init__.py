"""Render layer: spectral responses, camera, film, BSDFs, emitters, media."""
