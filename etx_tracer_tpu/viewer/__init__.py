"""Interactive web viewer (app-layer parity with sources/raytracer)."""
