"""Utilities: options store, image IO, logging."""
