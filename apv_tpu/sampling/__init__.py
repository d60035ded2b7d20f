"""Sampling / visualization layer (SURVEY.md §1 L6)."""

from apv_tpu.sampling.run import generate_samples, save_image_grid  # noqa: F401
