"""Sampling / visualization layer (SURVEY.md §1 L6)."""

from apv_tpu.sampling.run import (generate_samples,  # noqa: F401
                                  latent_interpolate, reconstruct_images,
                                  save_image_grid)
