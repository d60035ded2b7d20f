"""Sampling / visualization layer (SURVEY.md §1 L6)."""

from apv_tpu.sampling.run import (expost_prior_moments,  # noqa: F401
                                  generate_samples, langevin_refine,
                                  latent_interpolate, reconstruct_images,
                                  sample_prior, save_image_grid, sir_ess)
