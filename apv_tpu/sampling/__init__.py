"""Sampling / visualization layer (SURVEY.md §1 L6)."""

from apv_tpu.sampling.run import (expost_prior_flow,  # noqa: F401
                                  expost_prior_gmm, expost_prior_moments,
                                  generate_samples, langevin_refine,
                                  latent_interpolate, posterior_draws,
                                  reconstruct_images, sample_prior,
                                  save_image_grid, sir_ess)
