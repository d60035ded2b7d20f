"""Sample-quality metrics for the sampling suite (SURVEY.md §2.5 L6).

The environment has no network and no pretrained Inception weights, so FID
proper is impossible; instead this module reports two self-contained
distributional distances between generated and real test images:

* ``frechet_rfd`` — the Fréchet distance computed in a **fixed, seeded
  random-conv feature space** (random untrained CNN features are a known
  cheap stand-in for Inception features in FID-style metrics). The feature
  net is deterministic given ``feature_seed``, so numbers are comparable
  across runs/checkpoints of the same image shape.
* ``mmd2_rbf`` — unbiased MMD² with an RBF kernel at the median-heuristic
  bandwidth, computed in the same feature space (kernel two-sample test;
  zero in expectation when the two sets share a distribution).
* ``density`` / ``coverage`` — the manifold fidelity/diversity pair of
  Naeem et al. 2020 (arXiv 2002.09797), computed in the same feature
  space with k-NN real-sample balls. Unlike the two scalar distances
  they separate failure modes: low density = samples off the real
  manifold (poor fidelity), low coverage = real modes no sample reaches
  (mode dropping). density ≈ 1 and coverage ≈ 1 when the two sets share
  a distribution.

All are monitoring/selection metrics (Fréchet/MMD²: lower is better;
density/coverage: higher is better); they rank models and detect
collapse, they are NOT comparable to published FID/PRDC numbers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def feature_params(key: jax.Array, c_in: int,
                   widths: tuple[int, ...] = (32, 64, 128)) -> list:
    """He-scaled random 3x3 conv kernels for the fixed feature net."""
    params = []
    for w in widths:
        key, k = jax.random.split(key)
        kern = jax.random.normal(k, (3, 3, c_in, w), jnp.float32)
        params.append(kern * np.sqrt(2.0 / (9 * c_in)))
        c_in = w
    return params


def extract_features(params: list, x: jax.Array) -> jax.Array:
    """[N,H,W,C] images in [0,1] → [N, 2*widths[-1]] pooled features.

    Stride-2 random convs + leaky_relu; global spatial mean and std are
    concatenated so the features see both level and texture statistics.
    """
    h = x.astype(jnp.float32) * 2.0 - 1.0
    for kern in params:
        h = jax.lax.conv_general_dilated(
            h, kern, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.leaky_relu(h, 0.2)
    mean = jnp.mean(h, axis=(1, 2))
    std = jnp.std(h, axis=(1, 2))
    return jnp.concatenate([mean, std], axis=-1)


def frechet_distance(f_a: np.ndarray, f_b: np.ndarray) -> float:
    """Fréchet (2-Wasserstein²) distance between Gaussians fit to two
    feature sets: |μa−μb|² + tr(Ca + Cb − 2·(Ca·Cb)^½)."""
    from scipy import linalg

    f_a = np.asarray(f_a, np.float64)
    f_b = np.asarray(f_b, np.float64)
    mu_a, mu_b = f_a.mean(0), f_b.mean(0)
    cov_a = np.cov(f_a, rowvar=False)
    cov_b = np.cov(f_b, rowvar=False)
    eps = 1e-6 * np.eye(cov_a.shape[0])
    covmean = linalg.sqrtm((cov_a + eps) @ (cov_b + eps))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    d2 = (np.sum((mu_a - mu_b) ** 2) + np.trace(cov_a) + np.trace(cov_b)
          - 2.0 * np.trace(covmean))
    return float(max(d2, 0.0))


def mmd2_rbf(f_a: np.ndarray, f_b: np.ndarray,
             bandwidth: float | None = None) -> float:
    """Unbiased MMD² estimate with an RBF kernel (median-heuristic
    bandwidth over the pooled pairwise distances when not given)."""
    f_a = np.asarray(f_a, np.float64)
    f_b = np.asarray(f_b, np.float64)

    def sq_dists(x, y):
        xx = (x * x).sum(1)[:, None]
        yy = (y * y).sum(1)[None, :]
        return np.maximum(xx + yy - 2.0 * (x @ y.T), 0.0)

    d_aa, d_bb, d_ab = sq_dists(f_a, f_a), sq_dists(f_b, f_b), sq_dists(f_a, f_b)
    if bandwidth is None:
        pooled = np.concatenate([
            d_aa[np.triu_indices_from(d_aa, 1)],
            d_bb[np.triu_indices_from(d_bb, 1)],
            d_ab.ravel()])
        med = float(np.median(pooled))
        bandwidth = np.sqrt(med / 2.0) if med > 0 else 1.0

    def k(d):
        return np.exp(-d / (2.0 * bandwidth ** 2))

    n, m = len(f_a), len(f_b)
    k_aa = (k(d_aa).sum() - n) / (n * (n - 1))      # drop diagonal (==1)
    k_bb = (k(d_bb).sum() - m) / (m * (m - 1))
    k_ab = k(d_ab).mean()
    return float(k_aa + k_bb - 2.0 * k_ab)


def density_coverage(f_real: np.ndarray, f_fake: np.ndarray,
                     k: int = 5) -> tuple[float, float]:
    """Density and coverage (Naeem et al. 2020, arXiv 2002.09797 eqs. 3-4).

    Both are built from the real samples' k-NN balls B(r_i, rad_k(r_i)),
    where rad_k(r_i) is the distance from real sample i to its k-th
    nearest OTHER real sample:

    * density  = (1/(kM)) Σ_j #{i : g_j ∈ B_i} — how densely fake samples
      land inside real-manifold balls, normalized so matched
      distributions score ≈ 1 (can exceed 1 for over-concentration).
    * coverage = (1/N) #{i : ∃ j, g_j ∈ B_i} — the fraction of real
      k-NN balls that contain at least one fake sample, in [0, 1].

    Improves on precision/recall-style metrics by being robust to fake
    outliers (an off-manifold fake inflates neither number).
    """
    f_real = np.asarray(f_real, np.float64)
    f_fake = np.asarray(f_fake, np.float64)
    if len(f_real) <= k:
        raise ValueError(f"density_coverage needs > k={k} real samples, "
                         f"got {len(f_real)}")

    def sq_dists(x, y):
        xx = (x * x).sum(1)[:, None]
        yy = (y * y).sum(1)[None, :]
        return np.maximum(xx + yy - 2.0 * (x @ y.T), 0.0)

    d_rr = sq_dists(f_real, f_real)
    # k-th nearest OTHER real point: column 0 of the sorted row is the
    # self-distance 0, so index k is the k-th neighbour proper.
    rad2 = np.sort(d_rr, axis=1)[:, k]          # [N] squared radii
    d_rf = sq_dists(f_real, f_fake)             # [N, M]
    inside = d_rf <= rad2[:, None]              # g_j ∈ B(r_i, rad_k(r_i))
    density = float(inside.sum() / (k * f_fake.shape[0]))
    coverage = float(inside.any(axis=1).mean())
    return density, coverage


def sample_quality(cfg, params, d_params=None, *, n: int = 2048,
                   seed: int = 0, feature_seed: int = 0, mesh=None,
                   batch_size: int = 256, mode: str = "sample",
                   refine_steps: int = 0, prior_moments=None,
                   model_prior: bool | None = None,
                   model_base: bool | None = None,
                   temperature: float = 1.0) -> dict:
    """Generated-vs-real distances for a checkpoint (config-5 suite
    extension; the reference's exact sample-quality reporting is
    unreadable — SURVEY.md §0 — so this ships as a monitoring metric).

    Real side: the test split with train-matched preprocessing (binarized
    MNIST stays 0/1, CIFAR uses the [0,1] bin centers). Generated side:
    ``generate_samples`` with pixel ``mode`` ('sample' scores the model's
    actual pixel distribution; 'mean' scores the de-noised decoder output).
    """
    if n < 2:
        # MMD's U-statistic divides by n(n-1) and the Fréchet term needs a
        # covariance — n<2 would silently write NaN into
        # sample_quality.json (non-standard JSON; strict parsers reject).
        raise ValueError(f"sample_quality needs n >= 2, got n={n}")
    from apv_tpu.eval.run import eval_arrays
    from apv_tpu.models import build_model, d_apply_fn, make_latent_d
    from apv_tpu.parallel import make_mesh, replicated
    from apv_tpu.sampling import generate_samples

    mesh = mesh if mesh is not None else make_mesh()
    model = build_model(cfg.model)
    d_apply = None
    if cfg.adversarial.enabled and d_params is not None:
        d_apply = d_apply_fn(make_latent_d(cfg.adversarial))
    if model_prior is None:
        # default: a flow-prior checkpoint scores its own trained prior
        # (unless an ex-post fit explicitly replaces it)
        model_prior = (getattr(cfg.model, "prior", "standard") == "flow"
                       and prior_moments is None)
    if model_base is None:
        # a trainable-gaussian-base checkpoint rides SIR/D over its base
        model_base = (getattr(cfg.model, "prior", "standard") == "gaussian"
                      and prior_moments is None)

    real = eval_arrays(cfg, None, max_examples=n)["image"]
    # Binarized configs store uint8 {0,1} (static_binarize's compact
    # host->HBM payload) — those are already pixel values, NOT 0-255
    # levels; only continuous uint8 data gets the /255 level scaling.
    if real.dtype == np.uint8 and not cfg.data.binarize:
        real = real.astype(np.float32) / 255.0
    real = np.asarray(real, np.float32)
    n = min(n, len(real))
    if n < 2:
        raise ValueError(f"sample_quality needs >= 2 real examples; the "
                         f"test split has {len(real)}")
    real = real[:n]

    h, w, c = cfg.model.image_shape
    fparams = feature_params(jax.random.PRNGKey(feature_seed), c)
    feat = jax.jit(lambda x: extract_features(fparams, x))

    params = jax.device_put(params, replicated(mesh))
    if d_params is not None:
        d_params = jax.device_put(d_params, replicated(mesh))

    f_real, f_fake = [], []
    key = jax.random.PRNGKey(seed)
    with mesh:
        for i in range(0, n, batch_size):
            b = min(batch_size, n - i)
            key, k_gen = jax.random.split(key)
            fake = generate_samples(model, params, k_gen, b, cfg.model.z_dim,
                                    cfg.model.likelihood, c, d_apply=d_apply,
                                    d_params=d_params, mode=mode,
                                    refine_steps=refine_steps,
                                    prior_moments=prior_moments,
                                    model_prior=model_prior,
                                    model_base=model_base,
                                    temperature=temperature)
            f_fake.append(np.asarray(feat(fake)))
            f_real.append(np.asarray(feat(real[i:i + b])))
    f_real = np.concatenate(f_real)
    f_fake = np.concatenate(f_fake)
    density, coverage = density_coverage(f_real, f_fake)
    return {
        "frechet_rfd": frechet_distance(f_real, f_fake),
        "mmd2_rbf": mmd2_rbf(f_real, f_fake),
        "density": density,
        "coverage": coverage,
        "n": int(n),
        "pixel_mode": mode,
        "feature_seed": int(feature_seed),
        "refine_steps": int(refine_steps),
    }
