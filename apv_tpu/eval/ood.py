"""OOD scoring suite (SURVEY.md §2.5, §3.5 — config 5).

Per-sample scores on an in-distribution test set vs an OOD test set, AUROC
in both labelings. Score definitions (``cfg.ood.score`` — the reference's
exact ratio is [I]-level, SURVEY.md §3.5, so all plausible readings ship):

* ``iwae``: per-sample IWAE-k̃ log-likelihood under the model's prior.
* ``elbo``: single-sample ELBO (k=1) — cheap screen.
* ``prior_ratio``: log p*(x) - log p0(x): the same model scored with the
  adversarially-shaped prior vs the base N(0,I) prior. The log-partition
  cancels nothing here (it shifts every sample equally, so AUROC is
  unaffected; we still subtract the MC estimate for interpretability).
  This is the likelihood-*ratio* score that fixes the famous
  raw-likelihood OOD inversion (SURVEY.md §6).
* ``model_ratio``: log p_A(x) - log p_B(x) under two *checkpoints* — the
  other plausible reading of the reference's "likelihood ratios"
  (SURVEY.md §3.5 "exact ratio construction: VERIFY [I]"): typically A =
  adversarial-prior model, B = plain-prior baseline (``ood.baseline_of``).
  Both models score the SAME examples (data/eval settings are forced to
  the primary config's).
* ``pixel_d``: the biadversarial pixel discriminator's realness logit
  D_x(x) — one conv forward per image, no IWAE scan (biadversarial
  checkpoints only; eval/run.pixel_d_scores).
* ``complexity``: log p(x) + L(x), the input-complexity-adjusted
  likelihood (Serrà et al. 2020, arXiv 1909.11480): L(x) is a generic
  lossless compressor's codelength in nats (PNG here), so the score is a
  likelihood-ratio test of the model against a universal compressor —
  the de-confounded form of the raw-likelihood score (raw NLL tracks
  image complexity, which is what inverts CIFAR↔SVHN).

``d_params`` throughout this module is the checkpoint's FULL d_params
tree (biadversarial: {'latent', 'pixel'}); likelihood scores route the
latent subtree via ``models.latent_d_params``, ``pixel_d`` the pixel one.

``ood_both`` runs both pair directions (MNIST↔FashionMNIST etc.) in one
invocation, optionally with a second checkpoint trained on the other
dataset for the reversed direction.
"""

from __future__ import annotations

import dataclasses

import numpy as np
from sklearn.metrics import roc_auc_score

from apv_tpu.eval.run import evaluate_nll
from apv_tpu.utils.config import Config


def auroc(in_scores: np.ndarray, ood_scores: np.ndarray) -> float:
    """AUROC of 'higher score ⇒ in-distribution'."""
    y = np.concatenate([np.ones_like(in_scores), np.zeros_like(ood_scores)])
    s = np.concatenate([in_scores, ood_scores])
    return float(roc_auc_score(y, s))


def fpr_at_tpr(in_scores: np.ndarray, ood_scores: np.ndarray,
               tpr: float = 0.95) -> float:
    """FPR at the threshold admitting ``tpr`` of in-distribution inputs —
    the OOD literature's standard operating-point companion to AUROC
    (AUROC averages over all thresholds; a deployment picks ONE). Higher
    score ⇒ in-distribution; threshold = the in-score quantile passing
    ``tpr``, conservatively (ties count as admitted)."""
    thresh = np.quantile(in_scores, 1.0 - tpr, method="lower")
    return float(np.mean(ood_scores >= thresh))


def _per_sample(cfg: Config, params, d_params, dataset, *, use_adv, k, mesh,
                seed):
    return evaluate_nll(cfg, params, d_params, mesh=mesh, dataset=dataset,
                        k=k, chunk=min(cfg.ood.iwae_chunk, k),
                        max_examples=cfg.ood.max_examples,
                        use_adversarial_prior=use_adv, per_sample=True,
                        seed=seed, batch_size=cfg.ood.batch_size)["per_sample"]


def complexity_nats(cfg: Config, dataset: str) -> np.ndarray:
    """Per-image codelength L(x) in nats under a generic lossless
    compressor (PNG: deflate + 2-D scanline filters) — the complexity
    estimate of the ``complexity`` score.

    Encodes exactly the discrete pixel levels the model's likelihood
    scores (binarized configs: the {0,1} test binarization as {0,255}
    grayscale; continuous configs: the raw uint8 levels), so model
    codelength and compressor codelength price the same message. Host
    side and device-free by construction.
    """
    import io

    from PIL import Image

    from apv_tpu.eval.run import eval_arrays

    imgs = eval_arrays(cfg, dataset,
                       max_examples=cfg.ood.max_examples)["image"]
    if cfg.data.binarize:
        px = np.asarray(imgs, np.uint8) * 255
    elif imgs.dtype == np.uint8:
        px = imgs
    else:
        px = np.clip(np.asarray(imgs, np.float32) * 255.0 + 0.5,
                     0, 255).astype(np.uint8)
    out = np.empty(len(px), np.float64)
    ln2 = float(np.log(2.0))
    for i, im in enumerate(px):
        arr = im[..., 0] if im.shape[-1] == 1 else im
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG", optimize=True)
        out[i] = 8.0 * buf.getbuffer().nbytes * ln2
    return out


def _align_to(primary: Config, other: Config) -> Config:
    """Baseline/reverse models must score the SAME examples as the primary:
    take the other model's architecture/adversarial sections, the primary's
    data/eval/ood/train sections (train carries the test-binarization seed)."""
    return dataclasses.replace(other, data=primary.data, eval=primary.eval,
                               ood=primary.ood, train=primary.train)


def ood_scores(cfg: Config, params, d_params=None, *, mesh=None,
               seed: int = 0, baseline=None) -> dict:
    """Run the suite for (cfg.ood.in_dataset, cfg.ood.ood_dataset).

    ``baseline`` is ``(cfg_b, params_b, d_params_b)`` — required for
    ``score='model_ratio'`` (the denominator model). Returns per-direction
    AUROCs and summary stats.
    """
    from apv_tpu.models import latent_d_params

    score = cfg.ood.score
    k = cfg.ood.iwae_k if score != "elbo" else 1
    d_lat = latent_d_params(cfg.adversarial.variant, d_params)

    def score_dataset(name: str) -> np.ndarray:
        if score == "pixel_d":
            if (not cfg.adversarial.enabled
                    or cfg.adversarial.variant != "biadversarial"
                    or not (isinstance(d_params, dict)
                            and "pixel" in d_params)):
                raise ValueError(
                    "pixel_d score needs a biadversarial checkpoint "
                    "(adversarial.variant=biadversarial trains the "
                    "pixel-space discriminator it scores with)")
            from apv_tpu.eval.run import pixel_d_scores
            return pixel_d_scores(cfg, d_params["pixel"], mesh=mesh,
                                  dataset=name)
        if score == "prior_ratio":
            if d_lat is None or not cfg.adversarial.enabled:
                raise ValueError(
                    "prior_ratio score needs an adversarial checkpoint")
            adv = _per_sample(cfg, params, d_lat, name, use_adv=True,
                              k=k, mesh=mesh, seed=seed)
            base = _per_sample(cfg, params, d_lat, name, use_adv=False,
                               k=k, mesh=mesh, seed=seed)
            return adv - base
        if score == "model_ratio":
            if baseline is None:
                raise ValueError("model_ratio score needs a baseline model "
                                 "(ood.baseline_of)")
            cfg_b, params_b, d_params_b = baseline
            cfg_b = _align_to(cfg, cfg_b)
            a = _per_sample(cfg, params, d_lat, name,
                            use_adv=cfg.adversarial.enabled, k=k, mesh=mesh,
                            seed=seed)
            b = _per_sample(cfg_b, params_b,
                            latent_d_params(cfg_b.adversarial.variant,
                                            d_params_b), name,
                            use_adv=cfg_b.adversarial.enabled, k=k,
                            mesh=mesh, seed=seed)
            return a - b
        if score == "complexity":
            ll = _per_sample(cfg, params, d_lat, name,
                             use_adv=cfg.adversarial.enabled, k=k,
                             mesh=mesh, seed=seed)
            # eval_arrays order == scoring order; the batch loop may drop
            # a remainder, so align the codelengths to the scored prefix
            return ll + complexity_nats(cfg, name)[:len(ll)]
        if score not in ("iwae", "elbo"):
            # An unrecognized name must not silently fall through to the
            # expensive IWAE scorer under the typo'd label.
            raise ValueError(
                f"unknown ood.score {score!r} (iwae | elbo | prior_ratio "
                "| model_ratio | pixel_d | complexity)")
        return _per_sample(cfg, params, d_lat, name,
                           use_adv=cfg.adversarial.enabled, k=k, mesh=mesh,
                           seed=seed)

    in_s = score_dataset(cfg.ood.in_dataset)
    ood_s = score_dataset(cfg.ood.ood_dataset)
    return {
        "score": score,
        "in_dataset": cfg.ood.in_dataset,
        "ood_dataset": cfg.ood.ood_dataset,
        "auroc_in_vs_ood": auroc(in_s, ood_s),
        "auroc_ood_vs_in": auroc(-in_s, -ood_s),
        "fpr_at_95_tpr": fpr_at_tpr(in_s, ood_s),
        "in_mean": float(in_s.mean()), "ood_mean": float(ood_s.mean()),
        "n_in": int(in_s.shape[0]), "n_ood": int(ood_s.shape[0]),
    }


def ood_both(cfg: Config, params, d_params=None, *, mesh=None,
             seed: int = 0, baseline=None, reverse=None) -> dict:
    """Both pair directions in one invocation (config 5's "↔").

    Forward: (in_dataset vs ood_dataset) with this checkpoint. Reverse:
    datasets swapped, scored by ``reverse`` = ``(cfg_r, params_r,
    d_params_r)`` — a model trained on ood_dataset — or by this same
    checkpoint when no reverse model is given. With ``score='model_ratio'``
    and a reverse model, the reverse direction's denominator is THIS
    checkpoint (each direction: own-dataset model over the other's).
    """
    fwd = ood_scores(cfg, params, d_params, mesh=mesh, seed=seed,
                     baseline=baseline)
    swapped_ood = dataclasses.replace(
        cfg.ood, in_dataset=cfg.ood.ood_dataset,
        ood_dataset=cfg.ood.in_dataset)
    if reverse is not None:
        cfg_r, params_r, d_params_r = reverse
        cfg_r = dataclasses.replace(_align_to(cfg, cfg_r), ood=swapped_ood)
        rev_baseline = baseline
        if cfg.ood.score == "model_ratio":
            # model_ratio roles swap with the datasets: each direction is
            # scored with its own-dataset model as numerator and the OTHER
            # dataset's model as denominator. Keeping the forward baseline
            # here would make the reverse ratio identically zero whenever
            # reverse_of == baseline_of (numerator == denominator).
            rev_baseline = (cfg, params, d_params)
        rev = ood_scores(cfg_r, params_r, d_params_r, mesh=mesh, seed=seed,
                         baseline=rev_baseline)
    else:
        rev = ood_scores(dataclasses.replace(cfg, ood=swapped_ood), params,
                         d_params, mesh=mesh, seed=seed, baseline=baseline)
    return {"forward": fwd, "reverse": rev,
            "reverse_model": "own" if reverse is not None else "shared"}
