"""Public API: train / evaluate / sample / ood_score (SURVEY.md §0.1
"Public API mirrors the reference's train / evaluate / sample entry points").

Each function is config-driven (preset name or Config object + dot-path
overrides) and consumes/produces the shared orbax checkpoint format.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax

from apv_tpu.utils.config import Config, apply_overrides, get_preset


def _resolve(config: str | Config, overrides: list[str] | None) -> Config:
    cfg = get_preset(config) if isinstance(config, str) else config
    return apply_overrides(cfg, overrides or [])


def _decode_result_json(text: str):
    """Decode a results-dir JSON payload, tolerating the legacy
    double-encoded format (a JSON string containing JSON). Single owner
    of that quirk — _saved_config and info() both route through here."""
    d = json.loads(text)
    return json.loads(d) if isinstance(d, str) else d


def _saved_config(cfg: Config, checkpoint_dir: str | None = None,
                  name: str | None = None):
    """The config.json saved next to the checkpoint this cfg points at —
    or, with ``name``, next to that results-dir run — (None if absent)."""
    from apv_tpu.utils.config import config_from_dict

    if checkpoint_dir is not None:
        cfg_path = Path(checkpoint_dir).parent / "config.json"
    else:
        owner = name or cfg.checkpoint_of or cfg.name
        cfg_path = Path(cfg.results_dir) / owner / "config.json"
    if not cfg_path.exists():
        return None
    return config_from_dict(_decode_result_json(cfg_path.read_text()))


def _adopt_checkpoint_arch(cfg: Config, overrides: list[str] | None,
                           checkpoint_dir: str | None = None) -> Config:
    """Snap architecture-defining sections to the checkpoint's own saved
    config (round-2 advisor: a preset whose default moved — e.g. norm
    group→rms — must not build a mismatched restore template for an older
    checkpoint). The ``data`` section is adopted too: preprocessing must
    match training (scoring a binarized-trained Bernoulli model on
    unbinarized [0,1] levels — e.g. an MNIST checkpoint through the
    CIFAR-derived ``ood_suite`` preset, whose data.binarize=False — is a
    silent train/eval protocol mismatch, found round 3). Explicit CLI
    overrides are re-applied afterwards, so the user can still force a
    section knowingly."""
    import dataclasses

    saved = _saved_config(cfg, checkpoint_dir)
    if saved is None:
        return cfg
    cfg = dataclasses.replace(cfg, model=saved.model,
                              adversarial=saved.adversarial,
                              data=saved.data,
                              train=dataclasses.replace(
                                  cfg.train, ema_decay=saved.train.ema_decay,
                                  seed=saved.train.seed))
    return apply_overrides(cfg, overrides or [])


def _restore_state(cfg: Config, checkpoint_dir: str | None = None):
    from apv_tpu.training.step import make_train_fns
    from apv_tpu.utils import checkpoint as ckpt

    fns = make_train_fns(cfg)
    template = jax.eval_shape(fns.init_fn, jax.random.PRNGKey(0))
    # eval-only presets point at the training preset's results dir
    owner = cfg.checkpoint_of or cfg.name
    ckpt_dir = (Path(checkpoint_dir) if checkpoint_dir
                else Path(cfg.results_dir) / owner / "checkpoints")
    return ckpt.restore_checkpoint(ckpt_dir, template)


def _write_json(cfg: Config, name: str, data: dict) -> None:
    """Persist a result file next to the run. MetricLogger owns the
    process-0-only write rule under jax.distributed (every process runs
    the same eval compute, but P concurrent writers to one shared results
    file would interleave) — no second guard here, or the two copies
    drift."""
    from apv_tpu.utils.logging import MetricLogger
    MetricLogger(Path(cfg.results_dir) / cfg.name).write_json(name, data)


def _p(state, cfg):
    """Params eval-side entry points consume: the Polyak average when
    train.ema_decay is on (training/state.eval_params)."""
    from apv_tpu.training.state import eval_params
    return eval_params(state, cfg)


def _d(state, cfg):
    """Latent-D params eval-side entry points consume (None when the run
    is non-adversarial). Biadversarial checkpoints store both Ds under
    d_params; scoring/SIR/export want only the z-space density-ratio D
    (models.latent_d_params)."""
    if not cfg.adversarial.enabled:
        return None
    from apv_tpu.models import latent_d_params
    return latent_d_params(cfg.adversarial.variant, state.d_params)


def train(config: str | Config = "mnist_vae", *,
          overrides: list[str] | None = None, resume: bool = False,
          max_steps: int | None = None, trace_dir: str | None = None,
          overwrite: bool = False):
    """Train the configured model; returns the final TrainState.

    ``overwrite=True`` lets a fresh (non-resume) run clear an existing
    checkpoint dir under the same name; without it the loop refuses.
    """
    from apv_tpu.training import train_loop
    cfg = _resolve(config, overrides)
    if resume:
        # A resumed run must rebuild the CHECKPOINT's architecture, not the
        # preset's current default (a preset default that moved — e.g.
        # activation gelu→silu — would otherwise silently push old weights
        # through new activations; same hazard _adopt_checkpoint_arch
        # guards on the eval-side entry points). Also restores the original
        # train.seed so Batcher.iter_from reproduces the run's data order.
        # Only when a checkpoint actually exists: config.json is written at
        # loop start (before any save), so a dir holding only config.json
        # from a crashed run must not silently pin a from-scratch run to
        # the dead run's architecture.
        from apv_tpu.utils import checkpoint as ckpt
        ckpt_dir = Path(cfg.results_dir) / cfg.name / "checkpoints"
        if ckpt.latest_step(ckpt_dir) is not None:
            cfg = _adopt_checkpoint_arch(cfg, overrides)
    return train_loop(cfg, resume=resume, max_steps=max_steps,
                      trace_dir=trace_dir, overwrite=overwrite)


def evaluate(config: str | Config = "iwae_eval", *,
             overrides: list[str] | None = None,
             checkpoint_dir: str | None = None, dataset: str | None = None,
             k: int | None = None, per_sample: bool = False,
             activity: bool = True, prior: str = "model",
             gmm_k: int = 10, flow_steps: int = 2000) -> dict:
    """IWAE-k test NLL + bits/dim for a trained checkpoint.

    ``activity=False`` skips the active-units diagnostic (a second full
    encoder pass over the test split) — for sweeps that only need NLL.

    ``prior='expost'``/``'expost_gmm'``/``'expost_flow'`` scores under an
    ex-post prior fitted to the TRAIN split (RAE lineage, arXiv
    1903.12436 §4) instead of the checkpoint's own prior — an exact
    closed-form density (no MC log-partition term), and the honest NLL
    counterpart of the generation-side ``sample --prior expost*`` modes.
    ``flow_steps`` is the flow fit's MLE step count (core/flow.py).
    """
    from apv_tpu.eval.run import evaluate_nll, posterior_activity
    from apv_tpu.models import build_model

    if prior not in ("model", "expost", "expost_gmm", "expost_flow"):
        raise ValueError(f"unknown prior {prior!r} "
                         "(model|expost|expost_gmm|expost_flow)")
    cfg = _adopt_checkpoint_arch(_resolve(config, overrides), overrides,
                                 checkpoint_dir)
    state = _restore_state(cfg, checkpoint_dir)
    prior_moments = _expost_prior(cfg, build_model(cfg.model),
                                  _p(state, cfg), prior, gmm_k=gmm_k,
                                  flow_steps=flow_steps, split="train")
    result = evaluate_nll(cfg, _p(state, cfg), _d(state, cfg),
                          dataset=dataset, k=k, per_sample=per_sample,
                          prior_moments=prior_moments)
    if activity:
        # Posterior-collapse diagnostic (one cheap encoder pass next to the
        # IWAE-k sweep): active units per the IWAE paper's Cov_x(E_q[z]) test.
        result.update(posterior_activity(cfg, _p(state, cfg),
                                         dataset=dataset))
    out = {k_: v for k_, v in result.items() if k_ != "per_sample"}
    # Non-default priors write suffixed artifacts (eval_expost.json, ...)
    # so rescoring under another prior can never silently overwrite the
    # checkpoint's own eval.json before it is committed (round-4 lesson:
    # the gb shaped headline lived only in prose after an expost rerun
    # clobbered the single-file name).
    suffix = "" if prior == "model" else f"_{prior}"
    _write_json(cfg, f"eval{suffix}.json", out)
    return result


def sample(config: str | Config = "mnist_vae", *,
           overrides: list[str] | None = None,
           checkpoint_dir: str | None = None, n: int = 64,
           mode: str = "mean", seed: int = 0,
           out_path: str | None = None, quality_n: int = 0,
           refine: int = 0, prior: str = "auto", gmm_k: int = 10,
           flow_steps: int = 2000, temperature: float = 1.0):
    """Decode n prior samples; writes a PNG grid, returns the images.

    ``quality_n > 0`` additionally computes generated-vs-real sample-quality
    distances over that many samples (random-feature Fréchet distance +
    RBF-MMD²; eval/sample_quality.py) and writes sample_quality.json.

    ``refine > 0`` runs that many MALA steps on the adversarially-shaped
    prior after the SIR draw (sampling/run.py module docstring) — the
    escape hatch for converged models whose sharp D collapses the SIR
    pool's effective sample size. Prints the sampler diagnostics
    (SIR ESS, MALA acceptance) alongside.

    ``prior``: 'auto' draws from the model's own prior (adversarially
    shaped when a D exists, else N(0,I)); 'standard' forces N(0,I);
    'expost' fits a diagonal Gaussian to the aggregate posterior over the
    test split and decodes from that (ex-post density estimation — the
    remedy when the trained prior under-disperses vs q(z), see
    `--visualize latent` and RESULTS.md 800k A/B); 'expost_gmm' EM-fits a
    ``gmm_k``-component diagonal GMM instead (RAE lineage, arXiv
    1903.12436 §4) — carries the aggregate posterior's heavy tails the
    single Gaussian cannot; 'expost_flow' MLE-fits a RealNVP flow
    (core/flow.py, ``flow_steps`` fit steps) — the exact-density rung
    above the GMM for tails/curvature neither parametric fit carries.
    """
    from apv_tpu.models import build_model, d_apply_fn, make_latent_d
    from apv_tpu.sampling import generate_samples, save_image_grid

    if prior not in ("auto", "standard", "expost", "expost_gmm",
                     "expost_flow"):
        raise ValueError(f"unknown prior {prior!r} "
                         "(auto|standard|expost|expost_gmm|expost_flow)")
    cfg = _adopt_checkpoint_arch(_resolve(config, overrides), overrides,
                                 checkpoint_dir)
    state = _restore_state(cfg, checkpoint_dir)
    model = build_model(cfg.model)
    d_apply = d_params = None
    if cfg.adversarial.enabled and prior == "auto":
        # d_apply_fn gives a stable function identity so the cached jitted
        # sampling pass is reused across calls (sampling/run._sample_fn)
        d_apply = d_apply_fn(make_latent_d(cfg.adversarial))
        d_params = _d(state, cfg)
    prior_moments = _expost_prior(cfg, model, _p(state, cfg), prior,
                                  gmm_k=gmm_k, flow_steps=flow_steps,
                                  seed=seed)
    # 'auto' on a flow-prior checkpoint = the model's own trained prior;
    # 'standard' still forces N(0,I) (model_prior False). On a trainable-
    # gaussian-base checkpoint (model.prior='gaussian'), 'auto' rides the
    # SIR/D machinery over the learned base (model_base).
    model_prior = (getattr(cfg.model, "prior", "standard") == "flow"
                   and prior == "auto")
    model_base = (getattr(cfg.model, "prior", "standard") == "gaussian"
                  and prior == "auto")
    images, diag = generate_samples(
        model, _p(state, cfg), jax.random.PRNGKey(seed),
        n, cfg.model.z_dim, cfg.model.likelihood,
        cfg.model.image_shape[2], d_apply=d_apply,
        d_params=d_params, mode=mode, refine_steps=refine,
        prior_moments=prior_moments, model_prior=model_prior,
        model_base=model_base, temperature=temperature,
        return_diagnostics=True)
    if diag:
        print(json.dumps({"sampler_diagnostics": diag}))
    # Non-default priors and temperatures get suffixed artifact names
    # (samples_expost.png, sample_quality_T0.8.json, ...) so an A/B over
    # --prior or --temperature can never overwrite the default-protocol
    # headline files pre-commit (round-4 evidence-retention lesson;
    # snapshot_watcher.py did this externally, now the entry point owns
    # it).
    suffix = "" if prior == "auto" else f"_{prior}"
    if temperature != 1.0:
        suffix += f"_T{temperature:g}"
    path = (out_path
            or Path(cfg.results_dir) / cfg.name / f"samples{suffix}.png")
    save_image_grid(images, path)
    if quality_n > 0:
        from apv_tpu.eval.sample_quality import sample_quality
        metrics = sample_quality(cfg, _p(state, cfg),
                                 d_params if prior == "auto" else None,
                                 n=quality_n, seed=seed,
                                 refine_steps=refine,
                                 prior_moments=prior_moments,
                                 model_prior=model_prior,
                                 model_base=model_base,
                                 temperature=temperature)
        metrics["prior"] = prior
        _write_json(cfg, f"sample_quality{suffix}.json", metrics)
        print(json.dumps(metrics, indent=2))
    return images


def _expost_prior(cfg: Config, model, params, prior: str, *,
                  gmm_k: int = 10, flow_steps: int = 2000, seed: int = 0,
                  max_examples: int = 2048, split: str = "test"):
    """Fit the requested ex-post prior (preprocessed the way training
    saw it): ``(mean, var)`` for 'expost', ``(log_w, means, vars)`` for
    'expost_gmm', a flow params dict for 'expost_flow', None for model
    priors.

    ``split``: generation-side callers fit the test split (the recorded
    A/B protocol — the comparison target is the test set either way);
    the NLL path fits the TRAIN split, since fitting a prior on the very
    examples it is then scored on would leak."""
    if prior not in ("expost", "expost_gmm", "expost_flow"):
        return None
    from apv_tpu.eval.run import _prep_eval_batch, eval_arrays
    from apv_tpu.sampling.run import (expost_prior_flow, expost_prior_gmm,
                                      expost_prior_moments)

    if split == "test":
        images = eval_arrays(cfg, None, max_examples=max_examples)["image"]
    else:
        from apv_tpu.data import load_dataset, static_binarize
        images, _ = load_dataset(cfg.data.dataset, "train",
                                 data_dir=cfg.data.data_dir,
                                 synthetic_size=cfg.data.synthetic_size)
        if cfg.data.binarize:
            # the training loop's binarization rule (training/loop.py)
            images = static_binarize(images, seed=cfg.train.seed)
        images = images[:max_examples]
    x_in, _ = _prep_eval_batch(cfg, images[:max_examples])
    if prior == "expost":
        return expost_prior_moments(model, params, x_in)
    if prior == "expost_flow":
        flow = expost_prior_flow(model, params, x_in,
                                 jax.random.PRNGKey(seed),
                                 steps=flow_steps)
        print(json.dumps({"expost_flow_fit_nll":
                          float(flow["flow_nll"])}))
        return flow
    return expost_prior_gmm(model, params, x_in,
                            jax.random.PRNGKey(seed), k=gmm_k)


def visualize(config: str | Config = "mnist_vae", *,
              overrides: list[str] | None = None,
              checkpoint_dir: str | None = None, what: str = "reconstruct",
              n: int = 8, steps: int = 8, seed: int = 0, mode: str = "mean",
              out_path: str | None = None, refine: int = 0):
    """Reconstruction / latent-interpolation grids (L6 visualization).

    ``what='reconstruct'``: first n test images over their q(z|x)-sample
    reconstructions (top row originals, bottom row reconstructions).
    ``what='interpolate'``: n pairs of test images, slerp in latent space,
    one row per pair with ``steps`` columns.
    ``what='latent'``: scatter of the aggregate posterior vs the N(0,I)
    prior vs the adversarially-shaped prior on the posterior's top-2 PCs
    (min 256 points; ``refine`` applies MALA steps to the shaped-prior
    draws) — the direct picture of what the adversarial prior learned.
    """
    import numpy as np

    from apv_tpu.eval.run import _prep_eval_batch, eval_arrays
    from apv_tpu.models import build_model
    from apv_tpu.sampling import (latent_interpolate, reconstruct_images,
                                  save_image_grid)

    cfg = _adopt_checkpoint_arch(_resolve(config, overrides), overrides,
                                 checkpoint_dir)
    state = _restore_state(cfg, checkpoint_dir)
    model = build_model(cfg.model)
    if what == "latent":
        need = max(n, 256)          # a scatter needs a cloud, not a grid
    elif what == "reconstruct":
        need = n
    else:
        need = 2 * n
    arrays = eval_arrays(cfg, None, max_examples=need)
    x_in, x_levels = _prep_eval_batch(cfg, arrays["image"][:need])

    if what == "latent":
        from apv_tpu.models import d_apply_fn, make_latent_d
        from apv_tpu.sampling.latent_viz import (latent_scatter_data,
                                                 save_latent_scatter)
        d_apply = d_params = None
        if cfg.adversarial.enabled:
            d_apply = d_apply_fn(make_latent_d(cfg.adversarial))
            d_params = _d(state, cfg)
        elif refine > 0:
            raise ValueError("refine applies to the adversarially-shaped "
                             "prior; this model has no latent "
                             "discriminator — drop --refine")
        data = latent_scatter_data(model, _p(state, cfg), x_in,
                                   jax.random.PRNGKey(seed),
                                   cfg.model.z_dim, d_apply=d_apply,
                                   d_params=d_params, refine_steps=refine)
        path = out_path or (Path(cfg.results_dir) / cfg.name
                            / "latent_scatter.png")
        save_latent_scatter(data, path, title=cfg.name)
        return data

    if what == "reconstruct":
        recon = reconstruct_images(model, _p(state, cfg), x_in,
                                   jax.random.PRNGKey(seed),
                                   cfg.model.likelihood,
                                   cfg.model.image_shape[2], mode=mode)
        grid = np.concatenate([np.asarray(x_levels), np.asarray(recon)])
        path = out_path or (Path(cfg.results_dir) / cfg.name
                            / "reconstructions.png")
        save_image_grid(grid, path, cols=n)
        return recon
    if what == "interpolate":
        if len(x_in) < 2 * n:
            raise ValueError(
                f"interpolate needs 2*n={2 * n} test images for n={n} "
                f"pairs; the test split has {len(x_in)} — lower n or raise "
                "data.synthetic_size / eval.max_examples")
        frames = latent_interpolate(model, _p(state, cfg), x_in[:n], x_in[n:],
                                    steps, cfg.model.likelihood,
                                    cfg.model.image_shape[2])
        flat = np.asarray(frames).reshape((-1,) + frames.shape[2:])
        path = out_path or (Path(cfg.results_dir) / cfg.name
                            / "interpolation.png")
        save_image_grid(flat, path, cols=steps)
        return frames
    raise ValueError(f"unknown visualization {what!r} "
                     "(reconstruct|interpolate|latent)")


def export_artifact(config: str | Config = "mnist_vae", *,
                    overrides: list[str] | None = None,
                    checkpoint_dir: str | None = None,
                    what: str = "sampler", out_path: str | None = None,
                    quantize: str | None = None, refine: int = 0,
                    prior: str = "auto", gmm_k: int = 10,
                    flow_steps: int = 2000, temperature: float = 1.0):
    """AOT-export a serving artifact (StableHLO, params baked in).

    ``prior='expost'`` bakes the ex-post aggregate-posterior Gaussian
    (fit to the test split at export time) in as the sampler's
    generation prior — the measured-best mode on converged checkpoints
    (RESULTS.md 800k A/B); 'expost_gmm' bakes a ``gmm_k``-component
    ex-post GMM instead; 'expost_flow' bakes a RealNVP flow fit
    (core/flow.py — the inverse pass exports as part of the same
    StableHLO program). 'standard' forces N(0,I); 'auto' keeps the
    model's own (shaped) prior.
    """
    from apv_tpu import serving

    if prior not in ("auto", "standard", "expost", "expost_gmm",
                     "expost_flow"):
        raise ValueError(f"unknown prior {prior!r} "
                         "(auto|standard|expost|expost_gmm|expost_flow)")
    cfg = _adopt_checkpoint_arch(_resolve(config, overrides), overrides,
                                 checkpoint_dir)
    state = _restore_state(cfg, checkpoint_dir)
    out = out_path or (Path(cfg.results_dir) / cfg.name / f"{what}.stablehlo")
    if what == "sampler":
        d_params = _d(state, cfg) if prior == "auto" else None
        from apv_tpu.models import build_model
        prior_moments = _expost_prior(cfg, build_model(cfg.model),
                                      _p(state, cfg), prior, gmm_k=gmm_k,
                                      flow_steps=flow_steps)
        return serving.export_sampler(cfg, _p(state, cfg), d_params, out,
                                      quantize=quantize,
                                      refine_steps=refine,
                                      prior_moments=prior_moments,
                                      force_standard=(prior == "standard"),
                                      temperature=temperature)
    if what == "scorer":
        if refine:
            raise ValueError("refine is sampler-only (MALA on the shaped "
                             "prior); the scorer draws no prior samples")
        if prior != "auto":
            raise ValueError("prior is sampler-only: the scorer evaluates "
                             "the model's own (learned) prior density")
        if quantize is not None:
            raise ValueError("quantize is sampler-only: a silently "
                             "full-precision scorer artifact would "
                             "masquerade as quantized")
        d_params = _d(state, cfg)
        return serving.export_scorer(cfg, _p(state, cfg), out,
                                     d_params=d_params)
    raise ValueError(f"unknown artifact {what!r} (sampler|scorer)")


def _ckpt_steps_on_disk(ckpt_dir: Path) -> list[int]:
    """Checkpoint steps by directory listing (orbax layout: one numeric
    dir per step). Deliberately NOT via orbax: a CheckpointManager
    initializes the jax backend, and ``apv info`` must stay safe to run
    next to a live TPU job (one process at a time on this relay)."""
    if not ckpt_dir.exists():
        return []
    return sorted(int(p.name) for p in ckpt_dir.iterdir()
                  if p.is_dir() and p.name.isdigit())


def info(name: str | None = None, *,
         results_dir: str = "results") -> dict:
    """Introspect the results directory without touching any device.

    Without ``name``: one summary row per run (config highlights, latest
    checkpoint step). With ``name``: the run's config highlights,
    checkpoint steps on disk, best-validation record, saved result files
    (eval/ood/sample_quality), and the last training-metrics record.
    """
    root = Path(results_dir)

    def _read(p: Path):
        try:
            return _decode_result_json(p.read_text())
        except (OSError, json.JSONDecodeError):
            return None

    def _summary(run: Path) -> dict:
        cfg = _read(run / "config.json") or {}
        model = cfg.get("model", {})
        adv = cfg.get("adversarial", {})
        steps = _ckpt_steps_on_disk(run / "checkpoints")
        return {
            "name": run.name,
            "family": model.get("family"),
            "z_dim": model.get("z_dim"),
            "likelihood": model.get("likelihood"),
            "adversarial": (adv.get("variant") if adv.get("enabled")
                            else None),
            "dataset": cfg.get("data", {}).get("dataset"),
            "train_steps": cfg.get("train", {}).get("steps"),
            "latest_checkpoint": steps[-1] if steps else None,
        }

    if name is None:
        runs = sorted(p for p in root.iterdir()
                      if p.is_dir() and (p / "config.json").exists()) \
            if root.exists() else []
        return {"results_dir": str(root),
                "runs": [_summary(r) for r in runs]}

    run = root / name
    if not (run / "config.json").exists():
        raise FileNotFoundError(
            f"no run named {name!r} under {root} (no config.json)")
    out = _summary(run)
    out["checkpoint_steps"] = _ckpt_steps_on_disk(run / "checkpoints")
    out["best"] = _read(run / "best.json")
    # Default names plus the prior-suffixed variants evaluate/sample
    # write for --prior != default (eval_expost.json, sample_quality_
    # expost_flow.json, ...) — sorted so introspection order is stable.
    result_files = ["eval.json", "ood.json", "sample_quality.json"]
    result_files += sorted(
        p.name for p in run.glob("*.json")
        if (p.name.startswith(("eval_", "sample_quality_", "ood_"))
            and p.name not in result_files))
    for f in result_files:
        data = _read(run / f)
        if data is not None:
            out[f.removesuffix(".json")] = data
    metrics = run / "metrics.jsonl"
    if metrics.exists():
        last = None
        with metrics.open() as fh:
            for line in fh:
                if line.strip():
                    last = line
        if last:
            try:
                out["last_metrics"] = json.loads(last)
            except json.JSONDecodeError:
                pass
    return out


def _load_named_model(cfg: Config, name: str):
    """(cfg_b, params_b, d_params_b) for a results-dir name: architecture
    from its saved config.json (falls back to the preset registry), params
    from its checkpoint."""
    from apv_tpu.utils.config import get_preset

    cfg_b = _saved_config(cfg, name=name)
    if cfg_b is None:
        cfg_b = get_preset(name)
    state_b = _restore_state(cfg_b)
    # FULL d_params tree — the ood module routes latent/pixel subtrees
    # itself (models.latent_d_params); see eval/ood.py module docstring.
    d_params_b = state_b.d_params if cfg_b.adversarial.enabled else None
    # _p honours the named model's own train.ema_decay — scoring its raw
    # params while the primary model is scored with its Polyak average
    # would bias two-model ratios for EMA-trained checkpoints
    return cfg_b, _p(state_b, cfg_b), d_params_b


def ood_score(config: str | Config = "ood_suite", *,
              overrides: list[str] | None = None,
              checkpoint_dir: str | None = None, seed: int = 0,
              both: bool = False) -> dict:
    """Run the OOD scoring suite for the configured dataset pair.

    ``both=True`` also scores the reversed pair direction (with the
    ``ood.reverse_of`` checkpoint when set). ``ood.score='model_ratio'``
    loads the ``ood.baseline_of`` checkpoint as the denominator model.
    """
    from apv_tpu.eval.ood import ood_both, ood_scores

    cfg = _adopt_checkpoint_arch(_resolve(config, overrides), overrides,
                                 checkpoint_dir)
    state = _restore_state(cfg, checkpoint_dir)
    # FULL d_params tree (ood routes subtrees itself — pixel_d needs the
    # pixel one, likelihood scores the latent one)
    d_params = state.d_params if cfg.adversarial.enabled else None
    baseline = (None if cfg.ood.baseline_of is None
                else _load_named_model(cfg, cfg.ood.baseline_of))
    if both:
        reverse = (None if cfg.ood.reverse_of is None
                   else _load_named_model(cfg, cfg.ood.reverse_of))
        result = ood_both(cfg, _p(state, cfg), d_params, seed=seed,
                          baseline=baseline, reverse=reverse)
    else:
        result = ood_scores(cfg, _p(state, cfg), d_params, seed=seed,
                            baseline=baseline)
    _write_json(cfg, "ood.json", result)
    return result
