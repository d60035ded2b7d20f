"""Config-2 adversarial-schedule sweep (SURVEY.md §3.2: n_critic and the
GAN schedule are [I]-level reference unknowns; round-1 verdict item 6).

Trains short ``mnist_advprior`` variants and scores the config-5 pair
MNIST vs FashionMNIST. Two IWAE passes per dataset (shaped prior p* and
base prior p0, shared proposal seed) yield three scores per variant:

* ``prior_ratio`` AUROC — log p*(x) − log p0(x), the likelihood-ratio
  score config 5 exists for;
* ``adv`` AUROC — raw IWAE under the shaped prior;
* ``base`` AUROC — raw IWAE under N(0,I) (the control round 1 measured
  at 0.880 on the synthetic pair).

One JSON line per variant → --out (default /tmp/gan_sweep_results.jsonl).
Synthetic fallback data unless $APV_DATA_DIR is set. Run on the real chip
(one TPU process at a time; see CLAUDE.md):

    nohup python scripts/gan_sweep.py --steps 10000 > /tmp/gan_sweep.log &
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path

import numpy as np

from apv_tpu.eval.ood import auroc
from apv_tpu.eval.run import evaluate_nll
from apv_tpu.utils.compcache import enable_default_cache
from apv_tpu.utils.config import apply_overrides, get_preset

# name -> dot-path overrides on top of the mnist_advprior preset
VARIANTS: dict[str, list[str]] = {
    "base": [],
    "ls0.1": ["adversarial.label_smoothing=0.1"],
    "ncritic3": ["adversarial.n_critic=3"],
    "ncritic5": ["adversarial.n_critic=5"],
    "dlr4e-4": ["adversarial.d_lr=4e-4"],
    "dlr4e-4_nc3": ["adversarial.d_lr=4e-4", "adversarial.n_critic=3"],
    "w0.3": ["adversarial.weight=0.3"],
    "w3.0": ["adversarial.weight=3.0"],
    "ls0.1_dlr4e-4": ["adversarial.label_smoothing=0.1",
                      "adversarial.d_lr=4e-4"],
    "aae": ["adversarial.variant=aae"],
    # Round-3 fashion-counterpart variants (VERDICT r2 item 3: the
    # fashion-trained D converges soft, d_acc ~0.67, reverse AUROC 0.682 —
    # sharpen D without breaking the no-saturation rule the round-2 sweep
    # established). Run with --train-dataset fashion_mnist.
    "dlr1e-3": ["adversarial.d_lr=1e-3"],
    "dwide512": ["adversarial.d_widths=[512,512]"],
    "ncritic2_dlr4e-4": ["adversarial.n_critic=2", "adversarial.d_lr=4e-4"],
    "ls0.05_dlr1e-3": ["adversarial.label_smoothing=0.05",
                       "adversarial.d_lr=1e-3"],
    "dlr1e-3_dwide512": ["adversarial.d_lr=1e-3",
                         "adversarial.d_widths=[512,512]"],
}


def run_variant(name: str, overrides: list[str], *, steps: int,
                results_root: str, ood_k: int, max_examples: int,
                train_dataset: str = "mnist",
                ood_dataset: str = "fashion_mnist") -> dict:
    from apv_tpu.training import train_loop

    cfg = get_preset("mnist_advprior")
    cfg = dataclasses.replace(cfg, name=f"sweep_{name}",
                              results_dir=results_root)
    cfg = apply_overrides(cfg, [
        f"train.steps={steps}",
        f"train.checkpoint_every={steps}",
        "train.eval_every=0",            # no valid split: sweep scores OOD
        f"data.dataset={train_dataset}",
    ] + overrides)

    t0 = time.perf_counter()
    # overwrite: a sweep rerun into the same results root intends to retrain
    state = train_loop(cfg, overwrite=True)
    train_s = time.perf_counter() - t0

    # Tail of the training metrics — d_loss (not d_acc, which saturates
    # first; TODO.md) and the generator's adversarial term.
    tail: dict = {}
    mpath = Path(results_root) / cfg.name / "metrics.jsonl"
    if mpath.exists():
        lines = mpath.read_text().strip().splitlines()
        if lines:
            tail = json.loads(lines[-1])

    def per_sample(dataset: str, use_adv: bool) -> np.ndarray:
        return evaluate_nll(
            cfg, state.params, state.d_params, dataset=dataset, k=ood_k,
            chunk=min(50, ood_k), max_examples=max_examples,
            use_adversarial_prior=use_adv, per_sample=True, seed=0,
            batch_size=256)["per_sample"]

    t1 = time.perf_counter()
    scores = {ds: {"adv": per_sample(ds, True), "base": per_sample(ds, False)}
              for ds in (train_dataset, ood_dataset)}
    in_s, ood_s = scores[train_dataset], scores[ood_dataset]
    result = {
        "variant": name,
        "overrides": overrides,
        "steps": steps,
        "train_dataset": train_dataset,
        "ood_dataset": ood_dataset,
        "auroc_prior_ratio": auroc(in_s["adv"] - in_s["base"],
                                   ood_s["adv"] - ood_s["base"]),
        "auroc_adv_iwae": auroc(in_s["adv"], ood_s["adv"]),
        "auroc_base_iwae": auroc(in_s["base"], ood_s["base"]),
        "ratio_in_mean": float((in_s["adv"] - in_s["base"]).mean()),
        "ratio_ood_mean": float((ood_s["adv"] - ood_s["base"]).mean()),
        "final_d_loss": tail.get("d_loss"),
        "final_d_acc": tail.get("d_acc"),
        "final_g_adv": tail.get("g_adv"),
        "final_elbo": tail.get("elbo"),
        "train_s": round(train_s, 1),
        "eval_s": round(time.perf_counter() - t1, 1),
    }
    return result


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=10_000)
    p.add_argument("--variants", nargs="*", default=list(VARIANTS),
                   choices=list(VARIANTS))
    p.add_argument("--out", default="/tmp/gan_sweep_results.jsonl")
    p.add_argument("--results-root", default="/tmp/gan_sweep")
    p.add_argument("--ood-k", type=int, default=100)
    p.add_argument("--train-dataset", default="mnist",
                   help="in-distribution dataset the variants train on "
                        "(fashion_mnist for the reverse-direction sweep)")
    p.add_argument("--ood-dataset", default=None,
                   help="default: the other member of the MNIST pair")
    p.add_argument("--max-examples", type=int, default=2_000)
    p.add_argument("--platform", choices=("tpu", "cpu"), default=None,
                   help="force a JAX platform (smoke runs off-TPU; the "
                        "config update, not JAX_PLATFORMS — see CLAUDE.md)")
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    enable_default_cache()
    ood_dataset = args.ood_dataset or (
        "mnist" if args.train_dataset == "fashion_mnist" else "fashion_mnist")
    for name in args.variants:
        print(f"=== sweep variant {name} {VARIANTS[name]}", flush=True)
        result = run_variant(name, VARIANTS[name], steps=args.steps,
                             results_root=args.results_root,
                             ood_k=args.ood_k,
                             max_examples=args.max_examples,
                             train_dataset=args.train_dataset,
                             ood_dataset=ood_dataset)
        with open(args.out, "a") as f:
            f.write(json.dumps(result) + "\n")
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
