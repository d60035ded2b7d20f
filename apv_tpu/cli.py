"""CLI: ``apv {train,evaluate,sample,ood} --preset <name> [--set k=v ...]``
(SURVEY.md §1 L7 — the reference's per-experiment script + flags tier).
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_common(p: argparse.ArgumentParser, default_preset: str) -> None:
    p.add_argument("--preset", default=default_preset,
                   help="named config preset (one of the five reference "
                        "configs)")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="PATH=VALUE",
                   help="dot-path config override, e.g. train.lr=3e-4")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (numerics debugging, "
                        "SURVEY.md §5)")
    p.add_argument("--platform", choices=("tpu", "cpu"), default=None,
                   help="force a JAX platform (cpu = run off-TPU; the "
                        "JAX_PLATFORMS env var alone is overridden by the "
                        "TPU relay's sitecustomize on this box)")


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="apv", description="TPU-native adversarial-prior VAE framework")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="train a model")
    _add_common(p_train, "mnist_vae")
    p_train.add_argument("--resume", action="store_true")
    p_train.add_argument("--overwrite", action="store_true",
                         help="let a fresh (non-resume) run clear an "
                              "existing checkpoint dir of the same name "
                              "(refused otherwise)")
    p_train.add_argument("--max-steps", type=int, default=None)
    p_train.add_argument("--trace-dir", default=None,
                         help="enable jax.profiler traces into this dir")
    p_train.add_argument("--distributed", action="store_true",
                         help="multi-host: jax.distributed.initialize from "
                              "APV_COORDINATOR / APV_NUM_PROCESSES / "
                              "APV_PROCESS_ID (one process per host)")

    p_eval = sub.add_parser("evaluate", help="IWAE-k NLL + bits/dim")
    _add_common(p_eval, "iwae_eval")
    p_eval.add_argument("--dataset", default=None)
    p_eval.add_argument("--k", type=int, default=None)
    p_eval.add_argument("--prior", choices=("model", "expost",
                                            "expost_gmm", "expost_flow"),
                        default="model",
                        help="score under the checkpoint's own prior, or "
                             "an ex-post (GMM / RealNVP-flow) prior fitted "
                             "to the train split — exact closed-form "
                             "density, no MC log-partition term")
    p_eval.add_argument("--gmm-k", type=int, default=10, metavar="K",
                        help="components for --prior expost_gmm")
    p_eval.add_argument("--flow-steps", type=int, default=2000,
                        metavar="N",
                        help="MLE fit steps for --prior expost_flow")

    p_sample = sub.add_parser("sample", help="decode prior samples to a grid")
    _add_common(p_sample, "mnist_vae")
    p_sample.add_argument("-n", type=int, default=64)
    p_sample.add_argument("--mode", choices=("mean", "sample"),
                          default="mean")
    p_sample.add_argument("--seed", type=int, default=0)
    p_sample.add_argument("--out", default=None)
    p_sample.add_argument("--visualize", choices=("reconstruct",
                                                  "interpolate", "latent"),
                          default=None,
                          help="instead of prior samples, write a test-set "
                               "reconstruction grid, a latent slerp grid "
                               "(-n rows, --steps columns), or a latent-"
                               "space scatter of aggregate posterior vs "
                               "prior vs shaped prior")
    p_sample.add_argument("--steps", type=int, default=8,
                          help="interpolation steps (with --visualize "
                               "interpolate)")
    p_sample.add_argument("--prior", choices=("auto", "standard", "expost",
                                              "expost_gmm", "expost_flow"),
                          default="auto",
                          help="latent draw: the model's own (shaped) "
                               "prior, forced N(0,I), an ex-post "
                               "aggregate-posterior Gaussian fit to the "
                               "test split (for priors that under-"
                               "disperse vs q(z)), an ex-post "
                               "--gmm-k-component GMM fit, or an ex-post "
                               "RealNVP flow fit (carries q's heavy "
                               "tails exactly)")
    p_sample.add_argument("--gmm-k", type=int, default=10, metavar="K",
                          help="components for --prior expost_gmm")
    p_sample.add_argument("--flow-steps", type=int, default=2000,
                          metavar="N",
                          help="MLE fit steps for --prior expost_flow")
    p_sample.add_argument("--refine", type=int, default=0, metavar="STEPS",
                          help="MALA refinement steps on the adversarially-"
                               "shaped prior after the SIR draw (0 = SIR "
                               "only); use when a converged D collapses "
                               "the SIR pool's effective sample size")
    p_sample.add_argument("--temperature", type=float, default=1.0,
                          metavar="T",
                          help="base-draw temperature for the model's own "
                               "trained prior (model.prior=flow/gaussian): "
                               "u ~ N(0, T²I) before the inverse pass "
                               "- T<1 trades flow-tail outliers for "
                               "sample typicality (Glow app. D; measured "
                               "on cifar_flow_100k, RESULTS.md)")
    p_sample.add_argument("--quality", type=int, default=0, metavar="N",
                          help="also compute generated-vs-real sample-"
                               "quality distances over N samples (random-"
                               "feature Fréchet + RBF-MMD²) → "
                               "sample_quality.json")

    p_ood = sub.add_parser("ood", help="OOD scoring suite")
    _add_common(p_ood, "ood_suite")
    p_ood.add_argument("--seed", type=int, default=0)
    p_ood.add_argument("--both", action="store_true",
                       help="also score the reversed dataset-pair direction "
                            "(uses ood.reverse_of checkpoint when set)")

    sub.add_parser("presets",
                   help="list the named config presets (the five reference "
                        "configs) with their docstrings")

    p_info = sub.add_parser("info",
                            help="introspect the results dir: list runs, "
                                 "or summarize one run's config/"
                                 "checkpoints/metrics (device-free — safe "
                                 "next to a live TPU job)")
    p_info.add_argument("name", nargs="?", default=None,
                        help="run name (omit to list all runs)")
    p_info.add_argument("--results-dir", default="results")

    p_exp = sub.add_parser("export",
                           help="AOT-export a serving artifact (StableHLO)")
    _add_common(p_exp, "mnist_vae")
    p_exp.add_argument("--what", choices=("sampler", "scorer"),
                       default="sampler")
    p_exp.add_argument("--out", default=None)
    p_exp.add_argument("--refine", type=int, default=0, metavar="STEPS",
                       help="bake STEPS MALA refinement steps on the "
                            "shaped prior into the sampler artifact")
    p_exp.add_argument("--prior", choices=("auto", "standard", "expost",
                                           "expost_gmm", "expost_flow"),
                       default="auto",
                       help="sampler artifact's latent draw; 'expost' "
                            "bakes an aggregate-posterior Gaussian fit "
                            "(computed at export time) in as constants; "
                            "'expost_gmm' a --gmm-k-component GMM fit; "
                            "'expost_flow' a RealNVP flow fit")
    p_exp.add_argument("--gmm-k", type=int, default=10, metavar="K",
                       help="components for --prior expost_gmm")
    p_exp.add_argument("--flow-steps", type=int, default=2000, metavar="N",
                       help="MLE fit steps for --prior expost_flow")
    p_exp.add_argument("--temperature", type=float, default=1.0,
                       metavar="T",
                       help="bake a base-draw temperature into trained-"
                            "prior samplers (model.prior=flow/gaussian: "
                            "u ~ N(0, T²I) before the inverse/base pass)")
    p_exp.add_argument("--quantize", choices=("int8",), default=None,
                       help="weight-only post-training quantization of the "
                            "baked params (sampler only; ~4x smaller)")

    args = parser.parse_args(argv)
    if args.command == "info":
        # Device-free by design (api.info reads the filesystem only) —
        # must stay safe to run next to a live TPU job on this relay.
        from apv_tpu.api import info
        print(json.dumps(info(args.name, results_dir=args.results_dir),
                         indent=2))
        return 0
    if args.command == "presets":
        # No backend init: listing configs must not touch the TPU (one
        # process at a time on this relay).
        from apv_tpu.utils.config import PRESETS
        for name, factory in PRESETS.items():
            doc = ((factory.__doc__ or "").strip().splitlines() or [""])[0]
            print(f"{name:24s} {doc}")
        return 0
    if getattr(args, "platform", None):
        import jax
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "distributed", False):
        # must precede any backend init (incl. the compile-cache probe)
        from apv_tpu.parallel.multihost import initialize_from_env
        if not initialize_from_env():
            raise SystemExit("--distributed set but APV_COORDINATOR unset")
    from apv_tpu.utils.compcache import enable_default_cache
    enable_default_cache()
    if getattr(args, "debug_nans", False):
        import jax
        jax.config.update("jax_debug_nans", True)
    import apv_tpu as api

    if args.command == "train":
        if getattr(args, "checkpoint_dir", None):
            # train resumes from its own results dir by name; silently
            # ignoring the flag would train/resume the wrong model.
            raise SystemExit(
                "--checkpoint-dir is eval-side only (evaluate/sample/ood/"
                "export); train resumes from <results_dir>/<name>/"
                "checkpoints — use --set name=... / --set results_dir=...")
        state = api.train(args.preset, overrides=args.overrides,
                          resume=args.resume, max_steps=args.max_steps,
                          trace_dir=args.trace_dir,
                          overwrite=args.overwrite)
        print(f"trained to step {int(state.step)}")
    elif args.command == "evaluate":
        result = api.evaluate(args.preset, overrides=args.overrides,
                              checkpoint_dir=args.checkpoint_dir,
                              dataset=args.dataset, k=args.k,
                              prior=args.prior, gmm_k=args.gmm_k,
                              flow_steps=args.flow_steps)
        print(json.dumps(result, indent=2))
    elif args.command == "sample":
        if args.visualize:
            if args.quality:
                raise SystemExit(
                    "--quality applies to prior sampling; it has no effect "
                    "with --visualize — run `apv sample --quality N` "
                    "separately")
            api.visualize(args.preset, overrides=args.overrides,
                          checkpoint_dir=args.checkpoint_dir,
                          what=args.visualize, n=args.n, steps=args.steps,
                          seed=args.seed, mode=args.mode, out_path=args.out,
                          refine=args.refine)
            print(f"wrote {args.visualize} grid")
        else:
            api.sample(args.preset, overrides=args.overrides,
                       checkpoint_dir=args.checkpoint_dir, n=args.n,
                       mode=args.mode, seed=args.seed, out_path=args.out,
                       quality_n=args.quality, refine=args.refine,
                       prior=args.prior, gmm_k=args.gmm_k,
                       flow_steps=args.flow_steps,
                       temperature=args.temperature)
            print("wrote sample grid")
    elif args.command == "ood":
        result = api.ood_score(args.preset, overrides=args.overrides,
                               checkpoint_dir=args.checkpoint_dir,
                               seed=args.seed, both=args.both)
        print(json.dumps(result, indent=2))
    elif args.command == "export":
        path = api.export_artifact(args.preset, overrides=args.overrides,
                                   checkpoint_dir=args.checkpoint_dir,
                                   what=args.what, out_path=args.out,
                                   quantize=args.quantize,
                                   refine=args.refine, prior=args.prior,
                                   gmm_k=args.gmm_k,
                                   flow_steps=args.flow_steps)
        print(f"exported {args.what} to {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
