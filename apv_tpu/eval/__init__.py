"""Evaluation layer (SURVEY.md §1 L5, §2.5): IWAE-k NLL, bits/dim, OOD."""

from apv_tpu.eval.iwae_eval import make_iwae_fn, estimate_log_partition  # noqa: F401
from apv_tpu.eval.run import evaluate_nll  # noqa: F401
from apv_tpu.eval.ood import ood_scores, auroc  # noqa: F401
