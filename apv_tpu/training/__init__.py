"""Training layer (SURVEY.md §1 L4, §2.4).

``make_train_fns`` builds (init_fn, train_step) for a config; the step is a
single jitted function covering the ELBO objective (config 1) and the
adversarial-prior alternating G/D updates (configs 2-3) — both phases inside
one compiled step, gradients all-reduced over ICI by XLA via shardings.
"""

from apv_tpu.training.state import TrainState  # noqa: F401
from apv_tpu.training.step import make_train_fns  # noqa: F401
from apv_tpu.training.loop import train_loop  # noqa: F401
