"""Training state pytree (SURVEY.md §2.4).

One struct carries everything a checkpoint needs (SURVEY.md §5
"Checkpoint / resume"): VAE params + optimizer state, discriminator params +
optimizer state (absent → empty dict for a non-adversarial run, keeping the
pytree structure static), the base PRNG key, and the step counter.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax


@flax.struct.dataclass
class TrainState:
    step: jax.Array                    # int32 scalar
    params: Any                        # VAE (encoder+decoder) params
    opt_state: Any
    d_params: Any                      # discriminator params ({} if unused)
    d_opt_state: Any
    rng: jax.Array                     # base key; per-step keys fold in step
    ema_params: Any = ()               # Polyak average ({} when ema off)


def eval_params(state: TrainState, cfg) -> Any:
    """Parameters evaluation/sampling should use: the Polyak average when
    ``train.ema_decay`` is on (standard practice — the EMA point is the
    better generative model), else the raw trained params."""
    use_ema = (getattr(cfg.train, "ema_decay", 0.0) > 0.0
               and isinstance(state.ema_params, dict) and state.ema_params)
    return state.ema_params if use_ema else state.params
