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
