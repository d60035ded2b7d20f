"""Default persistent XLA compilation cache.

Every fresh process pays full (remote) TPU recompiles on this platform —
minutes for the big train/eval graphs. The JAX persistent cache works
through the axon relay (measured 116s → 30s on a cold CLI run), so all
entry points enable it by default; ``JAX_COMPILATION_CACHE_DIR`` or an
explicit prior config wins if set.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path(os.environ.get("XDG_CACHE_HOME", "~/.cache")).expanduser() \
    / "apv_tpu" / "jax"


def enable_default_cache() -> None:
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return                      # user already chose a location
    import jax
    if jax.config.jax_compilation_cache_dir:
        return
    if jax.default_backend() != "tpu":
        # CPU AOT cache entries record exact host machine features; loading
        # one compiled under a different feature set warns about possible
        # SIGILL. CPU compiles are cheap anyway — cache only the TPU tier.
        return
    _DEFAULT.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(_DEFAULT))
    # cache everything, even fast compiles — process startup is the cost
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
