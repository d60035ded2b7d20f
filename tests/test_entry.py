"""Driver-contract tests: __graft_entry__ compile + multi-chip dryrun."""

import importlib.util
import sys
from pathlib import Path

import jax


def _load_entry():
    path = Path(__file__).resolve().parent.parent / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("__graft_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__graft_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs():
    mod = _load_entry()
    fn, args = mod.entry()
    loss = jax.jit(fn)(*args)
    assert loss.shape == ()
    assert bool(jax.numpy.isfinite(loss))


def test_dryrun_multichip_8():
    mod = _load_entry()
    mod.dryrun_multichip(8)


def test_dryrun_multichip_2():
    mod = _load_entry()
    mod.dryrun_multichip(2)
