"""Training-dynamics smoke + alternation wiring tests (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import tiny_config
from apv_tpu.training.step import make_train_fns


def _synthetic_batch(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    h, w, c = cfg.model.image_shape
    if cfg.data.binarize:
        img = (rng.random((n, h, w, c)) < 0.3).astype(np.float32)
    else:
        img = rng.integers(0, 256, size=(n, h, w, c)).astype(np.uint8)
    return {"image": img}


def _run_steps(cfg, n_steps, batch):
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    step = jax.jit(fns.train_step)
    history = []
    for _ in range(n_steps):
        state, metrics = step(state, batch)
        history.append({k: float(v) for k, v in metrics.items()})
    return state, history


def test_elbo_improves_plain_vae():
    cfg = tiny_config("mnist_vae")
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    _, hist = _run_steps(cfg, 50, batch)
    first, last = hist[0]["elbo"], hist[-1]["elbo"]
    assert last > first + 10, f"ELBO did not improve: {first} -> {last}"
    assert np.isfinite(last)


def test_elbo_improves_cifar_resnet():
    cfg = tiny_config("cifar_advprior_resnet")
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    _, hist = _run_steps(cfg, 30, batch)
    assert hist[-1]["elbo"] > hist[0]["elbo"], (hist[0], hist[-1])
    assert all(np.isfinite(h["loss"]) for h in hist)
    # discriminator metrics present (adversarial preset)
    assert "d_loss" in hist[-1] and "d_acc" in hist[-1]


def test_adversarial_alternation_wiring():
    """D-only steps must move only d_params; G step must not move d_params."""
    cfg = tiny_config("mnist_advprior")
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    # two steps: the LR warmup starts at exactly 0, so step 0 moves only D
    step = jax.jit(fns.train_step)
    state2, _ = step(state, batch)
    state2, _ = step(state2, batch)

    def l2_delta(a, b):
        return float(sum(jnp.sum((x - y) ** 2)
                         for x, y in zip(jax.tree.leaves(a),
                                         jax.tree.leaves(b))))

    # both families moved in one combined step
    assert l2_delta(state.params, state2.params) > 0
    assert l2_delta(state.d_params, state2.d_params) > 0


def test_discriminator_learns_with_frozen_generator():
    """With G frozen and a separable posterior, D phases drive d_loss well
    below the chance plateau (2·softplus(0) ≈ 1.386) — alternation wiring.

    An *untrained* encoder's aggregate posterior is ≈ N(0,I) = the prior
    (nothing to separate), so we shift the frozen encoder's mean-head bias
    to +2 to make q(z) separable.
    """
    cfg = tiny_config("mnist_advprior",
                      **{"adversarial.n_critic": 1, "adversarial.d_lr": 1e-2})
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    bias = state.params["encoder"]["gaussian_head"]["bias"]
    z_dim = cfg.model.z_dim
    frozen_params = jax.tree.map(lambda x: x, state.params)
    frozen_params["encoder"]["gaussian_head"]["bias"] = bias.at[:z_dim].set(2.0)
    state = state.replace(params=frozen_params)
    batch = _synthetic_batch(cfg, cfg.train.batch_size)

    step = jax.jit(fns.train_step)
    d_losses, d_accs = [], []
    for _ in range(60):
        state, metrics = step(state, batch)
        # re-freeze the generator after every step
        state = state.replace(params=frozen_params)
        d_losses.append(float(metrics["d_loss"]))
        d_accs.append(float(metrics["d_acc"]))
    assert np.mean(d_losses[-5:]) < 1.0, d_losses[-5:]
    assert np.mean(d_accs[-5:]) > 0.8, d_accs[-5:]


def test_beta_warmup_schedule():
    cfg = tiny_config("mnist_vae", **{"train.beta_warmup_steps": 100})
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    step = jax.jit(fns.train_step)
    _, m0 = step(state, batch)
    assert float(m0["beta"]) == 0.0
    state50 = state.replace(step=jnp.asarray(50, jnp.int32))
    _, m50 = step(state50, batch)
    np.testing.assert_allclose(float(m50["beta"]), 0.5, atol=1e-6)


def test_aae_variant_runs():
    cfg = tiny_config("mnist_advprior", **{"adversarial.variant": "aae"})
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    _, hist = _run_steps(cfg, 5, batch)
    assert np.isfinite(hist[-1]["loss"])
    # AAE G-adv term is -softplus(D) <= 0
    assert hist[-1]["g_adv"] <= 0.0


def test_n_critic_multiple():
    cfg = tiny_config("mnist_advprior", **{"adversarial.n_critic": 3})
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    _, hist = _run_steps(cfg, 3, batch)
    assert np.isfinite(hist[-1]["d_loss"])


def test_d_lr_cosine_schedule_decays_updates():
    """adversarial.d_lr_schedule=cosine: the D optimizer's step size must
    follow the decaying schedule (Adam's update magnitude tracks the LR
    regardless of gradient scale), where the constant default keeps D
    updates the same size throughout."""
    import pytest

    def d_deltas(schedule, n=8):
        cfg = tiny_config("mnist_advprior",
                          **{"adversarial.d_lr_schedule": schedule,
                             "adversarial.d_lr_end": "1e-8",
                             "train.steps": str(n)})
        fns = make_train_fns(cfg)
        state = fns.init_fn(jax.random.PRNGKey(0))
        batch = _synthetic_batch(cfg, cfg.train.batch_size)
        step = jax.jit(fns.train_step)
        deltas = []
        for _ in range(n):
            new, _ = step(state, batch)
            deltas.append(float(sum(
                jnp.sum((a - b) ** 2) for a, b in
                zip(jax.tree.leaves(new.d_params),
                    jax.tree.leaves(state.d_params)))) ** 0.5)
            state = new
        return deltas

    const, cos = d_deltas("constant"), d_deltas("cosine")
    # Constant: late D updates stay the same order as early ones.
    assert const[-1] > 0.3 * const[0], const
    # Cosine to ~0 over the run: the last update is a small fraction of the
    # first (and of the constant run's last).
    assert cos[-1] < 0.05 * cos[0], cos
    assert cos[-1] < 0.05 * const[-1], (cos[-1], const[-1])
    with pytest.raises(ValueError, match="d_lr_schedule"):
        make_train_fns(tiny_config(
            "mnist_advprior", **{"adversarial.d_lr_schedule": "nope"}))


def test_d_lr_floor_adaptive_throttles_at_saturation():
    """d_lr_schedule=floor_adaptive: the analytic floor matches the
    measured saturation plateau, the throttle factor is reported, and D
    updates shrink as d_loss approaches the floor."""
    from apv_tpu.training import losses as L

    # 2·H(0.1) — the exact d_loss plateau the saturated CIFAR runs pin at.
    assert abs(L.d_loss_floor(0.1) - 0.6502) < 1e-3
    assert L.d_loss_floor(0.0) == 0.0

    # Frozen-G separable-posterior setup (same trick as the frozen-G test
    # above): the aggressive D drives d_loss toward the floor, where the
    # throttle must engage.
    cfg = tiny_config("mnist_advprior",
                      **{"adversarial.d_lr_schedule": "floor_adaptive",
                         "adversarial.label_smoothing": "0.1",
                         "adversarial.d_lr": "1e-2"})
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    bias = state.params["encoder"]["gaussian_head"]["bias"]
    frozen = jax.tree.map(lambda x: x, state.params)
    frozen["encoder"]["gaussian_head"]["bias"] = (
        bias.at[:cfg.model.z_dim].set(2.0))
    state = state.replace(params=frozen)
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    step = jax.jit(fns.train_step)
    factors, d_losses = [], []
    for _ in range(60):
        state, m = step(state, batch)
        state = state.replace(params=frozen)   # re-freeze G
        factors.append(float(m["d_lr_factor"]))
        d_losses.append(float(m["d_loss"]))
    # The factor is the clipped floor-distance ratio of the reported loss.
    floor, chance = L.d_loss_floor(0.1), 2 * np.log(2.0)
    want = np.clip((np.array(d_losses) - floor) / (chance - floor), 0, 1)
    assert np.allclose(factors, want, atol=1e-4)
    # D separates the shifted posterior; the throttle must have engaged
    # (late factors well below the chance-plateau value of ~1).
    assert min(factors) < 0.6, (factors[0], min(factors))
    assert factors[0] > 0.9, factors[0]


def test_floor_adaptive_biadversarial_per_d_factors():
    """floor_adaptive + biadversarial (round-4 advisor finding): each D's
    updates are throttled by its OWN loss — factors are reported per D
    and each equals the clipped floor-distance ratio of its own loss, so
    a saturated latent D cannot freeze the pixel D."""
    from apv_tpu.training import losses as L

    cfg = tiny_config("mnist_advprior",
                      **{"adversarial.d_lr_schedule": "floor_adaptive",
                         "adversarial.variant": "biadversarial",
                         "adversarial.pixel_d_widths": "[8,16]",
                         "adversarial.label_smoothing": "0.1",
                         "adversarial.d_lr": "1e-2"})
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    step = jax.jit(fns.train_step)
    floor, chance = L.d_loss_floor(0.1), 2 * np.log(2.0)
    for _ in range(25):
        state, m = step(state, batch)
        for lk, fk in (("d_loss", "d_lr_factor"),
                       ("px_d_loss", "px_d_lr_factor")):
            want = np.clip((float(m[lk]) - floor) / (chance - floor), 0, 1)
            np.testing.assert_allclose(float(m[fk]), want, atol=1e-4)
    # the two factors are genuinely independent signals
    assert abs(float(m["d_lr_factor"]) - float(m["px_d_lr_factor"])) >= 0.0
    """Throughput knobs (model.activation, model.norm) train finitely and
    actually change the function (different loss from the gelu/group
    default at identical seeds)."""
    batch = None
    losses = {}
    for tag, ov in (("default", {}),          # flagship default: silu + rms
                    ("group", {"model.norm": "group"}),
                    ("relu_nonorm", {"model.activation": "relu",
                                     "model.norm": "none"})):
        cfg = tiny_config("cifar_advprior_resnet", **ov)
        if batch is None:
            batch = _synthetic_batch(cfg, cfg.train.batch_size)
        _, hist = _run_steps(cfg, 3, batch)
        assert np.isfinite(hist[-1]["loss"]), tag
        losses[tag] = hist[-1]["loss"]
    assert len(set(losses.values())) == len(losses)


def test_multi_step_equals_single_steps():
    """One multi_step(k) dispatch must match k train_step dispatches on the
    same batches (train.steps_per_call). Tolerance: the scan body compiles
    as a different XLA program, so fusion order differs at ~1e-6 rel."""
    cfg = tiny_config("mnist_advprior")
    fns = make_train_fns(cfg)
    b0 = _synthetic_batch(cfg, cfg.train.batch_size, seed=0)
    b1 = _synthetic_batch(cfg, cfg.train.batch_size, seed=1)

    s_ref = fns.init_fn(jax.random.PRNGKey(0))
    step = jax.jit(fns.train_step)
    s_ref, m0 = step(s_ref, b0)
    s_ref, m1 = step(s_ref, b1)

    s_scan = fns.init_fn(jax.random.PRNGKey(0))
    stacked = {k: np.stack([b0[k], b1[k]]) for k in b0}
    s_scan, ms = jax.jit(fns.multi_step)(s_scan, stacked)

    assert int(s_scan.step) == int(s_ref.step) == 2
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        s_ref.params, s_scan.params)
    for key in m1:
        np.testing.assert_allclose(np.asarray(ms[key]),
                                   [float(m0[key]), float(m1[key])],
                                   rtol=1e-4)


def test_train_loop_steps_per_call(tmp_path):
    """train_loop with steps_per_call=2 matches k=1 exactly (same data
    order, same final params); invalid multiples raise."""
    import pytest
    from apv_tpu.training.loop import train_loop

    finals = {}
    for k in (1, 2):
        cfg = tiny_config("mnist_vae", tmp_dir=str(tmp_path / f"k{k}"), **{
            "train.steps": 4, "train.steps_per_call": k,
            "train.eval_every": 2, "train.checkpoint_every": 4,
            # valid split must tile the 8-device mesh: 512*0.125=64 rows
            "data.synthetic_size": 512, "train.valid_fraction": 0.125})
        finals[k] = train_loop(cfg)
    assert int(finals[1].step) == int(finals[2].step) == 4
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        finals[1].params, finals[2].params)

    bad = tiny_config("mnist_vae", tmp_dir=str(tmp_path / "bad"), **{
        "train.steps": 4, "train.steps_per_call": 3})
    with pytest.raises(ValueError, match="multiple"):
        train_loop(bad)


def test_loss_reduction_mean_per_dim():
    """mean_per_dim scales the scalar loss (and hence grad norms) by
    1/pixels while leaving the reported nats metrics unchanged; training
    stays finite. With 'sum', the CIFAR clip is always active
    (TrainConfig.loss_reduction)."""
    batch = None
    out = {}
    for red in ("sum", "mean_per_dim"):
        cfg = tiny_config("cifar_advprior_resnet",
                          **{"train.loss_reduction": red})
        if batch is None:
            batch = _synthetic_batch(cfg, cfg.train.batch_size)
        _, hist = _run_steps(cfg, 2, batch)
        assert np.isfinite(hist[-1]["loss"]), red
        out[red] = hist[0]           # step 0: identical params/batch/rng
    pixels = float(np.prod(tiny_config("cifar_advprior_resnet")
                           .model.image_shape))
    assert np.isclose(out["mean_per_dim"]["loss"] * pixels,
                      out["sum"]["loss"], rtol=1e-4)
    assert np.isclose(out["mean_per_dim"]["grad_norm"] * pixels,
                      out["sum"]["grad_norm"], rtol=1e-3)
    # nats-space reporting is reduction-invariant
    assert np.isclose(out["mean_per_dim"]["elbo"], out["sum"]["elbo"],
                      rtol=1e-5)


def test_n_critic_sweep_both_orderings():
    """Every (n_critic, d_reuse_posterior) combination must train cleanly;
    n_critic=0 skips the D phase (regression: NameError at trace in the
    D-first branch), and d_metrics are the mean over critic steps."""
    for n_critic in (0, 1, 3):
        for reuse in (True, False):
            cfg = tiny_config("mnist_advprior", **{
                "adversarial.n_critic": n_critic,
                "adversarial.d_reuse_posterior": reuse})
            batch = _synthetic_batch(cfg, cfg.train.batch_size)
            state, hist = _run_steps(cfg, 5, batch)
            assert np.isfinite(hist[-1]["loss"]), (n_critic, reuse)
            if n_critic == 0:
                assert "d_loss" not in hist[-1], (n_critic, reuse)
            else:
                assert np.isfinite(hist[-1]["d_loss"]), (n_critic, reuse)
                assert 0.0 <= hist[-1]["d_acc"] <= 1.0


def test_ema_params_recurrence_and_eval_selection():
    """EMA follows e' = d*e + (1-d)*p exactly; eval_params picks the EMA
    tree when on and the raw params when off."""
    from apv_tpu.training.state import eval_params

    cfg = tiny_config("mnist_vae", **{"train.ema_decay": 0.9})
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    # at init the EMA IS the params
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 state.ema_params, state.params)
    step = jax.jit(fns.train_step)
    prev_ema = state.ema_params
    state, _ = step(state, batch)
    expect = jax.tree.map(lambda e, p: 0.9 * e + 0.1 * p, prev_ema,
                          state.params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6),
        state.ema_params, expect)
    # EMA lags the raw params after an update
    assert eval_params(state, cfg) is state.ema_params

    cfg_off = tiny_config("mnist_vae")
    state_off = make_train_fns(cfg_off).init_fn(jax.random.PRNGKey(0))
    assert state_off.ema_params == {}
    assert eval_params(state_off, cfg_off) is state_off.params


def test_ema_checkpoint_roundtrip(tmp_path):
    from apv_tpu.utils import checkpoint as ckpt

    cfg = tiny_config("mnist_vae", **{"train.ema_decay": 0.5})
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    state, _ = _run_steps(cfg, 3, batch)
    ckpt.save_checkpoint(tmp_path / "ck", jax.device_get(state), 3)
    template = jax.eval_shape(make_train_fns(cfg).init_fn,
                              jax.random.PRNGKey(0))
    restored = ckpt.restore_checkpoint(tmp_path / "ck", template)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), restored.ema_params, state.ema_params)


def test_ema_checkpoint_cross_config_restore(tmp_path):
    """An EMA checkpoint must restore under an ema_decay=0 config (raw
    params eval) and a bare checkpoint under an EMA config (shadow seeded
    from params) — regression: orbax tree-mismatch crash."""
    from apv_tpu.utils import checkpoint as ckpt

    cfg_on = tiny_config("mnist_vae", **{"train.ema_decay": 0.5})
    cfg_off = tiny_config("mnist_vae")
    batch = _synthetic_batch(cfg_on, cfg_on.train.batch_size)

    state_on, _ = _run_steps(cfg_on, 2, batch)
    ckpt.save_checkpoint(tmp_path / "on", jax.device_get(state_on), 2)
    t_off = jax.eval_shape(make_train_fns(cfg_off).init_fn,
                           jax.random.PRNGKey(0))
    got = ckpt.restore_checkpoint(tmp_path / "on", t_off)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), got.params, state_on.params)

    state_off, _ = _run_steps(cfg_off, 2, batch)
    ckpt.save_checkpoint(tmp_path / "off", jax.device_get(state_off), 2)
    t_on = jax.eval_shape(make_train_fns(cfg_on).init_fn,
                          jax.random.PRNGKey(0))
    got = ckpt.restore_checkpoint(tmp_path / "off", t_on)
    # EMA shadow warm-started from the restored params
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), got.ema_params, state_off.params)


def test_grad_accum_applies_every_k_steps():
    """With grad_accum=2, params are frozen on odd micro-steps and move on
    even ones; training still improves over 50 micro-steps."""
    cfg = tiny_config("mnist_vae", **{"train.grad_accum": 2})
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    fns = make_train_fns(cfg)
    state0 = fns.init_fn(jax.random.PRNGKey(0))
    step = jax.jit(fns.train_step)

    # warmup LR starts at 0, so the first real update is a no-op: watch the
    # SECOND update window (micro-steps 3-4). Micro-step 3 must buffer
    # (params frozen), micro-step 4 must apply (params move).
    states = [state0]
    for _ in range(4):
        s, _ = step(states[-1], batch)
        states.append(s)
    same = jax.tree.map(lambda a, b: np.array_equal(np.asarray(a),
                                                    np.asarray(b)),
                        states[3].params, states[2].params)
    assert all(jax.tree.leaves(same)), "params moved on a buffering step"
    moved = jax.tree.map(lambda a, b: not np.array_equal(np.asarray(a),
                                                         np.asarray(b)),
                         states[4].params, states[3].params)
    assert any(jax.tree.leaves(moved)), "params did not move on k-th step"

    _, hist = _run_steps(cfg, 50, batch)
    assert hist[-1]["elbo"] > hist[0]["elbo"] + 10


def test_grad_accum_adversarial_runs():
    cfg = tiny_config("mnist_advprior", **{"train.grad_accum": 2})
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    _, hist = _run_steps(cfg, 6, batch)
    assert np.isfinite(hist[-1]["loss"]) and np.isfinite(hist[-1]["d_loss"])


def test_packed_step_matches_unpacked():
    """data.bit_pack transport equivalence: one train step on a bit-packed
    batch must match the same step on the float batch (the unpack
    reproduces exactly {0,1} on device — lossless payload compression)."""
    cfg = tiny_config("mnist_vae")
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)
    imgs = (rng.random((cfg.train.batch_size, 28, 28, 1)) < 0.4).astype(
        np.uint8)
    from apv_tpu.data.preprocess import pack_bits
    s1, m1 = jax.jit(fns.train_step)(state, {"image":
                                             imgs.astype(np.float32)})
    s2, m2 = jax.jit(fns.train_step)(state, {"image_packed":
                                             pack_bits(imgs)})
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-6,
                                   atol=1e-7, err_msg=k)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)


def test_pre_ema_checkpoint_restores(tmp_path):
    """Round-1 checkpoints (saved before TrainState.ema_params existed)
    lack the key entirely on disk; restore must decide the branch from the
    CHECKPOINT's metadata, not the template (round-2 advisor, medium)."""
    import dataclasses

    from apv_tpu.utils import checkpoint as ckpt

    cfg = tiny_config("mnist_vae")
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    state, _ = _run_steps(cfg, 2, batch)
    old_style = {f.name: getattr(state, f.name)
                 for f in dataclasses.fields(state)
                 if f.name != "ema_params"}
    ckpt.save_checkpoint(tmp_path / "old", jax.device_get(old_style), 2)

    # ema-off config: restores with an empty shadow
    t_off = jax.eval_shape(make_train_fns(cfg).init_fn, jax.random.PRNGKey(0))
    got = ckpt.restore_checkpoint(tmp_path / "old", t_off)
    assert got.ema_params == {}
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), got.params, state.params)

    # ema-on config: shadow warm-started from the restored params
    cfg_on = tiny_config("mnist_vae", **{"train.ema_decay": 0.5})
    t_on = jax.eval_shape(make_train_fns(cfg_on).init_fn,
                          jax.random.PRNGKey(0))
    got_on = ckpt.restore_checkpoint(tmp_path / "old", t_on)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), got_on.ema_params, state.params)


def test_restore_without_metadata_falls_back_to_trials(tmp_path, monkeypatch):
    """When orbax item_metadata is unusable (metadata API drift —
    _saved_keys_and_ema returns (None, False)), restore must still adapt
    EMA-format mismatches via trial restores instead of crashing on the
    exact-template mismatch."""
    import dataclasses

    from apv_tpu.utils import checkpoint as ckpt

    cfg_off = tiny_config("mnist_vae")
    cfg_on = tiny_config("mnist_vae", **{"train.ema_decay": 0.5})
    batch = _synthetic_batch(cfg_off, cfg_off.train.batch_size)
    state_off, _ = _run_steps(cfg_off, 2, batch)
    ckpt.save_checkpoint(tmp_path / "off", jax.device_get(state_off), 2)

    monkeypatch.setattr(ckpt, "_saved_keys_and_ema",
                        lambda mngr, step: (None, False))

    # bare (ema-off) checkpoint under an EMA config: exact template fails,
    # the ema-mismatch trial restores bare and warm-starts the shadow
    t_on = jax.eval_shape(make_train_fns(cfg_on).init_fn,
                          jax.random.PRNGKey(0))
    got = ckpt.restore_checkpoint(tmp_path / "off", t_on)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), got.ema_params, state_off.params)

    # pre-EMA (round-1 dict) checkpoint: both TrainState trials fail, the
    # pre-EMA dict trial lands
    old_style = {f.name: getattr(state_off, f.name)
                 for f in dataclasses.fields(state_off)
                 if f.name != "ema_params"}
    ckpt.save_checkpoint(tmp_path / "old", jax.device_get(old_style), 2)
    t_off = jax.eval_shape(make_train_fns(cfg_off).init_fn,
                           jax.random.PRNGKey(0))
    got2 = ckpt.restore_checkpoint(tmp_path / "old", t_off)
    assert got2.ema_params == {}
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), got2.params, state_off.params)


def test_fresh_run_clears_stale_checkpoints(tmp_path):
    """A non-resume train_loop into a reused results dir must not keep old
    checkpoints: orbax skips save() for steps already on disk, so a retrain
    would otherwise write metrics for NEW weights while eval/ood silently
    restore the OLD ones (observed on the round-3 fashion retrain). But
    clearing is destructive (a forgotten --resume on a smoke rerun would
    delete hours of training), so it demands an explicit overwrite=True."""
    import pytest

    from apv_tpu.training.loop import train_loop
    from apv_tpu.utils import checkpoint as ckpt

    common = {"train.steps": 2, "train.checkpoint_every": 2,
              "train.eval_every": 0,
              "data.synthetic_size": 512, "train.valid_fraction": 0.125}
    cfg_a = tiny_config("mnist_vae", tmp_dir=str(tmp_path), **common)
    final_a = train_loop(cfg_a)
    ckpt_dir = tmp_path / cfg_a.name / "checkpoints"
    assert ckpt.latest_step(ckpt_dir) == 2

    cfg_b = tiny_config("mnist_vae", tmp_dir=str(tmp_path),
                        **{**common, "train.seed": 1})
    # without overwrite: refuse, and the old checkpoint survives
    with pytest.raises(FileExistsError, match="--resume"):
        train_loop(cfg_b)
    assert ckpt.latest_step(ckpt_dir) == 2
    final_b = train_loop(cfg_b, overwrite=True)
    # different seed -> genuinely different weights
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        final_a.params, final_b.params))
    assert max(diffs) > 0
    restored = ckpt.restore_checkpoint(
        ckpt_dir, jax.eval_shape(make_train_fns(cfg_b).init_fn,
                                 jax.random.PRNGKey(1)))
    # the checkpoint on disk is run B's, not run A's stale one
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), restored.params, final_b.params)


def test_device_resident_matches_streaming(tmp_path):
    """data.device_resident parity: the HBM-resident dataset + on-device
    index gather must reproduce the streaming loop exactly — same
    permutation schedule, same rows, same final params — including under
    steps_per_call>1 (stacked [k, B] index batches) and across a
    checkpoint/resume boundary."""
    from apv_tpu.training.loop import train_loop

    common = {"train.steps": 4, "train.eval_every": 2,
              "train.checkpoint_every": 2,
              "data.synthetic_size": 512, "train.valid_fraction": 0.125}
    finals = {}
    for mode in ("stream", "resident", "resident_k2"):
        cfg = tiny_config("mnist_vae", tmp_dir=str(tmp_path / mode), **{
            **common,
            "data.device_resident": mode != "stream",
            "train.steps_per_call": 2 if mode == "resident_k2" else 1})
        finals[mode] = train_loop(cfg)
    for mode in ("resident", "resident_k2"):
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
            finals["stream"].params, finals[mode].params)

    # resume under resident mode: 2 steps, restart, 2 more -> same params
    cfg_r = tiny_config("mnist_vae", tmp_dir=str(tmp_path / "resume"), **{
        **common, "data.device_resident": True})
    train_loop(cfg_r, max_steps=2)
    resumed = train_loop(cfg_r, resume=True)
    assert int(resumed.step) == 4
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        finals["resident"].params, resumed.params)


def test_disc_logistic_mix_trains_evals_samples():
    """model.likelihood=disc_logistic_mix end-to-end: the K-component
    mixture head trains (ELBO improves), the IWAE estimator scores it
    finitely, and both pixel modes of the sampler stay in [0,1]."""
    cfg = tiny_config("cifar_advprior_resnet",
                      **{"model.likelihood": "disc_logistic_mix",
                         "model.mix_components": 3})
    batch = _synthetic_batch(cfg, cfg.train.batch_size)
    state, hist = _run_steps(cfg, 30, batch)
    assert hist[-1]["elbo"] > hist[0]["elbo"], (hist[0], hist[-1])
    assert all(np.isfinite(h["loss"]) for h in hist)

    from apv_tpu.eval.iwae_eval import make_iwae_fn
    from apv_tpu.models import build_model
    model = build_model(cfg.model)
    f = make_iwae_fn(model, cfg.model.likelihood, k=8, chunk=4)
    x = batch["image"][:8].astype(np.float32) / 255.0
    x_in = x * 2.0 - 1.0
    ll = np.asarray(f(state.params, None, jnp.asarray(x_in), jnp.asarray(x),
                      jax.random.PRNGKey(0)))
    assert ll.shape == (8,) and np.all(np.isfinite(ll))

    from apv_tpu.sampling.run import generate_samples
    for mode in ("mean", "sample"):
        imgs = np.asarray(generate_samples(
            model, state.params, jax.random.PRNGKey(1), 4, cfg.model.z_dim,
            cfg.model.likelihood, cfg.model.image_shape[-1], mode=mode))
        assert imgs.shape == (4,) + tuple(cfg.model.image_shape)
        assert imgs.min() >= 0.0 and imgs.max() <= 1.0


def test_free_bits_kl_value_and_gradient_floor():
    """free_bits_kl == Σ_j max(λ, E_B[KL_j]); a floor above every per-dim
    KL kills the KL gradient entirely; λ=0 recovers the true batch-mean KL."""
    from apv_tpu import ops
    from apv_tpu.training import losses as L
    rng = np.random.default_rng(3)
    mean = jnp.asarray(rng.normal(0, 0.5, (16, 6)), jnp.float32)
    logvar = jnp.asarray(rng.normal(0, 0.3, (16, 6)), jnp.float32)
    kd = 0.5 * (np.square(np.asarray(mean)) + np.exp(np.asarray(logvar))
                - 1.0 - np.asarray(logvar)).mean(axis=0)
    fb = float(np.median(kd))  # floor binds on ~half the dims
    manual = np.maximum(kd, fb).sum()
    np.testing.assert_allclose(
        float(L.free_bits_kl(mean, logvar, fb)), manual, rtol=1e-6)
    # λ=0: every per-dim KL ≥ 0 so the floor never binds → true mean KL
    np.testing.assert_allclose(
        float(L.free_bits_kl(mean, logvar, 0.0)),
        float(jnp.mean(ops.kl_standard(mean, logvar))), rtol=1e-6)
    # floor above max per-dim KL → constant objective, zero gradient
    big = float(kd.max()) * 2 + 1.0
    g_mean, g_logvar = jax.grad(
        lambda m, lv: L.free_bits_kl(m, lv, big), argnums=(0, 1))(mean, logvar)
    assert float(jnp.abs(g_mean).max()) == 0.0
    assert float(jnp.abs(g_logvar).max()) == 0.0


def test_free_bits_training_removes_kl_pull():
    """With the floor above the operating KL, the KL pull vanishes: the
    posterior drifts to (weakly) HIGHER KL than the unfloored run, while
    training stays finite and reported metrics remain the true KL."""
    base = tiny_config("cifar_advprior_resnet",
                       **{"train.beta_warmup_steps": 0})
    batch = _synthetic_batch(base, base.train.batch_size)
    _, hist0 = _run_steps(base, 40, batch)
    fb_cfg = tiny_config("cifar_advprior_resnet",
                         **{"train.beta_warmup_steps": 0,
                            "train.free_bits": 100.0})
    _, hist1 = _run_steps(fb_cfg, 40, batch)
    assert all(np.isfinite(h["loss"]) for h in hist1)
    # same seed/batch: identical first-step metrics (fb changes grads only)
    np.testing.assert_allclose(hist0[0]["kl"], hist1[0]["kl"], rtol=1e-5)
    assert hist1[-1]["kl"] >= hist0[-1]["kl"] - 1e-3, (
        hist0[-1]["kl"], hist1[-1]["kl"])


def test_free_bits_gaussian_base_floor():
    """free_bits_kl_gaussian_base == Σ_j max(λ, E_B[KL_j(q‖N(μ_p,σ_p²))]);
    a binding floor kills the gradient into BOTH the encoder stats and the
    base params (the base must not chase a collapse the floor prevents)."""
    from apv_tpu.training import losses as L

    rng = np.random.default_rng(5)
    mean = jnp.asarray(rng.normal(0, 0.5, (16, 6)), jnp.float32)
    logvar = jnp.asarray(rng.normal(0, 0.3, (16, 6)), jnp.float32)
    mu_p = jnp.asarray(rng.normal(0, 1.0, (6,)), jnp.float32)
    logvar_p = jnp.asarray(rng.normal(0, 0.4, (6,)), jnp.float32)
    m, lv = np.asarray(mean, np.float64), np.asarray(logvar, np.float64)
    mp, lvp = np.asarray(mu_p, np.float64), np.asarray(logvar_p, np.float64)
    kd = (0.5 * (lvp - lv + (np.exp(lv) + (m - mp) ** 2) / np.exp(lvp)
                 - 1.0)).mean(axis=0)
    fb = float(np.median(kd))
    np.testing.assert_allclose(
        float(L.free_bits_kl_gaussian_base(mean, logvar, mu_p, logvar_p,
                                           fb)),
        np.maximum(kd, fb).sum(), rtol=1e-5)
    big = float(kd.max()) * 2 + 1.0
    grads = jax.grad(
        lambda *a: L.free_bits_kl_gaussian_base(*a, big),
        argnums=(0, 1, 2, 3))(mean, logvar, mu_p, logvar_p)
    for g in grads:
        assert float(jnp.abs(g).max()) == 0.0


def test_free_information_floor_flow():
    """free_information_kl == max(E_B[KL], z_dim·λ): exact value, zero
    gradient when the floor binds, true mean KL when it doesn't."""
    from apv_tpu.training import losses as L

    kl = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)       # per-example MC KL
    np.testing.assert_allclose(
        float(L.free_information_kl(kl, 4, 0.1)), 2.0)   # floor 0.4 < mean
    np.testing.assert_allclose(
        float(L.free_information_kl(kl, 4, 10.0)), 40.0)  # floor binds
    g = jax.grad(lambda k: L.free_information_kl(k, 4, 10.0))(kl)
    assert float(jnp.abs(g).max()) == 0.0
    g2 = jax.grad(lambda k: L.free_information_kl(k, 4, 0.1))(kl)
    np.testing.assert_allclose(np.asarray(g2), np.full(3, 1 / 3), rtol=1e-6)


def test_free_bits_composes_with_trainable_priors():
    """round-5: the round-4 blanket ban is lifted — flow and gaussian
    priors train WITH free_bits and stay finite. Sharp invariant: the
    trainable prior's ONLY gradient source is the KL term, so a binding
    floor freezes its params exactly at init (the prior cannot chase a
    collapse the floor prevents), while the unfloored run moves them."""
    for prior, key, extra in (
            ("flow", "flow_prior", {"adversarial.enabled": False,
                                    "model.prior_flow_layers": 2,
                                    "model.prior_flow_hidden": 8}),
            ("gaussian", "gaussian_prior", {})):
        base = tiny_config("mnist_advprior", **{"model.prior": prior,
                                                **extra})
        batch = _synthetic_batch(base, base.train.batch_size)
        s0, hist0 = _run_steps(base, 30, batch)
        fb = tiny_config("mnist_advprior", **{"model.prior": prior,
                                              "train.free_bits": 50.0,
                                              **extra})
        s1, hist1 = _run_steps(fb, 30, batch)
        assert all(np.isfinite(h["loss"]) for h in hist1), prior
        # fb is gradient-only: identical first-step reported (true) KL
        np.testing.assert_allclose(hist0[0]["kl"], hist1[0]["kl"],
                                   rtol=1e-5)
        init = make_train_fns(fb).init_fn(jax.random.PRNGKey(0))
        moved = [float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree.leaves(s0.params[key]),
            jax.tree.leaves(init.params[key]))]
        frozen = [float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree.leaves(s1.params[key]),
            jax.tree.leaves(init.params[key]))]
        assert max(moved) > 1e-6, (prior, moved)
        assert max(frozen) == 0.0, (prior, frozen)


def test_flow_dispersion_penalty_shrinks_sampler_bulk():
    """train.flow_dispersion_penalty (round-5 flow-generation fix): the
    penalized run's flow samples at fixed base draws disperse LESS than
    the unpenalized run's (direction check of the regularizer), metrics
    expose the m_s/m_q ratio, and misconfigurations are rejected loudly."""
    import pytest

    extra = {"adversarial.enabled": False, "model.prior": "flow",
             "model.prior_flow_layers": 2, "model.prior_flow_hidden": 8}
    base = tiny_config("mnist_advprior", **extra)
    batch = _synthetic_batch(base, base.train.batch_size)
    s0, h0 = _run_steps(base, 40, batch)
    pen = tiny_config("mnist_advprior",
                      **{"train.flow_dispersion_penalty": 1e4, **extra})
    s1, h1 = _run_steps(pen, 40, batch)
    assert "flow_dispersion" in h1[-1] and "flow_dispersion" not in h0[-1]
    assert all(np.isfinite(h["loss"]) for h in h1)
    fns = make_train_fns(base)
    u = jax.random.normal(jax.random.PRNGKey(11), (256, base.model.z_dim))
    disp = []
    for s in (s0, s1):
        z = fns.model.apply({"params": s.params}, u,
                            method="prior_sample_from")
        disp.append(float(jnp.mean(jnp.sum(jnp.square(z), axis=-1))))
    assert disp[1] <= disp[0] + 1e-6, disp
    with pytest.raises(ValueError, match="flow_dispersion_penalty"):
        make_train_fns(tiny_config(
            "mnist_advprior", **{"train.flow_dispersion_penalty": 1.0}))
    with pytest.raises(ValueError, match="flow_dispersion_penalty"):
        make_train_fns(tiny_config(
            "mnist_advprior", **{"train.flow_dispersion_penalty": 1.0,
                                 "train.objective": "iwae",
                                 "train.iwae_k": 2, **extra}))


def test_r1_penalty_closed_form():
    """r1_penalty matches the hand-computed value for a linear 'D':
    D(x) = w·x has ∇_x D = w everywhere, so R1 = ½‖w‖² exactly, for both
    flat [B,D] and image-shaped [B,H,W,C] inputs."""
    from apv_tpu.training.losses import r1_penalty

    w = jnp.asarray([1.0, -2.0, 3.0])
    d_flat = lambda x: x @ w                              # noqa: E731
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)),
                    jnp.float32)
    np.testing.assert_allclose(float(r1_penalty(d_flat, x)),
                               0.5 * float(jnp.sum(w ** 2)), rtol=1e-6)

    wimg = jnp.ones((2, 2, 1)) * 0.5
    d_img = lambda x: jnp.sum(x * wimg, axis=(1, 2, 3))   # noqa: E731
    ximg = jnp.zeros((4, 2, 2, 1), jnp.float32)
    np.testing.assert_allclose(float(r1_penalty(d_img, ximg)),
                               0.5 * float(jnp.sum(wimg ** 2)), rtol=1e-6)


def test_r1_gamma_softens_discriminator():
    """adversarial.r1_gamma > 0 must (a) report finite d_r1 that FALLS as
    D flattens, and (b) end with a less extreme D than the unregularized
    run (smaller real-side input gradients)."""
    from apv_tpu.training.step import make_train_fns

    batch = None
    finals = {}
    for gamma in (0.0, 10.0):
        cfg = tiny_config("mnist_advprior",
                          **{"adversarial.r1_gamma": gamma})
        if batch is None:
            rng = np.random.default_rng(0)
            h, w, c = cfg.model.image_shape
            batch = {"image": (rng.random((cfg.train.batch_size, h, w, c))
                               < 0.3).astype(np.float32)}
        fns = make_train_fns(cfg)
        state = fns.init_fn(jax.random.PRNGKey(0))
        step = jax.jit(fns.train_step)
        hist = []
        for _ in range(40):
            state, m = step(state, batch)
            hist.append({k: float(v) for k, v in m.items()})
        finals[gamma] = (state, hist)

    hist_r1 = finals[10.0][1]
    assert "d_r1" in hist_r1[-1] and np.isfinite(hist_r1[-1]["d_r1"])
    assert "d_r1" not in finals[0.0][1][-1]
    # the penalty must actually shrink D's real-side gradients
    assert hist_r1[-1]["d_r1"] < hist_r1[2]["d_r1"]

    # measure ½E‖∇D‖² of both final discriminators on the same samples
    from apv_tpu.models import LatentDiscriminator, d_apply_fn
    from apv_tpu.training.losses import r1_penalty
    cfg0 = tiny_config("mnist_advprior")
    disc = LatentDiscriminator(tuple(cfg0.adversarial.d_widths))
    z = jnp.asarray(np.random.default_rng(1).normal(
        size=(64, cfg0.model.z_dim)), jnp.float32)
    r1s = {g: float(r1_penalty(lambda zz: d_apply_fn(disc)(
        finals[g][0].d_params, zz), z)) for g in (0.0, 10.0)}
    assert r1s[10.0] < r1s[0.0], r1s


def test_r1_gamma_biadversarial_trains():
    """R1 under biadversarial regularizes BOTH discriminators (px_d_r1
    reported finite alongside d_r1) and the step stays finite."""
    from apv_tpu.training.step import make_train_fns

    cfg = tiny_config("mnist_advprior", **{
        "adversarial.variant": "biadversarial",
        "adversarial.pixel_d_widths": "[8,16]",
        "adversarial.r1_gamma": 1.0})
    rng = np.random.default_rng(0)
    h, w, c = cfg.model.image_shape
    batch = {"image": (rng.random((cfg.train.batch_size, h, w, c))
                       < 0.3).astype(np.float32)}
    fns = make_train_fns(cfg)
    state = fns.init_fn(jax.random.PRNGKey(0))
    step = jax.jit(fns.train_step)
    for _ in range(5):
        state, m = step(state, batch)
    for key in ("d_r1", "px_d_r1", "d_loss", "px_d_loss", "loss"):
        assert key in m and np.isfinite(float(m[key])), key
