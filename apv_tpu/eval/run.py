"""``evaluate`` entry: test-set NLL via IWAE-k + bits/dim (SURVEY.md §2.5).

Deterministic input convention at eval: no dequantization noise — encoder
sees centered bin centers, the likelihood scores the discrete levels.
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from apv_tpu.core.metrics import active_units, nats_to_bits_per_dim
from apv_tpu.data import (Batcher, load_dataset, prefetch_to_device,
                          static_binarize)
from apv_tpu.data.preprocess import normalize_center, to_unit_interval
from apv_tpu.eval.iwae_eval import estimate_log_partition, make_iwae_fn
from apv_tpu.models import build_model, make_latent_d
from apv_tpu.parallel import data_sharding, make_mesh, replicated
from apv_tpu.utils.config import Config


def eval_arrays(cfg: Config, dataset: str | None = None,
                max_examples: int | None = None) -> dict[str, np.ndarray]:
    """Test-split arrays with train-matched preprocessing, truncated to a
    multiple of the eval batch size."""
    name = dataset or cfg.data.dataset
    images, _ = load_dataset(name, "test", data_dir=cfg.data.data_dir,
                             synthetic_size=cfg.data.synthetic_size)
    if cfg.data.binarize:
        # Same static binarization rule as training, offset seed: the test
        # set is binarized once with its own fixed key.
        images = static_binarize(images, seed=cfg.train.seed + 1)
    if max_examples is not None:
        images = images[:max_examples]
    return {"image": images}


def _prep_eval_batch(cfg: Config, image):
    """Host-side (numpy) eval preprocessing — (x_in, x_target).

    Stays numpy so the batch loop can prefetch host→HBM: binarized configs
    feed x straight through; continuous configs center the encoder input
    to [-1,1] while the likelihood scores the raw [0,1] bin centers."""
    if cfg.data.binarize:
        x = np.asarray(image, np.float32)
        return x, x
    levels = (to_unit_interval(image) if image.dtype == np.uint8
              else np.asarray(image, np.float32))
    return normalize_center(levels), levels


def _host_shard() -> tuple[int, int] | None:
    """Batcher host_shard spec under jax.distributed; None single-process
    (shared contract: parallel/multihost.host_shard, same as the train loop)."""
    from apv_tpu.parallel.multihost import host_shard
    return host_shard()


def _eval_batch_size(requested: int, n_rows: int, mesh) -> int:
    """Effective eval batch: capped by the split size and rounded down to
    a multiple of lcm(process count, mesh data-axis size) — the batch axis
    is device_put-sharded over the mesh's data axis, so both divisibility
    constraints apply (the shared rounding rule lives in
    parallel/multihost.round_global_batch — the train loop's valid batches
    use the same call)."""
    from apv_tpu.parallel.mesh import DATA_AXIS
    from apv_tpu.parallel.multihost import round_global_batch
    hs = _host_shard()
    bs = round_global_batch(min(requested, n_rows),
                            pcount=None if hs is None else hs[1],
                            n_shards=mesh.shape[DATA_AXIS])
    if bs > n_rows:
        # The rounding floor exceeded the split: a drop-remainder Batcher
        # would yield ZERO batches and the score loop would die in an
        # opaque np.stack([]) — fail here with the cause instead (the
        # train loop's valid split has the same guard, loop.py).
        raise ValueError(
            f"eval split has only {n_rows} rows but the smallest batch "
            f"that tiles {mesh.shape[DATA_AXIS]} mesh devices x "
            f"{jax.process_count()} processes is {bs}; raise max_examples "
            "or evaluate on a smaller mesh")
    return bs


def _local_rows(arr: jax.Array) -> np.ndarray:
    """This process's rows of a first-axis-sharded global array, in global
    row order (single process: all rows — identical to np.asarray).

    Dedupes replica shards: on the 2-D (data, k) eval mesh the score vector
    is sharded over ``data`` but REPLICATED over ``k``, so every data row
    appears once per k-device in ``addressable_shards``."""
    seen: dict[int, jax.Array] = {}
    for s in arr.addressable_shards:
        seen.setdefault(s.index[0].start or 0, s.data)
    return np.concatenate(
        [np.asarray(seen[start]) for start in sorted(seen)])


def _assemble_global(per_batch_local: list[np.ndarray],
                     pcount: int) -> np.ndarray:
    """Per-batch local score rows -> the full test-set score vector.

    Each process contributes its contiguous row block of every batch
    (Batcher host_shard); ``process_allgather`` stacks process-major, so
    the [P, n_batches, per] gather transposes back to batch-major global
    order before flattening."""
    local = np.stack(per_batch_local)                 # [n_batches, per]
    if pcount == 1:
        return local.reshape(-1)
    from jax.experimental import multihost_utils
    gathered = np.asarray(multihost_utils.process_allgather(local))
    return gathered.transpose(1, 0, 2).reshape(-1)


def posterior_activity(cfg: Config, params, *, mesh=None,
                       dataset: str | None = None,
                       max_examples: int | None = None,
                       threshold: float = 1e-2,
                       batch_size: int | None = None) -> dict:
    """Active latent units over the test set (IWAE paper §5.1 diagnostic:
    A_u = Cov_x(E_q[z_u]) > threshold) — a posterior-collapse report to go
    with the config-4 NLL numbers. One jitted encoder pass, streamed
    through the same host→HBM prefetch queue as the NLL loop."""
    mesh = mesh if mesh is not None else make_mesh()
    model = build_model(cfg.model)
    encode = jax.jit(
        lambda p, x: model.apply({"params": p}, x, method="encode"))

    arrays = eval_arrays(cfg, dataset, max_examples or cfg.eval.max_examples)
    batch_size = batch_size if batch_size is not None else cfg.eval.batch_size
    batcher = Batcher(arrays,
                      _eval_batch_size(batch_size, len(arrays["image"]), mesh),
                      shuffle=False, host_shard=_host_shard())
    params = jax.device_put(params, replicated(mesh))
    pcount = jax.process_count()

    def prepped():
        for batch in batcher.epoch():
            yield {"x_in": _prep_eval_batch(cfg, batch["image"])[0]}

    def mean_batches():
        with mesh:
            for b in prefetch_to_device(prepped(), data_sharding(mesh)):
                mean, _ = encode(params, b["x_in"])
                # Cov_x is over the FULL test set: under jax.distributed
                # every process needs every row's posterior mean.
                if pcount == 1:
                    yield np.asarray(mean)
                else:
                    from jax.experimental import multihost_utils
                    yield np.asarray(multihost_utils.process_allgather(
                        _local_rows(mean))).reshape(-1, mean.shape[-1])

    count, var = active_units(mean_batches(), threshold=threshold)
    return {
        "active_units": count,
        "z_dim": int(cfg.model.z_dim),
        "threshold": threshold,
        "max_unit_variance": float(var.max()),
        "median_unit_variance": float(np.median(var)),
    }


@functools.lru_cache(maxsize=8)
def _jitted_d_apply(disc):
    from apv_tpu.models import d_apply_fn
    return jax.jit(d_apply_fn(disc))


def pixel_d_scores(cfg: Config, px_params, *, mesh=None,
                   dataset: str | None = None,
                   max_examples: int | None = None,
                   batch_size: int | None = None) -> np.ndarray:
    """Per-sample pixel-discriminator logits D_x(x) over a test split —
    the ``ood.score='pixel_d'`` scorer (biadversarial checkpoints only).

    D_x was trained to separate real in-distribution images (class 1)
    from decoded means (class 0), so its logit is a single-forward
    "looks like the training data" score: no IWAE scan, no decoder — one
    conv-stack forward per image. Inputs are scored in the same target
    space the training D saw (binary pixels / [0,1] levels)."""
    from apv_tpu.models import PixelDiscriminator

    mesh = mesh if mesh is not None else make_mesh()
    pxd = PixelDiscriminator(tuple(cfg.adversarial.pixel_d_widths))
    # lru-cached jitted apply: one compile per architecture+shape, not one
    # per pixel_d_scores call (ood invokes this twice per suite, four times
    # with --both; compile time is the relay's documented bottleneck).
    apply_fn = _jitted_d_apply(pxd)

    arrays = eval_arrays(cfg, dataset, max_examples or cfg.ood.max_examples)
    batch_size = batch_size if batch_size is not None else cfg.ood.batch_size
    batcher = Batcher(arrays,
                      _eval_batch_size(batch_size, len(arrays["image"]),
                                       mesh),
                      shuffle=False, host_shard=_host_shard())
    px_params = jax.device_put(px_params, replicated(mesh))
    pcount = jax.process_count()

    def prepped():
        for batch in batcher.epoch():
            # score the TARGET space (what the training D saw as 'real')
            yield {"x": _prep_eval_batch(cfg, batch["image"])[1]}

    scores = []
    with mesh:
        for b in prefetch_to_device(prepped(), data_sharding(mesh)):
            logits = apply_fn(px_params, b["x"])
            scores.append(np.asarray(logits) if pcount == 1
                          else _local_rows(logits))
    return _assemble_global(scores, pcount)


def evaluate_nll(cfg: Config, params, d_params=None, *, mesh=None,
                 dataset: str | None = None, k: int | None = None,
                 chunk: int | None = None, max_examples: int | None = None,
                 use_adversarial_prior: bool | None = None,
                 per_sample: bool = False, seed: int = 0,
                 batch_size: int | None = None, prior_moments=None):
    """Mean test NLL (nats) + bits/dim; optionally per-sample scores (OOD).

    ``use_adversarial_prior`` defaults to the config's adversarial.enabled:
    the learned prior p*(z) ∝ p0(z)·e^{D(z)} is scored with an MC-estimated
    log-partition so the NLL is a proper (estimated) likelihood.

    ``prior_moments`` (a fitted ex-post prior — sampling/run tuple-arity
    convention) scores under that EXACT closed-form prior instead: no
    log-partition estimate, no error bar. Forces the adversarial
    correction off (the two priors are mutually exclusive readings of
    log p(z)); passing ``use_adversarial_prior=True`` alongside raises.
    """
    if cfg.eval.k_shards > 1 and mesh is not None:
        # The k-sharded path builds its own 2-D (data, k) mesh below; a
        # caller-provided mesh would be silently discarded — reject it.
        raise ValueError(
            "evaluate_nll cannot honor an explicit mesh with "
            f"eval.k_shards={cfg.eval.k_shards} > 1: the k-sharded IWAE "
            "builds its own 2-D (data, k) mesh. Pass mesh=None or set "
            "eval.k_shards=1.")
    if cfg.eval.k_shards > 1 and jax.process_count() > 1:
        # Multi-host k-sharding works when every data row of the (data, k)
        # grid lives entirely on one process: jax.devices() is process-major
        # and make_mesh_2d reshapes it row-major into (data, k), so a row of
        # n_k consecutive devices stays within one process exactly when n_k
        # divides the per-process device count. (pcount | n_data alone is
        # NOT enough: n_dev=8, pcount=2, n_k=3 gives n_data=2 but data row 1
        # = devices [3,4,5], straddling both processes.) Then
        # Batcher(host_shard=...) rows line up with the process's contiguous
        # data-row block and put_batch / _local_rows / _assemble_global
        # compose unchanged.
        n_dev = jax.device_count()
        n_k = min(cfg.eval.k_shards, n_dev)
        per_proc = n_dev // jax.process_count()
        if per_proc % n_k != 0:
            raise ValueError(
                f"eval.k_shards={cfg.eval.k_shards}: k-axis size {n_k} does "
                f"not divide the {per_proc} devices per process, so a "
                "(data, k) mesh row would straddle processes; pick k_shards "
                "dividing devices-per-process (or set eval.k_shards=1)")
    mesh = mesh if mesh is not None else make_mesh()
    k = k if k is not None else cfg.eval.iwae_k
    chunk = chunk if chunk is not None else min(cfg.eval.iwae_chunk, k)
    if k % chunk != 0:
        # Largest divisor of k that fits: gcd can cliff to a tiny chunk
        # (k=1000, chunk=48 -> gcd 8, a 6x longer scan for no reason).
        eff = max(d for d in range(1, min(chunk, k) + 1) if k % d == 0)
        warnings.warn(
            f"iwae chunk {chunk} does not divide k={k}; using chunk={eff} "
            "(largest divisor). Pick a divisor of k to silence this.",
            stacklevel=2)
        chunk = eff
    use_adv = (cfg.adversarial.enabled if use_adversarial_prior is None
               else use_adversarial_prior)
    prior_logpdf = None
    if prior_moments is not None:
        if use_adversarial_prior:
            raise ValueError(
                "prior_moments (ex-post prior) and use_adversarial_prior "
                "are mutually exclusive — each is a complete reading of "
                "log p(z)")
        use_adv = False
        from apv_tpu.sampling.run import expost_prior_logpdf
        # tree_map keeps the structure convention intact (tuples for the
        # Gaussian/GMM fits, a params dict for the flow)
        prior_moments = jax.device_put(
            jax.tree.map(jnp.asarray, prior_moments), replicated(mesh))
        prior_logpdf = expost_prior_logpdf(prior_moments)

    model = build_model(cfg.model)
    model_prior = getattr(cfg.model, "prior", "standard")
    d_apply = None
    prior_logpdf_p = None
    if (model_prior == "flow" and prior_logpdf is None and not use_adv) \
            or (model_prior == "gaussian" and prior_logpdf is None):
        # The checkpoint carries its own trained prior: exact density
        # whose params live inside `params` (flow — log Z stays 0; or the
        # trainable gaussian base, which COMPOSES with the adversarial
        # correction below: p*(z) ∝ N(μ,σ)·e^{D(z)}). An explicit ex-post
        # prior (prior_moments) still takes precedence — it is a
        # deliberate replacement of the model's prior.
        def prior_logpdf_p(p, z):
            return model.apply({"params": p}, z, method="prior_logpdf")
    log_z = jnp.float32(0.0)
    log_z_se = 0.0
    if use_adv:
        disc = make_latent_d(cfg.adversarial)

        def d_apply(dp, z):
            return disc.apply({"params": dp}, z)

        base_from = None
        if model_prior == "gaussian":
            # log Z must be estimated under the SAME base the weights use.
            def base_from(u):
                return model.apply({"params": params}, u,
                                   method="prior_sample_from")
        log_z, log_z_se = jax.jit(lambda dp, key: estimate_log_partition(
            d_apply, dp, cfg.model.z_dim, key, with_se=True,
            base_from=base_from))(d_params, jax.random.PRNGKey(seed + 17))
        log_z_se = float(log_z_se)

    if cfg.eval.k_shards > 1:
        from apv_tpu.eval.sharded import make_mesh_2d, make_sharded_iwae_fn
        n_dev = jax.device_count()
        n_k = min(cfg.eval.k_shards, n_dev)
        mesh = make_mesh_2d(n_dev // n_k, n_k)
        iwae_fn = make_sharded_iwae_fn(model, cfg.model.likelihood, k=k,
                                       chunk=chunk, mesh=mesh,
                                       d_apply=d_apply,
                                       prior_logpdf=prior_logpdf,
                                       prior_logpdf_p=prior_logpdf_p)
    else:
        iwae_fn = make_iwae_fn(model, cfg.model.likelihood, k=k, chunk=chunk,
                               d_apply=d_apply, prior_logpdf=prior_logpdf,
                               prior_logpdf_p=prior_logpdf_p)
    jit_iwae = jax.jit(iwae_fn)

    arrays = eval_arrays(cfg, dataset,
                         max_examples or cfg.eval.max_examples)
    batch_size = batch_size if batch_size is not None else cfg.eval.batch_size
    # Under jax.distributed each process cuts only its row block of every
    # global batch; prefetch_to_device assembles the global sharded array
    # (multihost.put_batch) exactly as the train loop does.
    batcher = Batcher(arrays,
                      _eval_batch_size(batch_size, len(arrays["image"]), mesh),
                      shuffle=False, host_shard=_host_shard())
    shard = data_sharding(mesh)
    rep = replicated(mesh)
    params = jax.device_put(params, rep)
    if d_params is not None:
        d_params = jax.device_put(d_params, rep)

    def prepped():
        # Host-side prep feeding the device prefetch queue: the gather +
        # preprocessing + PCIe transfer of batch t+2 overlaps the k-scan
        # of batch t (same double-buffering as the train loop).
        for batch in batcher.epoch():
            x_in, x_target = _prep_eval_batch(cfg, batch["image"])
            yield {"x_in": x_in, "x_target": x_target}

    pcount = jax.process_count()
    scores = []
    with mesh:
        for i, b in enumerate(prefetch_to_device(prepped(), shard)):
            ll = jit_iwae(params, d_params, b["x_in"], b["x_target"],
                          jax.random.PRNGKey(seed + i), log_z)
            scores.append(np.asarray(ll) if pcount == 1 else _local_rows(ll))
    scores = _assemble_global(scores, pcount)

    h, w, c = cfg.model.image_shape
    nll = float(-scores.mean())
    result = {
        "nll_nats": nll,
        # SEM over test examples — the sampling-noise error bar on the
        # mean NLL (the log-Z MC error bar is log_partition_se below)
        "nll_nats_se": float(scores.std(ddof=1)
                             / np.sqrt(max(scores.shape[0], 2))),
        "bits_per_dim": float(nats_to_bits_per_dim(nll, h * w * c)),
        "iwae_k": k,
        "num_examples": int(scores.shape[0]),
        "log_partition": float(log_z),
        # jackknife SE of the MC log-partition estimate: the NLL error bar
        # contributed by log Z (bits/dim moves by se/(D·ln2) per 1σ)
        "log_partition_se": log_z_se,
        "adversarial_prior": bool(use_adv),
        # 'model' = the checkpoint's own prior (N(0,I) or shaped);
        # ex-post priors are exact, so log_partition(_se) above stay 0
        "prior": ("model" if prior_moments is None
                  else "expost_flow" if isinstance(prior_moments, dict)
                  else "expost" if len(prior_moments) == 2
                  else "expost_gmm"),
    }
    if per_sample:
        result["per_sample"] = scores
    return result
