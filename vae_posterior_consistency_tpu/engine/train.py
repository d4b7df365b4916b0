"""The training engine: one compiled XLA program per chunk of epochs.

Reference behavior being rebuilt (src/experiment_main/train.py:13-133): a single
universal training loop for every model family — Adam(lr=1e-3), per-batch
mask_p / mask_drop generation, vae_type-dispatched forward/loss, end-of-training
checkpoint save with mangled filename.

TPU-first redesign:
- The dataset lives in HBM; batching is `permutation + dynamic_slice` on device.
- Mask generation uses keyed `jax.random` on device (the reference draws host
  NumPy masks every batch — a host sync per step, its biggest performance sin).
- The epoch loop AND the batch loop are `lax.scan`s inside one `jax.jit` call
  (chunked so the host can log progress), with params/optimizer state donated —
  zero host round-trips inside a chunk.
- drop_last=False parity: the per-epoch permutation is wrap-padded to a whole
  number of constant-size batches (documented deviation: the reference's final
  ragged batch instead re-normalizes by its smaller size; with shuffling this is
  statistically equivalent and keeps shapes static for XLA).

Epoch indexing parity: the loss receives `i + 1` (1-based epoch), as the
reference passes (src/experiment_main/train.py:93).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.data.loaders import Dataset, Split
from vae_posterior_consistency_tpu.engine import checkpoint
from vae_posterior_consistency_tpu.models import get_model
from vae_posterior_consistency_tpu.ops import masks

#: reference optimizer settings (src/experiment_main/train.py:21)
LEARNING_RATE = 1e-3


def make_train_step(cfg: RunConfig, model=None) -> tuple[Callable, "optax.GradientTransformation"]:
    """Build the pure per-batch step:
    (params, opt_state, x, mask, key, epoch) -> (params, opt_state, loss).

    Encodes the reference's per-batch mask dispatch
    (src/experiment_main/train.py:31-58, 77-113):
      reg families:      mask_p = MCAR(p_missingness) * mask
      with_drop vanilla: effective mask = mask * eddi_drop
      plain vanilla:     effective mask = mask
    """
    model = model or get_model(cfg)
    info = cfg.info
    tx = optax.adam(LEARNING_RATE)

    def step(params, opt_state, x, mask, key, epoch):
        k_mask, k_model = jax.random.split(key)
        eff_mask, mask_p = masks.train_masks(info, cfg, k_mask, mask)

        def loss_fn(p):
            return model.train_loss(p, x, eff_mask, mask_p, k_model, epoch, cfg)

        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss

    return step, tx


#: process-level cache of compiled chunk runners, keyed on the digit-stripped
#: config + data shape: the vae_type digit only selects WHICH files load
#: (config.parse_vae_type:split_index) — it never reaches traced code — so
#: the reference's split triples (reg_vae1/2/3, ...) share ONE compiled
#: program, with each split's (data, mask) passed as runtime arguments.
#: This cuts the serial 39-config grid from 39 train programs to 13; through
#: the tunneled TPU every distinct program costs a compile-service round
#: (RESULTS.md "Wall-clock anatomy"), so program count is wall-clock.
_RUNNER_CACHE: dict = {}

#: cap for the process-level program caches (the full reference grid needs
#: ~26 entries; the cap only matters for long-lived processes sweeping many
#: shapes). Eviction is insertion-order — oldest compiled program first.
PROGRAM_CACHE_MAX = 128


def _cache_put(cache: dict, key, value):
    if len(cache) >= PROGRAM_CACHE_MAX:
        cache.pop(next(iter(cache)))
    cache[key] = value
    return value


def _program_cache_key(cfg: RunConfig, n: int, obs_dim: int):
    import dataclasses as _dc

    stripped = "".join(c for c in cfg.vae_type if not c.isdigit())
    return _dc.astuple(cfg.replace(vae_type=stripped)) + (int(n), int(obs_dim))


def _build_epoch_runner(cfg: RunConfig, data: jax.Array, mask: jax.Array,
                        model=None, template_params=None):
    """Build a (params, opt_state, key, epoch0, n_epochs)-chunk runner.

    Parameter layout (re-measured 2026-08-19, tools/bench_mnist_probes.py):
    params stay a PYTREE through the compiled loop. The original flat-vector
    design (ravel_pytree + one fused Adam kernel, +26% in the round-1
    measurement) re-measured SLOWER everywhere on the current engine:
    flagship 4.08M vs 4.66M samples/s (pytree +14%), MNIST-EDDI b1024
    ~25-29 vs ~29-33 TFLOP/s (pytree +10-17%, interleaved same-process
    A/B). The r3b profile explains why: the per-step unravel retile
    copies/reshapes (~12 us/step) and the flat-grad concatenate
    (24.7 us/step @ 361 GB/s) cost more than optax's per-leaf Adam kernels
    save (profiles/mnist_eddi_r3b; the old design's probes are kept in
    tools/bench_mnist_probes.py as `flat`/`seg2`). The same re-measurement
    migrated the ENSEMBLES to stacked pytrees (parallel/sweep.py, +21% at
    S=128 — tools/bench_ensemble_probes.py). Compiled programs are shared
    across split-digit siblings via _RUNNER_CACHE.
    """
    # The cache key is the digit-stripped config: a caller passing a CUSTOM
    # model (anything but get_model(cfg)) must bypass the cache entirely,
    # both read and write — on a hit it would silently get another model's
    # compiled program, and on a miss it would poison the cache for every
    # later get_model(cfg) caller (ADVICE r2 finding #2).
    custom_model = model is not None and model != get_model(cfg)
    key_ = _program_cache_key(cfg, data.shape[0], data.shape[1])
    cached = None if custom_model else _RUNNER_CACHE.get(key_)
    if cached is not None:
        run_chunk, tx = cached
        return Runner(run_chunk, tx, data, mask)

    model = model or get_model(cfg)
    n = data.shape[0]
    bsz = min(cfg.batch_size, n)
    steps = math.ceil(n / bsz)
    pad = steps * bsz - n
    info = cfg.info
    tx = optax.adam(LEARNING_RATE)

    def loss_fn(p, x, m, mp, key, epoch):
        return model.train_loss(p, x, m, mp, key, epoch, cfg)[0]

    @partial(jax.jit, static_argnames=("n_epochs",), donate_argnums=(0, 1))
    def run_chunk(params, opt_state, data, mask, key, epoch0, n_epochs):
        def epoch_body(carry, epoch_off):
            params, opt_state = carry
            epoch = epoch0 + epoch_off  # 0-based here; loss gets epoch+1
            ekey = jax.random.fold_in(key, epoch)
            kperm, kstep = jax.random.split(ekey)
            perm = jax.random.permutation(kperm, n)
            if pad:
                perm = jnp.concatenate([perm, perm[:pad]])
            # hoist the per-step work that doesn't depend on params out of the
            # inner scan: one batched gather of the whole permuted epoch (the
            # per-step fetch becomes a cheap dynamic_slice) and one vmapped
            # derivation of all step keys (identical key stream to the
            # previous per-step fold_in/split, but computed as a single
            # threefry kernel instead of `steps` serialized ones)
            x_epoch = jnp.take(data, perm, axis=0)
            m_epoch = jnp.take(mask, perm, axis=0)
            skeys = jax.vmap(lambda s: jax.random.fold_in(kstep, s))(
                jnp.arange(steps)
            )
            kpairs = jax.vmap(jax.random.split)(skeys)  # [steps, 2, 2]

            def step_body(carry2, inputs):
                params, opt_state = carry2
                s, kpair = inputs
                x_b = jax.lax.dynamic_slice(
                    x_epoch, (s * bsz, 0), (bsz, x_epoch.shape[1]))
                m_b = jax.lax.dynamic_slice(
                    m_epoch, (s * bsz, 0), (bsz, m_epoch.shape[1]))
                k_mask, k_model = kpair[0], kpair[1]
                eff_mask, mask_p = masks.train_masks(info, cfg, k_mask, m_b)
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, x_b, eff_mask, mask_p, k_model,
                    (epoch + 1).astype(jnp.float32),
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            # unroll=8: measured +2% over unroll=4 steady-state on v5e
            # (amortizes per-iteration scan overhead for these tiny step
            # graphs); the hoisted gathers/keys above are worth +59%
            (params, opt_state), losses = jax.lax.scan(
                step_body, (params, opt_state), (jnp.arange(steps), kpairs),
                unroll=min(8, steps),
            )
            return (params, opt_state), jnp.sum(losses)

        (params, opt_state), epoch_losses = jax.lax.scan(
            epoch_body, (params, opt_state), jnp.arange(n_epochs)
        )
        return params, opt_state, epoch_losses

    if not custom_model:
        _cache_put(_RUNNER_CACHE, key_, (run_chunk, tx))
    return Runner(run_chunk, tx, data, mask)


class Runner:
    """Chunk runner over pytree parameters.

    Holds this run's (data, mask) and feeds them to the shared compiled
    chunk program as runtime arguments (see _RUNNER_CACHE). Params are a
    PYTREE end-to-end — the round-1 flat-vector layout was retired after the
    round-4 re-measurement (module docstring of _build_epoch_runner)."""

    def __init__(self, run_chunk, tx, data, mask):
        self.run_chunk = run_chunk
        self.tx = tx
        self.data = data
        self.mask = mask

    def __call__(self, params, opt_state, key, epoch0, n_epochs):
        return self.run_chunk(params, opt_state, self.data, self.mask, key,
                              epoch0, n_epochs)


def _build_val_fn(cfg: RunConfig, model, x, mask):
    """Compile a full-split validation objective for early stopping.

    Same per-batch mask dispatch as the training step, evaluated without
    gradients on the whole validation split at once. Two things are pinned so
    that successive checks compare the SAME objective:
    - the mask_p / drop draw uses a key FIXED across checks (the reference's
      per-epoch val loader redraws masks, adding noise to exactly the signal
      EarlyStopping thresholds on);
    - the loss is evaluated at a FIXED epoch = cfg.epoch (matching
      eval_step's default). ml_reg and beta_annealing configs scale loss
      terms by epoch/2800 (models/gauss.py:_anneal), so feeding the current
      epoch would make the objective itself drift between checks — the reg
      term's monotone growth could exhaust patience spuriously or mask real
      plateaus (ADVICE r2 finding #1)."""
    info = cfg.info
    fixed_epoch = jnp.float32(cfg.epoch)

    @jax.jit
    def val_loss(params, key):
        k_mask, k_model = jax.random.split(key)
        eff_mask, mask_p = masks.train_masks(info, cfg, k_mask, mask)
        return model.train_loss(params, x, eff_mask, mask_p, k_model,
                                fixed_epoch, cfg)[0]

    return val_loss


def train(
    dataset: Dataset,
    cfg: RunConfig,
    key: Optional[jax.Array] = None,
    experiments_root: str = "experiments",
    chunk_epochs: int = 200,
    log_fn: Optional[Callable[[int, float], None]] = None,
    save: bool = True,
    checkpoint_every: Optional[int] = None,
    resume: bool = False,
    early_stopping=None,
):
    """Full training run; returns (params, per-epoch loss history).

    Equivalent of reference train() (src/experiment_main/train.py:13-133):
    fresh model, Adam(1e-3), cfg.epoch epochs, checkpoint saved to the mangled
    reference path at the end.

    Framework additions beyond the reference (which only saves at the end and
    cannot resume — SURVEY.md §5 'Checkpoint / resume'):
    - `checkpoint_every=N` writes (params, optimizer state, epoch) to
      `<checkpoint>.resume.pt` every N epochs;
    - `resume=True` restarts from that state mid-training;
    - `early_stopping=utils.early_stopping.EarlyStopping(...)` runs a
      validation pass (dataset.test if present, else train) at every chunk
      boundary — `chunk_epochs` sets the check cadence — and, on patience
      exhaustion, stops and restores the best parameters. The reference
      imports its EarlyStopping but never instantiates it
      (src/experiment_main/train.py:4, src/utils/pytorchtools.py:5-58); here
      it is genuinely wired in.
    """
    import os

    key = jax.random.PRNGKey(cfg.seed) if key is None else key
    model = get_model(cfg)
    k_init, k_run = jax.random.split(key)
    params = model.init(k_init, cfg, dataset.obs_dim)

    split: Split = dataset.train
    runner = _build_epoch_runner(cfg, split.x, split.mask, model,
                                 template_params=params)
    opt_state = runner.tx.init(params)

    val_fn = None
    if early_stopping is not None:
        vsplit = dataset.test if dataset.test is not None else dataset.train
        val_fn = _build_val_fn(cfg, model, vsplit.x, vsplit.mask)
        k_val = jax.random.fold_in(k_run, 0x5A11D)  # fixed across checks

    final_path = checkpoint.checkpoint_path(cfg, experiments_root)
    resume_path = final_path + ".resume.pt"
    # identical tag in train_sharded: a single-chip run may resume under
    # -mesh (the resume file is mesh-independent) and vice versa. seed and
    # batch_size are tagged because the checkpoint filename encodes
    # neither: resuming under a changed -seed/-batch_size must fail loudly
    # instead of silently continuing the old run's state under new labels
    resume_tag = f"run:{cfg.vae_type}:seed={cfg.seed}:batch={cfg.batch_size}"
    done = 0
    if resume and os.path.exists(resume_path):
        params, opt_state, done = checkpoint.load_resume(
            params, opt_state, resume_path, tag=resume_tag,
            max_epochs=cfg.epoch)

    history = []
    while done < cfg.epoch:
        n_e = min(chunk_epochs, cfg.epoch - done)
        if checkpoint_every:
            n_e = min(n_e, checkpoint_every - done % checkpoint_every)
        if val_fn is not None:
            # pin the validation cadence to chunk_epochs multiples:
            # checkpoint_every is a pure-restartability knob and must not
            # change which epochs early stopping validates at (it would
            # otherwise exhaust patience at a different epoch)
            n_e = min(n_e, chunk_epochs - done % chunk_epochs)
        params, opt_state, losses = runner(
            params, opt_state, k_run, jnp.asarray(done), n_e
        )
        history.extend(jax.device_get(losses).tolist())
        done += n_e
        if checkpoint_every and (done % checkpoint_every == 0
                                 or done >= cfg.epoch):
            # the final boundary is always written, even when cfg.epoch is
            # not a multiple of checkpoint_every (a later higher-epoch run
            # resumes instead of retraining)
            checkpoint.save_resume(params, opt_state, done, resume_path,
                                   tag=resume_tag)
        if log_fn is not None:
            log_fn(done, history[-1])
        if val_fn is not None and (done % chunk_epochs == 0
                                   or done >= cfg.epoch):
            vloss = float(val_fn(params, k_val))
            # snapshot to host: the live arrays are DONATED to the next
            # chunk call, which would delete a stored device reference
            if early_stopping.update(vloss, jax.device_get(params)):
                break

    if early_stopping is not None and early_stopping.best_params is not None:
        params = early_stopping.best_params
    if save:
        checkpoint.save(params, final_path)
    return params, history


def load_trained(dataset: Dataset, cfg: RunConfig,
                 experiments_root: str = "experiments"):
    """model_loader('test') equivalent (reference: src/utils/loaders.py:13-246):
    rebuild the model and load the mangled-path checkpoint."""
    model = get_model(cfg)
    template = model.init(jax.random.PRNGKey(0), cfg, dataset.obs_dim)
    return checkpoint.load(
        template, checkpoint.checkpoint_path(cfg, experiments_root)
    )
