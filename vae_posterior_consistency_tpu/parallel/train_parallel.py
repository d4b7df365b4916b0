"""Multi-chip training: pjit-sharded train step over a (dp, tp) mesh.

Replaces the reference's implicit one-device assumption (SURVEY.md §2.5;
reference: src/experiment_main/imputation.py:16) with SPMD training:

- batch rows sharded over `dp`; XLA emits the gradient all-reduce (`psum`
  over ICI) because parameters are `dp`-replicated,
- wide MLP weights column-sharded over `tp` (see parallel/mesh.py rules);
  XLA inserts the activation collectives,
- the optimizer update runs sharded in the same program (no host round-trip).

All collectives are compiler-emitted — there is no hand-written NCCL/MPI
analog to port; this is the idiomatic JAX mapping of the workload.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.sharding import NamedSharding, PartitionSpec as P

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.engine.train import make_train_step
from vae_posterior_consistency_tpu.models import get_model
from vae_posterior_consistency_tpu.parallel import mesh as meshlib


def make_parallel_train_step(cfg: RunConfig, mesh, model=None, params=None):
    """Build (sharded_step, shard_inputs, tx) for one optimizer step over
    `mesh`.

    sharded_step(params, opt_state, x, mask, key, epoch)
      -> (params, opt_state, loss)
    with params/opt_state laid out per the tp rules and x/mask dp-sharded.
    """
    model = model or get_model(cfg)
    step_fn, tx = make_train_step(cfg, model)

    p_shard = meshlib.params_shardings(params, mesh) if params is not None else None
    b_shard = meshlib.batch_sharding(mesh)
    repl = NamedSharding(mesh, P())

    opt_shard = None
    if params is not None:
        # shapes only — avoid materializing a second full Adam state just to
        # derive its shardings
        opt_state = jax.eval_shape(tx.init, params)
        opt_shard = jax.tree_util.tree_map(
            lambda leaf: _match_opt_sharding(leaf, params, p_shard, mesh),
            opt_state,
            is_leaf=lambda l: isinstance(l, jnp.ndarray) or hasattr(l, "shape"),
        )

    @partial(
        jax.jit,
        in_shardings=(p_shard, opt_shard, b_shard, b_shard, repl, repl),
        out_shardings=(p_shard, opt_shard, repl),
        donate_argnums=(0, 1),
    )
    def sharded_step(params, opt_state, x, m, key, epoch):
        return step_fn(params, opt_state, x, m, key, epoch)

    def shard_inputs(params, opt_state, x, m):
        params = jax.device_put(params, p_shard)
        opt_state = jax.device_put(opt_state, opt_shard)
        x = jax.device_put(x, b_shard)
        m = jax.device_put(m, b_shard)
        return params, opt_state, x, m

    return sharded_step, shard_inputs, tx


def _match_opt_sharding(leaf, params, p_shard, mesh):
    """Adam moments mirror their parameter's sharding; scalars replicate."""
    # match by shape against the params tree
    flat_p = jax.tree_util.tree_leaves(params)
    flat_s = jax.tree_util.tree_leaves(p_shard)
    for p, s in zip(flat_p, flat_s):
        if hasattr(leaf, "shape") and leaf.shape == p.shape:
            return s
    return NamedSharding(mesh, P())


def dryrun_train_step(cfg: RunConfig, mesh, obs_dim: int = 8,
                      batch_per_device: int = 4, seed: int = 0):
    """Compile + execute ONE full sharded training step on tiny shapes.

    Used by the multi-chip dry-run harness: validates that the dp/tp sharding
    rules produce a program that compiles and runs on an n-device mesh.
    Returns the scalar loss.
    """
    model = get_model(cfg)
    key = jax.random.PRNGKey(seed)
    k_init, k_data, k_step = jax.random.split(key, 3)
    params = model.init(k_init, cfg, obs_dim)

    dp = mesh.shape["dp"]
    B = batch_per_device * dp
    x = jax.random.uniform(k_data, (B, obs_dim))
    m = (jax.random.uniform(jax.random.fold_in(k_data, 1), (B, obs_dim)) < 0.7
         ).astype(jnp.float32)

    sharded_step, shard_inputs, tx = make_parallel_train_step(
        cfg, mesh, model, params
    )
    opt_state = tx.init(params)
    params, opt_state, x, m = shard_inputs(params, opt_state, x, m)
    params, opt_state, loss = sharded_step(
        params, opt_state, x, m, k_step, jnp.float32(1.0)
    )
    jax.block_until_ready(loss)
    return float(loss)


def train_sharded(dataset, cfg: RunConfig, mesh, chunk_epochs: int = 200,
                  model=None, save: bool = False,
                  experiments_root: str = "experiments",
                  checkpoint_every=None, resume: bool = False,
                  early_stopping=None):
    """Full multi-chip training loop: the single-device engine's semantics
    (per-epoch permutation, on-device mask_p/drop generation, reference
    1-based epoch indexing, Adam fused in-program — engine/train.py) with
    batch rows dp-sharded and wide parameters tp-sharded over `mesh`.

    The table itself stays replicated (tabular datasets are tiny relative to
    HBM); every step's batch is sharding-constrained onto `dp`, so XLA emits
    the gradient psum over ICI. Returns (params, loss_history [epochs]).

    Restart contract (same as the serial engine, engine/train.train):
    `checkpoint_every=N` writes (params, opt_state, epochs-done) to
    `<checkpoint>.resume.pt` every N epochs (checkpoint.save_resume — leaves
    gather to host arrays, so the file is mesh-independent), and
    `resume=True` restarts from it, re-sharding the loaded state over THIS
    run's mesh. Epoch keys derive from the absolute epoch index
    (fold_in(key0, epoch+1) below), so the resumed run is bit-identical to
    an uninterrupted one
    (tests/test_parallel.py::test_train_sharded_resume_bit_identical).
    On resume the returned history covers only this process's epochs.

    `early_stopping` (utils.early_stopping.EarlyStopping) carries the serial
    engine's contract verbatim: a validation pass (test split, train when
    absent) at every chunk_epochs boundary via the SAME compiled objective
    (engine/train._build_val_fn — fixed key, fixed epoch), patience stop +
    best-params restore. The best-params snapshot is a host copy, so it is
    mesh-independent like the resume file.

    Deliberately specialized (not unified with engine/train._build_epoch_runner
    or parallel/sweep's ensembles): all three engines run pytree params, but
    the single-chip runner shares compiled programs across split digits via
    its runner cache, the ensembles add a stacked leading [S] axis, and this
    loop threads (dp, tp) shardings through every carry — one abstraction over
    all three would obscure each one's layout contract.
    """
    import math
    import os

    import numpy as np

    model = model or get_model(cfg)
    data, mask = dataset.train.x, dataset.train.mask
    n = data.shape[0]
    dp = mesh.shape["dp"]
    # batch must divide over dp
    bsz = max(min(cfg.batch_size, n) // dp * dp, dp)
    steps = math.ceil(n / bsz)
    pad = steps * bsz - n
    # when n < dp the padded epoch (dp rows) needs more than one copy of the
    # permutation; tile it (jnp.tile below) so tiny datasets on wide meshes
    # train rather than failing an out-of-range dynamic_slice at trace time
    perm_reps = math.ceil((n + pad) / n)

    key0 = jax.random.PRNGKey(cfg.seed)
    params = model.init(key0, cfg, dataset.obs_dim)
    p_shard = meshlib.params_shardings(params, mesh)
    b_spec = P("dp", None)
    repl = NamedSharding(mesh, P())
    # the per-step semantics (mask dispatch, grad, fused Adam) come verbatim
    # from the single-device step builder
    step_fn, tx = make_train_step(cfg, model)
    opt_state = tx.init(params)
    opt_shard = jax.tree_util.tree_map(
        lambda leaf: _match_opt_sharding(leaf, params, p_shard, mesh),
        opt_state,
        is_leaf=lambda l: hasattr(l, "shape"),
    )
    params = jax.device_put(params, p_shard)
    opt_state = jax.device_put(opt_state, opt_shard)

    @partial(jax.jit, static_argnames=("n_epochs",), donate_argnums=(0, 1),
             in_shardings=(p_shard, opt_shard, repl),
             out_shardings=(p_shard, opt_shard, repl))
    def run_chunk(params, opt_state, epoch0, n_epochs):
        def epoch_body(carry, off):
            params, opt_state = carry
            epoch = epoch0 + off
            ekey = jax.random.fold_in(key0, epoch + 1)
            kperm, kstep = jax.random.split(ekey)
            perm = jax.random.permutation(kperm, n)
            if pad:
                perm = jnp.tile(perm, perm_reps)[: n + pad]
            x_e = jnp.take(data, perm, axis=0)
            m_e = jnp.take(mask, perm, axis=0)

            def step_body(carry2, s):
                params, opt_state = carry2
                x_b = jax.lax.dynamic_slice(
                    x_e, (s * bsz, 0), (bsz, x_e.shape[1]))
                m_b = jax.lax.dynamic_slice(
                    m_e, (s * bsz, 0), (bsz, m_e.shape[1]))
                x_b = jax.lax.with_sharding_constraint(
                    x_b, NamedSharding(mesh, b_spec))
                m_b = jax.lax.with_sharding_constraint(
                    m_b, NamedSharding(mesh, b_spec))
                skey = jax.random.fold_in(kstep, s)
                params, opt_state, loss = step_fn(
                    params, opt_state, x_b, m_b, skey,
                    (epoch + 1).astype(jnp.float32))
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step_body, (params, opt_state), jnp.arange(steps))
            return (params, opt_state), jnp.sum(losses)

        (params, opt_state), hist = jax.lax.scan(
            epoch_body, (params, opt_state), jnp.arange(n_epochs))
        return params, opt_state, hist

    from vae_posterior_consistency_tpu.engine import checkpoint

    resume_path = (checkpoint.checkpoint_path(cfg, experiments_root)
                   + ".resume.pt")
    # same tag as engine/train.train: the file is mesh-independent, so a
    # single-chip run may resume sharded and vice versa (seed/batch_size
    # are tagged because the filename encodes neither)
    resume_tag = f"run:{cfg.vae_type}:seed={cfg.seed}:batch={cfg.batch_size}"
    done = 0
    if resume and os.path.exists(resume_path):
        params, opt_state, done = checkpoint.load_resume(params, opt_state,
                                                         resume_path,
                                                         tag=resume_tag,
                                                         max_epochs=cfg.epoch)
        params = jax.device_put(params, p_shard)
        opt_state = jax.device_put(opt_state, opt_shard)

    val_fn = None
    if early_stopping is not None:
        from vae_posterior_consistency_tpu.engine.train import _build_val_fn

        vsplit = dataset.test if dataset.test is not None else dataset.train
        val_fn = _build_val_fn(cfg, model, vsplit.x, vsplit.mask)
        # same derivation as the serial engine's k_val: train() splits
        # PRNGKey(cfg.seed) into (k_init, k_run) and folds 0x5A11D into
        # k_run — mirrored so the two engines validate on the same draw
        k_val = jax.random.fold_in(jax.random.split(key0)[1], 0x5A11D)

    history = []
    while done < cfg.epoch:
        n_e = min(chunk_epochs, cfg.epoch - done)
        if checkpoint_every:
            n_e = min(n_e, checkpoint_every - done % checkpoint_every)
        if val_fn is not None:
            # validation cadence pins to chunk_epochs multiples so
            # checkpoint_every cannot shift which epochs are checked
            # (serial-engine rule, engine/train.train)
            n_e = min(n_e, chunk_epochs - done % chunk_epochs)
        params, opt_state, hist = run_chunk(params, opt_state,
                                            jnp.asarray(done), n_e)
        history.append(jax.device_get(hist))
        done += n_e
        if checkpoint_every and (done % checkpoint_every == 0
                                 or done >= cfg.epoch):
            # the final boundary is always written, even when cfg.epoch is
            # not a multiple of checkpoint_every (serial-engine parity)
            checkpoint.save_resume(jax.device_get(params),
                                   jax.device_get(opt_state), done,
                                   resume_path, tag=resume_tag)
        if val_fn is not None and (done % chunk_epochs == 0
                                   or done >= cfg.epoch):
            vloss = float(val_fn(params, k_val))
            # host snapshot: the live sharded arrays are donated to the
            # next chunk call
            if early_stopping.update(vloss, jax.device_get(params)):
                break
    if early_stopping is not None and early_stopping.best_params is not None:
        params = jax.device_put(early_stopping.best_params, p_shard)
    if save:
        # same mangled checkpoint path as the single-chip engine (the layout
        # is mesh-independent: leaves gather to host arrays on save)
        checkpoint.save(jax.device_get(params),
                        checkpoint.checkpoint_path(cfg, experiments_root))
    return params, (np.concatenate(history, axis=0) if history
                    else np.zeros((0,)))
