"""Sweep parallelism: vmap whole training runs over seeds / splits / alphas.

The reference runs its (3 data splits) x (alpha) x (missing-rate) sweep as
serial Python loops (reference: src/experiment_main/imputation.py:21-25).
Here a whole axis of the sweep trains simultaneously: an ensemble of N
independent runs becomes ONE batched XLA program whose matmuls stack on the
MXU.

Design (round 4 re-measurement): all three ensemble axes share one runner
built exactly like the serial engine's hot loop
(engine/train.py:_build_epoch_runner) — the ensemble's parameters are a
STACKED PYTREE (every leaf carries a leading [S] replica axis), the
backward is one summed-loss autodiff over the vmapped per-replica losses,
optax Adam updates each stacked leaf (elementwise, so bitwise-identical to
S separate updates), and the per-epoch gathers/key-derivations are hoisted
out of the step scan. History: round 2 shipped an [S, P] flat-MATRIX
layout (one fused Adam kernel) after an early vmapped-pytree version
measured ~4x slower; round 4's probes re-measured the head-to-head at the
production shape (S=128, batch 64, tools/bench_ensemble_probes.py) and the
stacked pytree now wins +21% (40.8M vs 33.8M samples/s, identical losses)
for the same reason the single-run engine switched: the per-replica
`unravel` retiles and the [S, P] grad assembly cost more than per-leaf
Adam kernels on [S, ...] leaves.

Key-stream semantics per axis (unchanged from the vmapped version):
- seed ensemble:  every replica has its own shuffle order and mask/model
  streams (fully independent runs).
- split ensemble: replicas hold DIFFERENT datasets (the vae_type digit axis,
  reference loop at src/experiment_main/imputation.py:21-22), so one shared
  shuffle order couples nothing; mask/model keys are per-replica.
- alpha ensemble: replicas share data, shuffle order, AND mask/model streams
  — isolating the effect of alpha, which is what the sweep studies
  (reference loop: src/experiment_main/imputation.py:24).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import optax

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.engine.train import LEARNING_RATE
from vae_posterior_consistency_tpu.models import get_model
from vae_posterior_consistency_tpu.ops import masks as masks_ops


#: replica count at which seed-mode ensembles switch from hoisted
#: [S, n+pad, D] epoch gathers to per-step row gathers (see the measured
#: policy note in _make_ensemble_chunk). Module-level so tests can pin the
#: two layouts against each other at tiny S.
PER_STEP_GATHER_MIN_S = 128

#: widest seed ensemble trained as ONE program. Past S≈512 the regime is
#: replica-overhead-bound regardless of gather layout (RESULTS.md round-5
#: map: S=1024 runs at 25.6M samples/s vs S=512's 31.9M, b64), so
#: train_seed_ensemble splits wider requests into sequential ≤S_MAX groups
#: — replicas are fully independent and every stream is keyed by the seed
#: value (never the row index), so grouping leaves every replica's PRNG
#: draws untouched; only FP reassociation across differently-sized
#: compiled programs can move values, at rounding level (~1e-6 — pinned by
#: tests/test_parallel.py::test_seed_ensemble_group_split_equivalence).
#: Measured end-to-end at a 300-epoch budget: grouped S=1024 runs 30.4M
#: samples/s vs the one-program 25.6M (+19%, near the S=512 program's
#: 31.9M); per-group trace/load overhead amortizes from ~50 epochs up
#: (RESULTS.md "Ensemble rollover").
SEED_GROUP_MAX_S = 512


def _stacked_init(model, cfg, obs_dim, init_keys):
    """Stacked-pytree ensemble init: every leaf gains a leading [S] axis."""
    return jax.vmap(lambda k: model.init(k, cfg, obs_dim))(init_keys)


def _make_ensemble_chunk(cfg: RunConfig, model, data, mask, *,
                         mode: str, S: int, seeds=None, alphas=None,
                         missings=None):
    """Compile the ensemble chunk runner.

    data/mask: [S, n, D] stacked per-replica tables when mode == 'split',
    else one shared [n, D] table. `missings`: optional [S] per-replica
    p_missingness rates — the rate enters only the mask_p draw
    (ops/masks.train_masks -> sub_mask), so a traced per-replica scalar
    substitutes via cfg.replace exactly like alpha in the traced loss.
    Returns run_chunk(params_ens, opt_state, epoch0, n_epochs) ->
    (params_ens, opt_state, hist [n_epochs, S]) over the stacked pytree.
    """
    info = cfg.info
    tx = optax.adam(LEARNING_RATE)
    per_replica_data = mode == "split"
    n = data.shape[1] if per_replica_data else data.shape[0]
    obs_dim = data.shape[-1]
    bsz = min(cfg.batch_size, n)
    steps = math.ceil(n / bsz)
    pad = steps * bsz - n
    use_alpha = alphas is not None
    use_miss = missings is not None
    shared_streams = mode == "alpha"
    # WIDE seed ensembles skip the materialized [S, n+pad, D] epoch tables:
    # each step gathers its [S, bsz] rows straight from the [n, D] source,
    # and the step scan runs un-unrolled (value-identical — a gather
    # reorder; pinned by tests/test_parallel.py::
    # test_seed_ensemble_per_step_gather_layout_equivalence). Measured on
    # TPU v5e at batch 64 (tools/bench_rollover_probes.py, RESULTS.md
    # round-5 rollover study): +10% at S=128, +28% at S=256, +24% at
    # S=512 over the hoisted-table layout; the epoch-table random-row
    # gather (S*n rows/epoch) plus the unroll=8 graph was the measured
    # rollover driver. Below the threshold the hoisted layout keeps its
    # serial-engine-measured win (+59% at S=1, engine/train.py).
    per_step_gather = mode == "seed" and S >= PER_STEP_GATHER_MIN_S
    unroll = 1 if per_step_gather else min(8, steps)

    def replica_loss(p, x_b, m_b, mp_b, k_model, epoch, alpha):
        c = cfg.replace(alpha=alpha) if use_alpha else cfg
        return model.train_loss(p, x_b, m_b, mp_b, k_model, epoch, c)[0]

    # vmap in_axes: batch/mask/keys are per-replica except in alpha mode,
    # where replicas deliberately share every stream but alpha itself —
    # unless the missing-rate axis is swept, which makes the masks (but
    # still not the data/keys) per-replica
    ax = 0 if not shared_streams else None
    mask_ax = 0 if (not shared_streams or use_miss) else None
    loss_axes = (0, ax, mask_ax, mask_ax, ax, None, 0 if use_alpha else None)

    def total_loss(Pens, x_b, m_b, mp_b, k_models, epoch, alpha_v):
        per = jax.vmap(replica_loss, loss_axes)(Pens, x_b, m_b, mp_b,
                                                k_models, epoch, alpha_v)
        return jnp.sum(per), per

    grad_fn = jax.value_and_grad(total_loss, has_aux=True)

    def make_masks(k_mask, m_b, p):
        """(eff_mask, mask_p) for one replica's batch — the serial step's
        dispatch, shared via ops/masks.train_masks. `p` is the replica's
        (traced) p_missingness when the missing axis is swept, else None."""
        c = cfg.replace(p_missingness=p) if use_miss else cfg
        return masks_ops.train_masks(info, c, k_mask, m_b)

    @partial(jax.jit, static_argnames=("n_epochs",), donate_argnums=(0, 1))
    def run_chunk(Pmat, opt_state, epoch0, n_epochs):
        def epoch_body(carry, off):
            Pmat, opt_state = carry
            epoch = (epoch0 + off).astype(jnp.float32) + 1.0

            def padded(perm):
                return jnp.concatenate([perm, perm[:pad]]) if pad else perm

            if mode == "seed":
                # fully independent replicas: own shuffle + own step streams
                ekeys = jax.vmap(
                    lambda s: jax.random.fold_in(jax.random.PRNGKey(s),
                                                 epoch0 + off))(seeds)
                kperms, ksteps = jax.vmap(jax.random.split, out_axes=1)(ekeys)
                perms = jax.vmap(
                    lambda k: padded(jax.random.permutation(k, n)))(kperms)
                if per_step_gather:
                    x_epoch = m_epoch = None  # steps gather from `data`
                else:
                    x_epoch = jnp.take(data, perms, axis=0)  # [S, n+pad, D]
                    m_epoch = jnp.take(mask, perms, axis=0)
                step_keys = jax.vmap(jax.vmap(
                    lambda k, s: jax.random.split(jax.random.fold_in(k, s)),
                    (None, 0)), (0, None))(ksteps, jnp.arange(steps))
                # [S, steps, 2, 2] -> [steps, S, 2, 2]
                step_keys = jnp.swapaxes(step_keys, 0, 1)
            else:
                tag = 13 if mode == "split" else 7
                ekey = jax.random.fold_in(jax.random.PRNGKey(cfg.seed + tag),
                                          epoch0 + off)
                kperm, kstep = jax.random.split(ekey)
                perm = padded(jax.random.permutation(kperm, n))
                if per_replica_data:
                    x_epoch = jnp.take(data, perm, axis=1)  # [S, n+pad, D]
                    m_epoch = jnp.take(mask, perm, axis=1)
                else:
                    x_epoch = jnp.take(data, perm, axis=0)  # [n+pad, D]
                    m_epoch = jnp.take(mask, perm, axis=0)
                base = jax.vmap(
                    lambda s: jax.random.fold_in(kstep, s))(jnp.arange(steps))
                if shared_streams:
                    step_keys = jax.vmap(jax.random.split)(base)  # [steps,2,2]
                else:
                    step_keys = jax.vmap(jax.vmap(
                        jax.random.split), (0,))(jax.vmap(
                            jax.vmap(jax.random.fold_in, (None, 0)),
                            (0, None))(base, jnp.arange(S)))
                    # [steps, S, 2, 2]

            def step_body(carry2, inputs):
                Pmat, opt_state = carry2
                s, kp = inputs

                def slice_rows(arr):
                    if arr.ndim == 3:  # [S, n+pad, D]
                        return jax.lax.dynamic_slice(
                            arr, (0, s * bsz, 0), (S, bsz, obs_dim))
                    return jax.lax.dynamic_slice(
                        arr, (s * bsz, 0), (bsz, obs_dim))

                if per_step_gather:
                    idx = jax.lax.dynamic_slice(perms, (0, s * bsz), (S, bsz))
                    x_b = jnp.take(data, idx, axis=0)       # [S, bsz, D]
                    m_b = jnp.take(mask, idx, axis=0)
                else:
                    x_b = slice_rows(x_epoch)
                    m_b = slice_rows(m_epoch)
                if shared_streams:
                    k_mask, k_model = kp[0], kp[1]
                    if use_miss:
                        # shared key, per-replica rate: the rows' mask_p
                        # draws NEST (same uniform, different threshold) —
                        # the tightest possible pairing across rates
                        eff_m, mask_p = jax.vmap(make_masks, (None, None, 0))(
                            k_mask, m_b, missings)
                    else:
                        eff_m, mask_p = make_masks(k_mask, m_b, None)
                else:  # seed/split: per-replica streams
                    k_mask, k_model = kp[:, 0], kp[:, 1]        # [S, 2] each
                    eff_m, mask_p = jax.vmap(make_masks, (0, 0, 0 if use_miss
                                                          else None))(
                        k_mask, m_b, missings)
                (tot, per), grads = grad_fn(Pmat, x_b, eff_m, mask_p,
                                            k_model, epoch, alphas)
                updates, opt_state = tx.update(grads, opt_state, Pmat)
                Pmat = optax.apply_updates(Pmat, updates)
                return (Pmat, opt_state), per

            (Pmat, opt_state), losses = jax.lax.scan(
                step_body, (Pmat, opt_state),
                (jnp.arange(steps), step_keys), unroll=min(unroll, steps))
            return (Pmat, opt_state), jnp.sum(losses, axis=0)  # [S]

        (Pmat, opt_state), hist = jax.lax.scan(epoch_body, (Pmat, opt_state),
                                               jnp.arange(n_epochs))
        return Pmat, opt_state, hist

    return run_chunk


def _make_ensemble_val_fn(cfg: RunConfig, model, val_x, val_m, *,
                          per_replica_data=False, alphas=None, missings=None):
    """Stacked validation objective for per-replica early stopping: one
    jitted `val_fn(params_ens) -> [S] losses`, the vmapped generalization of
    engine/train._build_val_fn (whose two pins it keeps — see that
    docstring): the mask_p/drop draw uses a key FIXED across checks, and the
    loss evaluates at the FIXED epoch cfg.epoch, so successive checks
    compare the same objective.

    Validation streams are deliberately SHARED across replicas (one fixed
    (k_mask, k_model) pair for every row) even in modes whose TRAINING
    streams are per-replica: the check is a stopping diagnostic, and judging
    every replica's plateau on identical mask/sample noise is what makes the
    [S] losses comparable. Per-row alpha/p_missingness still substitute via
    cfg.replace exactly as in the traced training loss (the swept knob must
    enter its own row's objective)."""
    info = cfg.info
    use_alpha = alphas is not None
    use_miss = missings is not None
    fixed_epoch = jnp.float32(cfg.epoch)
    k_mask, k_model = jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 0x5A11D))

    def row_loss(p, x, m, alpha, miss):
        c = cfg.replace(p_missingness=miss) if use_miss else cfg
        eff_m, mask_p = masks_ops.train_masks(info, c, k_mask, m)
        if use_alpha:
            c = c.replace(alpha=alpha)
        return model.train_loss(p, x, eff_m, mask_p, k_model, fixed_epoch,
                                c)[0]

    data_ax = 0 if per_replica_data else None
    axes = (0, data_ax, data_ax, 0 if use_alpha else None,
            0 if use_miss else None)
    alpha_v = alphas if use_alpha else 0.0
    miss_v = missings if use_miss else 0.0

    @jax.jit
    def val_fn(Pmat):
        return jax.vmap(row_loss, axes)(Pmat, val_x, val_m, alpha_v, miss_v)

    return val_fn


def _val_split(dataset):
    """Validation split for early stopping: test when present, else train —
    the serial engine's convention (engine/train.train)."""
    return dataset.test if dataset.test is not None else dataset.train


def _run_chunked(run_chunk, Pmat, opt_state, epochs, chunk_epochs,
                 resume_path=None, checkpoint_every=None, resume=False,
                 shard_fn=None, resume_tag="", val_fn=None,
                 early_stopping=None):
    """Drive an ensemble chunk runner to `epochs`, optionally with the
    serial engine's restart contract (engine/train.train): with
    `checkpoint_every=N` the stacked (params, opt_state, epochs-done) state
    writes to `resume_path` every N epochs (checkpoint.save_resume — one
    atomic file for the WHOLE ensemble), and `resume=True` restarts from it.
    Every per-epoch key derives from the ABSOLUTE epoch index (fold_in of
    epoch0+off in _make_ensemble_chunk), so a resumed run is bit-identical
    to an uninterrupted one regardless of where it was killed
    (tests/test_parallel.py::test_split_ensemble_resume_bit_identical,
    test_seed_ensemble_resume_sharded). `resume_tag` is the ensemble's
    sweep identity (row VALUES), verified on load so resuming under
    changed sweep flags fails loudly (checkpoint.load_resume). `shard_fn`
    re-applies the mesh layout to freshly-loaded host state (resume would
    otherwise silently un-shard a dp-sharded ensemble). On resume, the
    returned history covers only the epochs run in THIS process (same as
    the serial engine).

    With `val_fn` ([S] stacked validation objective, _make_ensemble_val_fn)
    and `early_stopping` (utils.early_stopping.EnsembleEarlyStopping), runs
    a per-replica patience check at every chunk_epochs boundary — the
    serial engine's cadence — stopping the whole program once EVERY replica
    has exhausted patience, and returns each replica's own best-epoch
    parameters (a HOST pytree once any check ran). checkpoint_every must
    not shift which epochs the checks see, so chunk boundaries pin to
    chunk_epochs multiples exactly as in engine/train.train. The
    early-stopping tracker itself is process-local (not persisted in the
    resume file), matching the serial engine's caller-held EarlyStopping.
    The tracker sees ALL rows including any mesh dp-padding: padded rows
    duplicate a real row's data but (outside seed mode) carry their own
    init, so they can only DELAY the whole-program stop, never corrupt a
    real replica's best snapshot (trainers slice [:S] afterwards)."""
    import os

    import numpy as np

    from vae_posterior_consistency_tpu.engine import checkpoint

    if (checkpoint_every or resume) and not resume_path:
        # the serial engine derives its resume path from the config; the
        # ensemble trainers cannot (one file covers many sweep rows), so a
        # missing path must fail loudly instead of silently writing nothing
        raise ValueError(
            "checkpoint_every/resume require resume_path on the ensemble "
            "trainers (the CLI derives it; API callers must pass one)")
    done = 0
    if resume and os.path.exists(resume_path):
        Pmat, opt_state, done = checkpoint.load_resume(Pmat, opt_state,
                                                       resume_path,
                                                       tag=resume_tag,
                                                       max_epochs=epochs)
        if shard_fn is not None:
            Pmat, opt_state = shard_fn(Pmat, opt_state)
    history = []
    while done < epochs:
        n_e = min(chunk_epochs, epochs - done)
        if checkpoint_every:
            n_e = min(n_e, checkpoint_every - done % checkpoint_every)
        if val_fn is not None:
            # pin the validation cadence to chunk_epochs multiples:
            # checkpoint_every is a pure-restartability knob and must not
            # change which epochs early stopping validates at (it would
            # otherwise exhaust patience at a different epoch) — same rule
            # as engine/train.train
            n_e = min(n_e, chunk_epochs - done % chunk_epochs)
        Pmat, opt_state, hist = run_chunk(Pmat, opt_state, jnp.asarray(done),
                                          n_e)
        history.append(jax.device_get(hist))
        done += n_e
        if (checkpoint_every
                and (done % checkpoint_every == 0 or done >= epochs)):
            # the final boundary is ALWAYS written, even when epochs is not
            # a multiple of checkpoint_every: a later run with a higher
            # cfg.epoch resumes instead of retraining from scratch
            checkpoint.save_resume(Pmat, opt_state, done, resume_path,
                                   tag=resume_tag)
        if val_fn is not None and (done % chunk_epochs == 0
                                   or done >= epochs):
            # the tracker snapshots improved rows to HOST itself (the live
            # ensemble arrays are donated to the next chunk call)
            if early_stopping.update(jax.device_get(val_fn(Pmat)), Pmat):
                break
    if early_stopping is not None and early_stopping.best_params is not None:
        Pmat = early_stopping.best_params  # per-replica best rows (host)
    hist = (np.concatenate(history, axis=0).T if history
            else np.zeros((jax.tree_util.tree_leaves(Pmat)[0].shape[0], 0)))
    return Pmat, hist  # [S, epochs_run_here]


def shard_ensemble(params_ens, opt_state, mesh):
    """Lay an ensemble's stacked state out over the mesh's `dp` axis.

    Every leaf's leading [S] replica axis shards across chips; replicas
    never communicate, so XLA partitions the whole chunk program with zero
    collectives. Shared (data, mask) stay replicated. Requires S % dp == 0.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = mesh.shape["dp"]
    S = jax.tree_util.tree_leaves(params_ens)[0].shape[0]
    if S % dp != 0:
        raise ValueError(f"ensemble size {S} not divisible by dp={dp}")

    def shard(a):
        spec = P(*(("dp",) + (None,) * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    def maybe_shard(a):
        return (shard(a) if getattr(a, "ndim", 0) >= 1
                and a.shape[:1] == (S,) else a)

    return (jax.tree_util.tree_map(shard, params_ens),
            jax.tree_util.tree_map(maybe_shard, opt_state))


def _shard_fn(mesh):
    """Resume re-sharding hook for _run_chunked: freshly-loaded host state
    must be laid back out over the mesh's dp axis (None = single-chip)."""
    if mesh is None:
        return None
    return lambda p, o: shard_ensemble(p, o, mesh)


def _take_rows(params_ens, S: int):
    """First S replica rows of a stacked-pytree ensemble."""
    return jax.tree_util.tree_map(lambda leaf: leaf[:S], params_ens)


def build_seed_ensemble_runner(dataset, cfg: RunConfig, seeds, mesh=None):
    """Compile the n_seeds-replica chunk runner; returns
    (run_chunk, params_ens, opt_state) with params_ens the stacked pytree
    (leading [S] axis on every leaf).
    run_chunk(params_ens, opt_state, epoch0, n_epochs) -> (params_ens,
    opt_state, losses [n_epochs, n_seeds]). Exposed separately so
    benchmarks can time/cost-analyze the compiled program directly
    (bench.py ensemble regime). With `mesh`, the replica axis shards over
    the mesh's `dp` axis (see shard_ensemble)."""
    model = get_model(cfg)
    seeds = list(seeds)
    S = len(seeds)
    # replica padding (same scheme as train_split_ensemble): rows shard over
    # dp, so pad S to the next multiple by repeating the last seed; padded
    # rows train as dead weight and callers slice [:S]
    if mesh is not None:
        dp = mesh.shape["dp"]
        seeds = seeds + [seeds[-1]] * ((-S) % dp)
    seeds = jnp.asarray(seeds, jnp.uint32)
    init_keys = jax.vmap(jax.random.PRNGKey)(seeds)
    params_ens = _stacked_init(model, cfg, dataset.obs_dim, init_keys)
    run_chunk = _make_ensemble_chunk(
        cfg, model, dataset.train.x, dataset.train.mask,
        mode="seed", S=len(seeds), seeds=seeds)
    tx = optax.adam(LEARNING_RATE)
    opt_state = tx.init(params_ens)
    if mesh is not None:
        params_ens, opt_state = shard_ensemble(params_ens, opt_state, mesh)
    return run_chunk, params_ens, opt_state


def train_seed_ensemble(dataset, cfg: RunConfig, seeds, chunk_epochs: int = 200,
                        mesh=None, checkpoint_every=None, resume=False,
                        resume_path=None, early_stopping=None):
    """Train len(seeds) independent replicas of the same config in one program.

    Returns (ensemble_params pytree [S, ...], loss_history [n_seeds, epochs]).
    Each replica gets its own init and its own shuffling/mask PRNG stream.
    With `mesh`, replicas shard across the mesh's `dp` axis (zero
    collectives — replicas are independent; see shard_ensemble), padding
    S to a multiple of dp internally (padded rows are sliced off here).

    Requests wider than SEED_GROUP_MAX_S train as sequential groups of at
    most that many replicas (each group its own compiled program; equal
    group sizes share one compile cache entry). Every replica's
    init/shuffle/mask streams key off its SEED value, so grouping changes
    no PRNG draw (values move only at FP-reassociation rounding level —
    see SEED_GROUP_MAX_S) and is measurably faster than one ultra-wide
    program. With checkpoint_every/resume, group i writes
    `resume_path + '.g{i}'` so a killed multi-group run resumes
    group-accurately.

    `early_stopping` (utils.early_stopping.EnsembleEarlyStopping) runs a
    per-replica patience check at every chunk_epochs boundary against the
    test split (train when absent) and returns each replica's best-epoch
    params; grouped ultra-wide requests give each sequential group its own
    tracker (clone_config — groups are disjoint replica rows).
    """
    seeds = list(seeds)  # normalize once — the sequence is consumed twice
    S = len(seeds)
    if S > SEED_GROUP_MAX_S:
        g = SEED_GROUP_MAX_S
        parts = [train_seed_ensemble(
            dataset, cfg, seeds[i:i + g], chunk_epochs=chunk_epochs,
            mesh=mesh, checkpoint_every=checkpoint_every, resume=resume,
            resume_path=(f"{resume_path}.g{i // g}" if resume_path
                         else None),
            early_stopping=(early_stopping.clone_config()
                            if early_stopping is not None else None))
            for i in range(0, S, g)]
        params = jax.tree_util.tree_map(
            lambda *leaves: jnp.concatenate(leaves, axis=0),
            *[p for p, _ in parts])
        import numpy as np

        # groups may run different epoch counts in THIS process (a resumed
        # run killed at different points; per-group early stopping firing
        # at different checks); left-pad each group's history with NaN to
        # the longest instead of crashing the concat after training
        # finished. On resume (no ES) all groups end at cfg.epoch, so rows
        # align at the tail; with ES the rows are per-group records.
        hists = [np.asarray(h) for _, h in parts]
        L = max(h.shape[1] for h in hists)
        hists = [np.pad(h, ((0, 0), (L - h.shape[1], 0)),
                        constant_values=np.nan)
                 if h.shape[1] < L else h for h in hists]
        return params, np.concatenate(hists, axis=0)
    run_chunk, params_ens, opt_state = build_seed_ensemble_runner(
        dataset, cfg, seeds, mesh=mesh)
    val_fn = None
    if early_stopping is not None:
        vs = _val_split(dataset)
        val_fn = _make_ensemble_val_fn(cfg, get_model(cfg), vs.x, vs.mask)
    params_ens, hist = _run_chunked(
        run_chunk, params_ens, opt_state, cfg.epoch, chunk_epochs,
        resume_path=resume_path, checkpoint_every=checkpoint_every,
        resume=resume, shard_fn=_shard_fn(mesh),
        resume_tag=("seed:" + ",".join(str(s) for s in seeds)
                    + f":batch={cfg.batch_size}"),
        val_fn=val_fn, early_stopping=early_stopping)
    return _take_rows(params_ens, S), hist[:S]


def train_split_ensemble(datasets, cfg: RunConfig, chunk_epochs: int = 200,
                         mesh=None, n_seeds: int = 1, checkpoint_every=None,
                         resume=False, resume_path=None, early_stopping=None):
    """Train one replica per DATA SPLIT of the same model family in a single
    batched program — the reference's `vae_type` digit axis
    (reg_vae1/2/3, serial records in Data/imputation_args.json, reference
    loop: src/experiment_main/imputation.py:21-22).

    Each replica gets its own (x, mask) tables (stacked: splits of one UCI
    table share shapes), its own init, and its own mask_p/model key streams;
    the per-epoch shuffle order is shared across replicas (one batched gather
    instead of S) — replicas hold *different datasets*, so a common
    permutation couples nothing. Returns (ensemble_params, loss_history
    [n_splits, epochs]); unstack leaves with `ensemble_replica` to save
    per-config checkpoints.

    `n_seeds > 1` replicates the whole split axis: the [n_seeds * n_splits]
    replica rows hold seed s of split i at row s * n_splits + i (each row
    its own init + mask/model streams via its replica index), turning the
    grid into an error-barred replication in the SAME single program.
    Returned params/history keep the full seed-major row order.

    RAGGED splits (reference-provided train_index CSVs carry no equal-size
    guarantee, src/utils/loaders.py:322-326): smaller splits wrap-pad to the
    group's max row count (row j of a padded table is the split's row
    j mod n_i — near-uniform oversampling of REAL rows: whenever n_max is
    not a multiple of n_i, the first n_max mod n_i rows get one extra copy
    per epoch), so every replica takes
    ceil(n_max/bsz) full-batch optimizer steps per epoch. This is the same
    convention the engines already use for the last batch of one epoch
    (perm[:pad] wrap below; parallel/train_parallel.py tiles the perm) — no
    zero rows, so no per-family loss-weight plumbing and no gradient-scale
    skew. An equal-shape group is bitwise unchanged, and a replica whose
    split already has n_max rows trains exactly as in an all-equal group
    (pinned by tests/test_parallel.py::test_split_ensemble_ragged_*).
    """
    model = get_model(cfg)
    if n_seeds > 1:
        datasets = list(datasets) * n_seeds
    S = len(datasets)
    obs_dims = {d.train.x.shape[1] for d in datasets}
    if len(obs_dims) > 1:
        raise ValueError(
            "train_split_ensemble needs one obs_dim across the group; got "
            f"{sorted(obs_dims)} — these are different tables, not splits"
        )
    n_max = max(d.train.n for d in datasets)

    def _wrap(a):
        if a.shape[0] == n_max:
            return a
        return jnp.take(a, jnp.arange(n_max) % a.shape[0], axis=0)
    # replica padding: replica rows shard over the mesh's dp axis, so with a
    # mesh the [S, P] matrix is padded to the next multiple of dp by
    # duplicating the last split (the reference suite's split triples hit
    # S=3 on dp=4 meshes); padded rows train as dead weight and are sliced
    # off before returning.
    S_run = S
    if mesh is not None:
        dp = mesh.shape["dp"]
        S_run = -(-S // dp) * dp
    xs = jnp.stack([_wrap(datasets[min(i, S - 1)].train.x)
                    for i in range(S_run)])
    ms = jnp.stack([_wrap(datasets[min(i, S - 1)].train.mask)
                    for i in range(S_run)])
    init_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.PRNGKey(cfg.seed), jnp.arange(S_run))
    params_ens = _stacked_init(model, cfg, xs.shape[2], init_keys)
    run_chunk = _make_ensemble_chunk(cfg, model, xs, ms,
                                     mode="split", S=S_run)
    tx = optax.adam(LEARNING_RATE)
    opt_state = tx.init(params_ens)
    if mesh is not None:
        # state shards by replica row; the stacked (xs, ms) tables are traced
        # constants whose layout XLA chooses to match the sharded program
        params_ens, opt_state = shard_ensemble(params_ens, opt_state, mesh)
    val_fn = None
    if early_stopping is not None:
        # per-replica validation tables: each split's test split (train when
        # absent), wrap-padded to the group's max val rows — the same ragged
        # convention as the training tables above (duplicated rows only
        # reweight a replica's validation MEAN slightly; the check compares
        # a replica against ITSELF across time, so the objective stays
        # consistent between checks)
        vsplits = [_val_split(d) for d in datasets]
        vn_max = max(v.x.shape[0] for v in vsplits)

        def _vwrap(a):
            if a.shape[0] == vn_max:
                return a
            return jnp.take(a, jnp.arange(vn_max) % a.shape[0], axis=0)

        v_xs = jnp.stack([_vwrap(vsplits[min(i, S - 1)].x)
                          for i in range(S_run)])
        v_ms = jnp.stack([_vwrap(vsplits[min(i, S - 1)].mask)
                          for i in range(S_run)])
        val_fn = _make_ensemble_val_fn(cfg, model, v_xs, v_ms,
                                       per_replica_data=True)
    params_ens, hist = _run_chunked(
        run_chunk, params_ens, opt_state, cfg.epoch, chunk_epochs,
        resume_path=resume_path, checkpoint_every=checkpoint_every,
        resume=resume, shard_fn=_shard_fn(mesh),
        resume_tag=(f"split:S={S}:n_seeds={n_seeds}:seed={cfg.seed}"
                    + f":batch={cfg.batch_size}"),
        val_fn=val_fn, early_stopping=early_stopping)
    return _take_rows(params_ens, S), hist[:S]


def train_alpha_ensemble(dataset, cfg: RunConfig, alphas,
                         chunk_epochs: int = 200, seed: int = 0, mesh=None,
                         checkpoint_every=None, resume=False,
                         resume_path=None, early_stopping=None):
    """Train the reference's alpha sweep axis (serial Python loop at
    src/experiment_main/imputation.py:24) as ONE batched program: a replica
    per regularization strength. CLI surface: `imputation.py -ensemble true
    -alphas a,b,c`.

    alpha enters every family's composite loss purely arithmetically
    (e.g. models/gauss.py:177), so a traced per-replica scalar substitutes
    into cfg via cfg.replace. All replicas share the data, shuffling, and
    mask streams — isolating the effect of alpha, which is what the sweep
    studies. With `mesh`, replica rows shard over dp (padded by repeating
    the last alpha; padded rows are sliced off here — same scheme as
    train_split_ensemble). Returns (ensemble_params,
    loss_history [n_alphas, epochs])."""
    model = get_model(cfg)
    alphas = list(alphas)
    S = len(alphas)
    tag = ("alpha:" + ",".join(str(a) for a in alphas)
           + f":seed={seed}:batch={cfg.batch_size}")
    if mesh is not None:
        dp = mesh.shape["dp"]
        alphas = alphas + [alphas[-1]] * ((-S) % dp)
    alphas_v = jnp.asarray(alphas, jnp.float32)
    S_run = len(alphas)
    init_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.PRNGKey(seed), jnp.arange(S_run))
    params_ens = _stacked_init(model, cfg, dataset.obs_dim, init_keys)
    cfg_seeded = cfg.replace(seed=seed)
    run_chunk = _make_ensemble_chunk(
        cfg_seeded, model, dataset.train.x, dataset.train.mask,
        mode="alpha", S=S_run, alphas=alphas_v)
    tx = optax.adam(LEARNING_RATE)
    opt_state = tx.init(params_ens)
    if mesh is not None:
        params_ens, opt_state = shard_ensemble(params_ens, opt_state, mesh)
    val_fn = None
    if early_stopping is not None:
        vs = _val_split(dataset)
        val_fn = _make_ensemble_val_fn(cfg_seeded, model, vs.x, vs.mask,
                                       alphas=alphas_v)
    params_ens, hist = _run_chunked(
        run_chunk, params_ens, opt_state, cfg.epoch, chunk_epochs,
        resume_path=resume_path, checkpoint_every=checkpoint_every,
        resume=resume, shard_fn=_shard_fn(mesh), resume_tag=tag,
        val_fn=val_fn, early_stopping=early_stopping)
    return _take_rows(params_ens, S), hist[:S]


def train_alpha_seed_ensemble(dataset, cfg: RunConfig, alphas, seeds,
                              chunk_epochs: int = 200, mesh=None,
                              checkpoint_every=None, resume=False,
                              resume_path=None, early_stopping=None):
    """Error-barred alpha sweep: the [n_alphas * n_seeds] replica rows hold
    (alpha a, seed s) at row a * n_seeds + i, trained as ONE program — the
    `-alphas` x `-seeds` CLI composition.

    PAIRED design: rows reuse mode='seed' streams keyed by the row's seed,
    so the rows of one seed share init + shuffle + mask draws across all
    alphas (alpha is the ONLY difference within a seed — a paired
    comparison), while different seeds are fully independent replications.
    alphas=[cfg.alpha] therefore reproduces train_seed_ensemble bitwise
    (pinned by tests/test_parallel.py). With `mesh`, rows dp-shard (padded
    by repeating the last row; sliced off here). Returns
    (params_ens [A*S, ...], loss_history [A*S, epochs])."""
    model = get_model(cfg)
    rows = [(float(a), int(sd)) for a in alphas for sd in seeds]
    R = len(rows)
    tag = ("alphaseed:" + ";".join(f"{a}x{sd}" for a, sd in rows)
           + f":batch={cfg.batch_size}")
    if mesh is not None:
        dp = mesh.shape["dp"]
        rows = rows + [rows[-1]] * ((-R) % dp)
    row_alphas = jnp.asarray([a for a, _ in rows], jnp.float32)
    row_seeds = jnp.asarray([sd for _, sd in rows], jnp.uint32)
    init_keys = jax.vmap(jax.random.PRNGKey)(row_seeds)
    params_ens = _stacked_init(model, cfg, dataset.obs_dim, init_keys)
    run_chunk = _make_ensemble_chunk(
        cfg, model, dataset.train.x, dataset.train.mask,
        mode="seed", S=len(rows), seeds=row_seeds, alphas=row_alphas)
    tx = optax.adam(LEARNING_RATE)
    opt_state = tx.init(params_ens)
    if mesh is not None:
        params_ens, opt_state = shard_ensemble(params_ens, opt_state, mesh)
    val_fn = None
    if early_stopping is not None:
        vs = _val_split(dataset)
        val_fn = _make_ensemble_val_fn(cfg, model, vs.x, vs.mask,
                                       alphas=row_alphas)
    params_ens, hist = _run_chunked(
        run_chunk, params_ens, opt_state, cfg.epoch, chunk_epochs,
        resume_path=resume_path, checkpoint_every=checkpoint_every,
        resume=resume, shard_fn=_shard_fn(mesh), resume_tag=tag,
        val_fn=val_fn, early_stopping=early_stopping)
    return _take_rows(params_ens, R), hist[:R]


def train_sweep_ensemble(dataset, cfg: RunConfig, missings=None, alphas=None,
                         seeds=None, chunk_epochs: int = 200, mesh=None,
                         checkpoint_every=None, resume=False,
                         resume_path=None, early_stopping=None):
    """Train the reference's FULL serial sweep product — missing-rate x
    alpha x seed (the two outer serial loops at
    src/experiment_main/imputation.py:23-24, replicated over seeds) — as ONE
    batched program of R = len(missings) * len(alphas) * len(seeds) rows.

    Row order is missing-major: row (mi * A + ai) * S + si holds
    (missings[mi], alphas[ai], seeds[si]). Returns (params_ens, hist, rows)
    with `rows` the [(missing, alpha, seed-or-None)] labels in row order
    (padding rows already sliced off).

    Semantics:
    - p_missingness enters training only through the mask_p draw
      (ops/masks.train_masks -> sub_mask -> mcar_mask, which accepts a
      traced rate), so a per-row scalar substitutes via cfg.replace exactly
      like alpha in the traced loss.
    - seeds=None: all rows share data/shuffle/mask key streams
      (mode='alpha' pairing); with the key shared, the mask_p draws of two
      rates NEST (same uniform draw, different threshold) — the tightest
      possible pairing across the swept knobs.
    - seeds given: the rows of one seed share init + streams across the
      whole (missing, alpha) grid (paired comparison) while different seeds
      are independent replications — mode='seed', the
      train_alpha_seed_ensemble scheme.
    - a singleton `missings` delegates to the pinned alpha/seed ensembles,
      reproducing them bitwise (tests/test_parallel.py).
    With `mesh`, rows dp-shard over the mesh (padded by repeating the last
    row; sliced off here)."""
    missings = [int(m) for m in
                (missings if missings is not None else [cfg.p_missingness])]
    alphas = [float(a) for a in
              (alphas if alphas is not None else [cfg.alpha])]
    rows = [(m, a, None if seeds is None else int(s))
            for m in missings for a in alphas
            for s in (seeds if seeds is not None else [None])]
    if len(missings) == 1:
        cfg1 = cfg.replace(p_missingness=missings[0])
        if seeds is not None:
            params, hist = train_alpha_seed_ensemble(
                dataset, cfg1, alphas, seeds, chunk_epochs=chunk_epochs,
                mesh=mesh, checkpoint_every=checkpoint_every, resume=resume,
                resume_path=resume_path, early_stopping=early_stopping)
        else:
            params, hist = train_alpha_ensemble(
                dataset, cfg1, alphas, chunk_epochs=chunk_epochs,
                seed=cfg.seed, mesh=mesh, checkpoint_every=checkpoint_every,
                resume=resume, resume_path=resume_path,
                early_stopping=early_stopping)
        return params, hist, rows
    model = get_model(cfg)
    run_rows = list(rows)
    R = len(rows)
    if mesh is not None:
        dp = mesh.shape["dp"]
        run_rows = run_rows + [run_rows[-1]] * ((-R) % dp)
    row_miss = jnp.asarray([m for m, _, _ in run_rows], jnp.float32)
    row_alphas = jnp.asarray([a for _, a, _ in run_rows], jnp.float32)
    if seeds is not None:
        row_seeds = jnp.asarray([s for _, _, s in run_rows], jnp.uint32)
        init_keys = jax.vmap(jax.random.PRNGKey)(row_seeds)
        mode = "seed"
    else:
        row_seeds = None
        init_keys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.PRNGKey(cfg.seed), jnp.arange(len(run_rows)))
        mode = "alpha"
    params_ens = _stacked_init(model, cfg, dataset.obs_dim, init_keys)
    run_chunk = _make_ensemble_chunk(
        cfg, model, dataset.train.x, dataset.train.mask,
        mode=mode, S=len(run_rows), seeds=row_seeds, alphas=row_alphas,
        missings=row_miss)
    tx = optax.adam(LEARNING_RATE)
    opt_state = tx.init(params_ens)
    if mesh is not None:
        params_ens, opt_state = shard_ensemble(params_ens, opt_state, mesh)
    val_fn = None
    if early_stopping is not None:
        vs = _val_split(dataset)
        val_fn = _make_ensemble_val_fn(cfg, model, vs.x, vs.mask,
                                       alphas=row_alphas, missings=row_miss)
    params_ens, hist = _run_chunked(
        run_chunk, params_ens, opt_state, cfg.epoch, chunk_epochs,
        resume_path=resume_path, checkpoint_every=checkpoint_every,
        resume=resume, shard_fn=_shard_fn(mesh),
        resume_tag=("sweep:" + ";".join(f"{m},{a},{s}" for m, a, s in rows)
                    + f":batch={cfg.batch_size}"),
        val_fn=val_fn, early_stopping=early_stopping)
    return _take_rows(params_ens, R), hist[:R], rows


def ensemble_replica(params, i):
    """Extract replica i's parameter pytree from a vmapped ensemble."""
    return jax.tree_util.tree_map(lambda leaf: leaf[i], params)
