"""EDDI-style information-reward active variable selection.

Rebuild of the reference's sequential feature-acquisition loop
(reference: src/experiment_main/evaluate.py:300-511): starting from an empty
mask, at each step compute the Lindley information reward
R(u) ~ KL(post(x_o u x_u) || post(x_o)) - KL(... with the target revealed) for
every still-hidden candidate feature u, reveal the argmax feature per row, and
record the predictive MSE of the target (last column) after each reveal.

TPU-first redesign: the reference's O(steps x features x M) Python loop nest of
single-row encoder calls becomes, per step, ONE batched computation —
`vmap` over candidate features x MC samples, all rows at once — inside a
`lax.scan` over selection steps (sequential by nature: each reveal feeds the
next step's mask). Mask updates are value changes, not shape changes, so the
whole Repeat x steps loop compiles to a single XLA program.

Reward math parity (reference: evaluate.py:514-634):
  chaini KL = 0.5 * sum( (mean_i-mean)^2/var + var_i/var - 1 - logvar_i + logvar )
with the reference's asymmetric v/var usage kept verbatim; the flow-posterior
"ratio version" uses sum|log q - log q_i| of sampled-z encoder log-probs
(reference: evaluate.py:637-708).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.data.loaders import Dataset, Split
from vae_posterior_consistency_tpu.engine import artifacts, checkpoint
from vae_posterior_consistency_tpu.engine.train import load_trained
from vae_posterior_consistency_tpu.models import get_model
from vae_posterior_consistency_tpu.ops import masks

#: reward placeholder for already-revealed features
#: (reference: evaluate.py:391)
NEG_INF_REWARD = -1e4


def _chaini_kl(mean, logvar, mean_i, logvar_i):
    """The reference's closed-form 'KL' between encoder posteriors before/after
    revealing feature i (evaluate.py:582-584) — including its quirk of dividing
    (mean_i-mean)^2 by exp(logvar) (v in the reference is exp(logvar/2) but the
    square term divides by v... the reference divides by `v`=std once; kept
    verbatim: square(mean_i-mean)/v + var_i/var - 1 - logvar_i + logvar)."""
    v = jnp.exp(logvar / 2.0)
    var = jnp.exp(logvar)
    var_i = jnp.exp(logvar_i)
    return 0.5 * jnp.sum(
        jnp.square(mean_i - mean) / v + var_i / var - 1.0 - logvar_i + logvar,
        axis=-1,
    )


def _flow_reward(model, params, cfg, x_mod, mask, u_onehot, last_onehot, key):
    """ratio-version reward sum|log q - log q_i| (reference: evaluate.py:669-708)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lp = model.encode_sample_logprob(params, x_mod, mask, k1, cfg)
    mask_u = jnp.maximum(mask, u_onehot)
    lp_u = model.encode_sample_logprob(params, x_mod, mask_u, k2, cfg)
    kl_1 = jnp.sum(jnp.abs(lp - lp_u), axis=-1)

    mask_t = jnp.maximum(mask, last_onehot)
    lp_t = model.encode_sample_logprob(params, x_mod, mask_t, k3, cfg)
    mask_tu = jnp.maximum(mask_t, u_onehot)
    lp_tu = model.encode_sample_logprob(params, x_mod, mask_tu, k4, cfg)
    kl_2 = jnp.sum(jnp.abs(lp_t - lp_tu), axis=-1)
    return kl_1 - kl_2


def _impute_samples(model, params, cfg, x, mask, mask_p, key, M):
    """M Monte-Carlo imputations [M, n, D] (reference: evaluate.py:393-414)."""

    def one(k):
        out = model.eval_step(params, x, mask, mask_p, k, cfg)
        return out["x_imputed"]

    return jax.vmap(one)(jax.random.split(key, M))


#: process-level cache of compiled AL episode programs (see
#: engine/train._RUNNER_CACHE for the digit-stripping rationale)
_AL_CACHE: dict = {}


def make_al_runner(cfg: RunConfig, model, obs_dim: int, n_test: int,
                   row_weights=None):
    """Compile the full selection loop for one Repeat:
    (params, x, mask_p, key) -> artifact dict.

    `row_weights` (0/1 per row) excludes dp-padding rows from the scalar
    predictive-MSE mean when the mesh path pads n_test up to a multiple of
    dp (active_learning_func); per-row outputs for padded rows are sliced
    off by the caller. None = all rows count (the single-chip path,
    bit-identical to before)."""
    M = cfg.M
    D = obs_dim
    n_steps = D - 1
    is_flow = cfg.info.flow
    last_onehot = jax.nn.one_hot(D - 1, D)[None, :]
    w_row = None if row_weights is None else jnp.asarray(row_weights,
                                                         jnp.float32)

    def predictive_mse(params, x, mask, key):
        # mean over M samples of F.mse_loss(x_mean[:, -1], x[:, -1])
        # (reference: evaluate.py:364-385)
        im = _impute_samples(model, params, cfg, x, mask,
                             jnp.ones_like(mask), key, M)
        sq = jnp.square(im[:, :, -1] - x[None, :, -1])  # [M, n]
        if w_row is None:
            return jnp.mean(sq)
        return jnp.sum(sq * w_row[None, :]) / (M * jnp.sum(w_row))

    def rewards(params, x, mask, im, key):
        """R [n, D-1]: scan over MC samples, vmap over candidates.

        Gaussian-KL path: two of the reference's four encoder passes per
        (candidate, sample) are candidate-invariant for every reward that
        survives the `hidden` filter below — a candidate u only scores when u
        is hidden under `mask`, and hidden features never reach the encoder
        (inputs are x*mask / mask-weighted pools) — so q(x_mod, mask) ==
        q(x, mask) (also sample-invariant) and q(x_mod2, mask_t) depends on
        the sample but not the candidate. Hoisting them halves the encoder
        FLOPs per selection step; surviving reward values are identical.
        """
        if is_flow:
            def for_candidate(u, k_u):
                u_onehot = jax.nn.one_hot(u, D)[None, :]

                def body(acc, m):
                    x_mod = x * (1 - u_onehot) + im[m] * u_onehot
                    r = _flow_reward(model, params, cfg, x_mod, mask,
                                     u_onehot, last_onehot,
                                     jax.random.fold_in(k_u, m))
                    return acc + r, None

                total, _ = jax.lax.scan(body, jnp.zeros((n_test,)),
                                        jnp.arange(M))
                return total / M

            cand_keys = jax.random.split(key, n_steps)
            R = jax.vmap(for_candidate)(jnp.arange(n_steps), cand_keys)
        else:
            mean0, logvar0 = model.encode_stats(params, x, mask, cfg)
            mask_t = jnp.maximum(mask, last_onehot)

            def per_sample(acc, m):
                # reveal the target from the same imputation sample for the
                # second term (reference: evaluate.py:532-535 mutates
                # temp_x[loc, -1] before chaini_II)
                x_last = x * (1 - last_onehot) + im[m] * last_onehot
                mean_t, logvar_t = model.encode_stats(params, x_last, mask_t,
                                                      cfg)

                def for_candidate(u):
                    u_onehot = jax.nn.one_hot(u, D)[None, :]
                    x_mod = x * (1 - u_onehot) + im[m] * u_onehot
                    mask_u = jnp.maximum(mask, u_onehot)
                    mean_u, logvar_u = model.encode_stats(params, x_mod,
                                                          mask_u, cfg)
                    x_mod2 = x_mod * (1 - last_onehot) + im[m] * last_onehot
                    mask_tu = jnp.maximum(mask_t, u_onehot)
                    mean_tu, logvar_tu = model.encode_stats(params, x_mod2,
                                                            mask_tu, cfg)
                    kl_1 = _chaini_kl(mean0, logvar0, mean_u, logvar_u)
                    kl_2 = _chaini_kl(mean_t, logvar_t, mean_tu, logvar_tu)
                    return kl_1 - kl_2

                R_m = jax.vmap(for_candidate)(jnp.arange(n_steps))  # [D-1, n]
                return acc + R_m, None

            total, _ = jax.lax.scan(per_sample,
                                    jnp.zeros((n_steps, n_test)),
                                    jnp.arange(M))
            R = total / M
        R = R.T  # [n, D-1]
        hidden = mask[:, :n_steps] == 0.0
        return jnp.where(hidden, R, NEG_INF_REWARD)

    @jax.jit
    def run(params, x, mask_p, key):
        mask0 = jnp.zeros((n_test, D))
        k_init, k_loop = jax.random.split(key)
        mse0 = predictive_mse(params, x, mask0, k_init)

        def step(carry, t):
            mask = carry
            k_t = jax.random.fold_in(k_loop, t)
            k_im, k_r, k_mse = jax.random.split(k_t, 3)
            im = _impute_samples(model, params, cfg, x, mask,
                                 jnp.ones_like(mask), k_im, M)
            R = rewards(params, x, mask, im, k_r)  # [n, D-1]
            i_opt = jnp.argmax(R, axis=1)  # [n]
            io = jax.nn.one_hot(i_opt, D)
            new_mask = mask + io
            mse = predictive_mse(params, x, new_mask, k_mse)
            return new_mask, {"R": R, "action": i_opt.astype(jnp.float32),
                              "mse": mse, "im": im}

        _, outs = jax.lax.scan(step, mask0, jnp.arange(n_steps))
        info_curve = jnp.concatenate([jnp.full((1,), mse0), outs["mse"]])
        return {
            # [n, D]: per-step scalar MSE broadcast to rows, as the reference
            # stores it (evaluate.py:386, 459)
            "information_curve": jnp.broadcast_to(info_curve[None, :],
                                                  (n_test, D)),
            "action": outs["action"].T,  # [n, D-1]
            "R_hist": outs["R"],  # [D-1, n, D-1]
            "im": outs["im"],  # [D-1, M, n, D]
        }

    return run



def _pad_rows_for_mesh(x, test_mask, n_test, D, mesh):
    """Mesh even-shard padding shared by the single and ensemble episode
    paths (they must pad identically — the ensemble's "dp-shards exactly
    like the single-seed path" guarantee): pad rows to a multiple of dp,
    with padded rows weighted out of the scalar MSE and sliced off the
    returned artifacts by the caller. Returns (x, test_mask, n_run,
    row_weights)."""
    n_run, row_weights = n_test, None
    if mesh is not None:
        dp = mesh.shape["dp"]
        pad = (-n_test) % dp
        if pad:
            n_run = n_test + pad
            x = jnp.concatenate([x, jnp.zeros((pad, D), x.dtype)])
            test_mask = jnp.concatenate(
                [test_mask, jnp.ones((pad, D), test_mask.dtype)])
            row_weights = (jnp.arange(n_run) < n_test).astype(jnp.float32)
    return x, test_mask, n_run, row_weights


def active_learning_func(dataset_train, test_data, test_mask, cfg: RunConfig,
                         experiments_root: str = "experiments", Repeat: int = 1,
                         params=None, key=None, save: bool = True, mesh=None):
    """Top-level AL driver (reference: evaluate.py:300-511): uses the
    pre-trained checkpoint (the reference's training call is commented out,
    evaluate.py:309-313), runs `Repeat` independent selection episodes, saves
    the 4 artifact tensors.

    With `mesh`, the test rows dp-shard across the mesh: every per-step
    computation (imputations, candidate rewards, argmax reveals) is
    row-independent, so XLA's SPMD partitioner splits the whole compiled
    episode along rows from the INPUT shardings alone — the only collectives
    are the scalar mean in predictive_mse and the final-artifact gather.
    Same math, same keys, same artifacts as single-chip."""
    model = get_model(cfg)
    x = jnp.asarray(test_data, jnp.float32)
    test_mask = jnp.asarray(test_mask, jnp.float32)
    n_test, D = x.shape
    if params is None:
        ds = Dataset(train=Split(x, test_mask, "train"), test=None, obs_dim=D)
        params = load_trained(ds, cfg, experiments_root)
    key = jax.random.PRNGKey(cfg.seed + 3) if key is None else key

    x, test_mask, n_run, row_weights = _pad_rows_for_mesh(
        x, test_mask, n_test, D, mesh)

    # episode programs are shared across split-digit siblings (the digit only
    # selects data files — engine/train._RUNNER_CACHE has the rationale)
    from vae_posterior_consistency_tpu.engine.train import _program_cache_key

    # n_test is part of the key: row_weights (a function of n_test, not just
    # n_run) is BAKED into the compiled closure, so two padded runs sharing
    # n_run but differing in true row count must not share a program
    al_key = _program_cache_key(cfg, n_run, D) + (n_test,)
    run_all = _AL_CACHE.get(al_key)
    if run_all is None:
        runner = make_al_runner(cfg, model, D, n_run,
                                row_weights=row_weights)

        @jax.jit
        def run_all(params, x, mask_ps, run_keys):
            return jax.lax.map(
                lambda mk: runner(params, x, mk[0], mk[1]),
                (mask_ps, run_keys)
            )

        from vae_posterior_consistency_tpu.engine.train import _cache_put

        _cache_put(_AL_CACHE, al_key, run_all)
    # derive every repeat's keys/mask_p up front (same streams as the former
    # per-repeat dispatch loop), then run ALL repeats inside one program —
    # a single host->device dispatch instead of `Repeat` (reference's loop:
    # evaluate.py:387 nesting; VERDICT r1 item 5)
    rkeys = jax.vmap(lambda r: jax.random.fold_in(key, r))(jnp.arange(Repeat))
    kpairs = jax.vmap(jax.random.split)(rkeys)  # [Repeat, 2, 2]
    # mask_p for reg-model forwards (computed but unused by the reward —
    # reference: evaluate.py:351-352)
    mask_ps = jax.vmap(
        lambda k: test_mask * masks.mcar_mask(k, test_mask.shape,
                                              cfg.p_missingness)
    )(kpairs[:, 0])

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
        mask_ps = jax.device_put(mask_ps, NamedSharding(mesh, P(None, "dp",
                                                               None)))
        params = jax.device_put(params, NamedSharding(mesh, P()))

    stacked = run_all(params, x, mask_ps, kpairs[:, 1])
    if n_run != n_test:  # drop the dp-padding rows (row axes per artifact)
        stacked = {
            "information_curve": stacked["information_curve"][:, :n_test],
            "action": stacked["action"][:, :n_test],
            "R_hist": stacked["R_hist"][:, :, :n_test],
            "im": stacked["im"][:, :, :, :n_test],
        }
    if save:
        paths = artifacts.active_learning_paths(cfg, experiments_root)
        for name in ("information_curve", "action", "R_hist", "im"):
            artifacts.save_tensor(jax.device_get(stacked[name]), paths[name])
        artifacts.log_metric(
            cfg, "al_final_mse", stacked["information_curve"][:, 0, -1],
            "test", experiments_root,
        )
    return stacked


def active_learning_ensemble(test_data, test_mask, cfg: RunConfig, params_ens,
                             experiments_root: str = "experiments",
                             Repeat: int = 1, key=None, save: bool = True,
                             mesh=None):
    """[S]-seed-replica AL episodes in ONE compiled program: the single-seed
    episode runner vmapped over stacked checkpoint params (the `-seeds N`
    grid's `.seed{s}` replicas). Every replica sees the SAME episode
    key/mask_p streams — replicas differ only by their trained parameters,
    exactly as S serial active_learning_func runs of the same config would —
    so replica 0 reproduces the plain run (pinned by
    tests/test_active_learning.py::test_al_ensemble_matches_serial). With `mesh`, test
    rows dp-shard exactly as in active_learning_func (the vmap adds a
    replicated [S] axis on params only).

    Saves replica 0's artifacts at the reference paths and extra seeds under
    `.seed{s}` suffixes (the reference CLI has no seed-replication
    equivalent; serial loop: src/experiment_main/evaluate.py:300-511).
    Returns the stacked artifact dict with a leading [S] axis.
    """
    model = get_model(cfg)
    x = jnp.asarray(test_data, jnp.float32)
    test_mask = jnp.asarray(test_mask, jnp.float32)
    n_test, D = x.shape
    S = jax.tree_util.tree_leaves(params_ens)[0].shape[0]
    key = jax.random.PRNGKey(cfg.seed + 3) if key is None else key

    x, test_mask, n_run, row_weights = _pad_rows_for_mesh(
        x, test_mask, n_test, D, mesh)

    from vae_posterior_consistency_tpu.engine.train import (
        _cache_put,
        _program_cache_key,
    )

    al_key = _program_cache_key(cfg, n_run, D) + (n_test, "ens", S)
    run_ens = _AL_CACHE.get(al_key)
    if run_ens is None:
        runner = make_al_runner(cfg, model, D, n_run,
                                row_weights=row_weights)

        @jax.jit
        def run_ens(params_ens, x, mask_ps, run_keys):
            def one_seed(p):
                return jax.lax.map(
                    lambda mk: runner(p, x, mk[0], mk[1]),
                    (mask_ps, run_keys)
                )

            return jax.vmap(one_seed)(params_ens)

        _cache_put(_AL_CACHE, al_key, run_ens)

    # same per-repeat streams as active_learning_func (shared across seeds)
    rkeys = jax.vmap(lambda r: jax.random.fold_in(key, r))(jnp.arange(Repeat))
    kpairs = jax.vmap(jax.random.split)(rkeys)
    mask_ps = jax.vmap(
        lambda k: test_mask * masks.mcar_mask(k, test_mask.shape,
                                              cfg.p_missingness)
    )(kpairs[:, 0])

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
        mask_ps = jax.device_put(mask_ps, NamedSharding(mesh, P(None, "dp",
                                                               None)))
        params_ens = jax.device_put(params_ens, NamedSharding(mesh, P()))

    stacked = run_ens(params_ens, x, mask_ps, kpairs[:, 1])
    if n_run != n_test:  # drop the dp-padding rows (leading [S] + row axes)
        stacked = {
            "information_curve": stacked["information_curve"][:, :, :n_test],
            "action": stacked["action"][:, :, :n_test],
            "R_hist": stacked["R_hist"][:, :, :, :n_test],
            "im": stacked["im"][:, :, :, :, :n_test],
        }
    if save:
        paths = artifacts.active_learning_paths(cfg, experiments_root)
        host = {k: jax.device_get(v) for k, v in stacked.items()}
        for s in range(S):
            for name in ("information_curve", "action", "R_hist", "im"):
                p = paths[name] + checkpoint.seed_suffix(s)
                artifacts.save_tensor(host[name][s], p)
        artifacts.log_metric(
            cfg, "al_final_mse", stacked["information_curve"][0, :, 0, -1],
            "test", experiments_root,
        )
    return stacked
