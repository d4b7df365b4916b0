"""Sharded evaluation agrees with the single-device computation — pinned
across the model families the CLI can route here (gauss, MIWAE's valid_k
path, flow) and for the ragged (n % dp != 0) padding layout.

eval_vae_sharded's aggregation deliberately deviates from the single-chip
engine (whole-split aggregates instead of mean-of-per-batch,
engine/evaluate_sharded.py docstring), so equivalence is pinned against a
LOCAL recomputation with the identical padding layout and key stream — the
same math on one device without the mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.engine.evaluate_sharded import eval_split_sharded
from vae_posterior_consistency_tpu.models import get_model
from vae_posterior_consistency_tpu.ops import masks as masks_ops
from vae_posterior_consistency_tpu.parallel import mesh as meshlib

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _test_arrays(n, D, seed=0):
    x = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, D))
    mask = (jax.random.uniform(jax.random.PRNGKey(seed + 2), (n, D)) < 0.7
            ).astype(jnp.float32)
    return x, mask


def _local_rep(model, cfg, params, x, mask, dp, key, rep, num_samples=None):
    """One rep of eval_split_sharded's math on one device: identical padding
    layout (zero rows, fully-observed masks), identical key stream
    (fold_in(key, rep) before the split), returns the weighted aggregates
    AND the raw per-row stats + weights for pad-exclusion assertions."""
    n, D = x.shape
    pad = math.ceil(n / dp) * dp - n
    xp = jnp.concatenate([x, jnp.zeros((pad, D))]) if pad else x
    mp_ = jnp.concatenate([mask, jnp.ones((pad, D))]) if pad else mask
    w = (jnp.arange(n + pad) < n).astype(jnp.float32)
    k_maskp, k_model = jax.random.split(jax.random.fold_in(key, rep))
    mask_p = masks_ops.sub_mask(k_maskp, mp_, cfg.p_missingness)
    kwargs = {"num_samples": num_samples} if num_samples else {}
    out = jax.jit(
        lambda p, xx, mm, mmp, kk: model.eval_step(p, xx, mm, mmp, kk, cfg,
                                                   **kwargs)
    )(params, xp, mp_, mask_p, k_model)
    hole = (1.0 - mp_) * w[:, None]
    agg = {
        "rmse": float(jnp.sqrt(
            jnp.sum(jnp.square((out["x_imputed"] - xp) * hole))
            / jnp.maximum(jnp.sum(hole), 1.0))),
        "loss": float(jnp.sum(out["row_loss"] * w) / n),
        "negl": float(jnp.sum(out["row_negl"] * w) / n),
        "negl_imp": float(jnp.sum(out["row_negl_imp"] * w) / n),
    }
    return agg, out, w


def _assert_sharded_matches_local(cfg, n=21, D=6, num_samples=None,
                                  n_reps=1, tol=1e-4):
    """Shared body: eval_split_sharded on the 8-device mesh vs the local
    recomputation, averaged over the same reps."""
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0), cfg, D)
    x, mask = _test_arrays(n, D)
    mesh = meshlib.make_mesh(jax.devices()[:8])
    dp = mesh.shape["dp"]
    key = jax.random.PRNGKey(3)

    sharded = eval_split_sharded(params, x, mask, cfg, mesh, key=key,
                                 num_samples=num_samples, n_reps=n_reps)
    locals_ = [_local_rep(model, cfg, params, x, mask, dp, key, m,
                          num_samples=num_samples)[0]
               for m in range(n_reps)]
    for k in ("rmse", "loss", "negl", "negl_imp"):
        want = float(np.mean([lr[k] for lr in locals_]))
        assert abs(sharded[k] - want) < tol, (k, sharded[k], want)
    return sharded


def test_sharded_eval_matches_local():
    """gauss family, ragged n=21 on dp=4 (the original pin)."""
    cfg = RunConfig(vae_type="vanilla_vae1", latent_dim=4, M=1)
    _assert_sharded_matches_local(cfg)


def test_sharded_eval_miwae_matches_local():
    """MIWAE's valid_k importance-sampled eval path (eval_kind='miwae' —
    the CLI reaches it via eval_vae_sharded's num_samples=cfg.valid_k),
    ragged rows. The [rows, K, D] fan-out must shard and aggregate exactly
    as the local computation (VERDICT r4 item 6)."""
    cfg = RunConfig(vae_type="vanilla_MIWAE1", latent_dim=4, M=1, valid_k=5)
    _assert_sharded_matches_local(cfg, num_samples=cfg.valid_k)


def test_sharded_eval_reg_miwae_matches_local():
    """Reg-MIWAE: the p-branch reg composite through the sharded path."""
    cfg = RunConfig(vae_type="reg_MIWAE1", latent_dim=4, M=1, valid_k=4,
                    p_missingness=30)
    _assert_sharded_matches_local(cfg, num_samples=cfg.valid_k)


def test_sharded_eval_flow_matches_local():
    """Flow-posterior family through the sharded path, ragged rows
    (VERDICT r4 item 6). The spline flow's per-row log-probs must be
    row-shardable with no cross-row coupling."""
    cfg = RunConfig(vae_type="reg_flow1", latent_dim=10, hid_dim=32, M=1,
                    p_missingness=30)
    _assert_sharded_matches_local(cfg, tol=2e-4)


def test_sharded_eval_multi_rep_mean():
    """n_reps>1: the one-program lax.map over reps averages exactly the
    per-rep local aggregates (cfg.M parity with eval_vae_sharded)."""
    cfg = RunConfig(vae_type="vanilla_vae1", latent_dim=4, M=3)
    _assert_sharded_matches_local(cfg, n_reps=3)


def test_sharded_eval_pad_rows_are_weighted_out():
    """The ragged-padding row weights are LOAD-BEARING: pad rows produce
    finite nonzero per-row stats (they run through the model like any row),
    and only the w-weighting excludes them — the unweighted mean is
    measurably different (VERDICT r4 item 6's 'asserting the padded-row
    weights')."""
    cfg = RunConfig(vae_type="vanilla_vae1", latent_dim=4, M=1)
    model = get_model(cfg)
    n, D = 21, 6  # dp=4 -> pad 3
    params = model.init(jax.random.PRNGKey(0), cfg, D)
    x, mask = _test_arrays(n, D)
    mesh = meshlib.make_mesh(jax.devices()[:8])
    dp = mesh.shape["dp"]
    assert n % dp != 0
    key = jax.random.PRNGKey(3)

    sharded = eval_split_sharded(params, x, mask, cfg, mesh, key=key)
    agg, out, w = _local_rep(model, cfg, params, x, mask, dp, key, 0)
    pad_rows = np.asarray(out["row_loss"])[np.asarray(w) == 0.0]
    assert pad_rows.size == dp - n % dp
    assert np.isfinite(pad_rows).all() and (pad_rows != 0).all()
    unweighted = float(np.mean(np.asarray(out["row_loss"])))
    assert abs(sharded["loss"] - agg["loss"]) < 1e-4
    assert abs(sharded["loss"] - unweighted) > 1e-3  # weights matter
    # pad rows are fully observed -> zero holes -> RMSE untouched by them
    assert abs(sharded["rmse"] - agg["rmse"]) < 1e-5
