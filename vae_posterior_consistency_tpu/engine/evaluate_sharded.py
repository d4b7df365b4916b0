"""Data-parallel sharded evaluation over a device mesh.

For large splits (MNIST-scale and beyond) evaluation rows shard over the `dp`
mesh axis: each device computes its rows' per-row statistics and imputation
(the model's eval_step is row-wise), XLA reduces the aggregates over ICI.
Single-chip callers keep using engine/evaluate.py; this path is the mesh
equivalent of the reference's serial evaluation loops
(reference: src/experiment_main/evaluate.py:136-245).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.models import get_model
from vae_posterior_consistency_tpu.ops import masks


def eval_split_sharded(params, x, mask, cfg: RunConfig, mesh, key=None,
                       num_samples=None, n_reps: int = 1):
    """Evaluation over all rows, dp-sharded; `n_reps` Monte-Carlo reps (fresh
    mask_p each) run inside ONE compiled program (lax.map — single dispatch,
    memory bounded to one rep).

    Returns global aggregates averaged over reps: {rmse, loss, negl,
    negl_imp} where rmse is the global missing-cell RMSE and the others are
    row means.
    """
    model = get_model(cfg)
    key = jax.random.PRNGKey(cfg.seed + 7) if key is None else key
    dp = mesh.shape["dp"]
    n = x.shape[0]
    pad = (math.ceil(n / dp) * dp) - n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
        # padded rows: fully observed -> no missing cells, weight 0
        mask = jnp.concatenate([mask, jnp.ones((pad, mask.shape[1]), mask.dtype)])
    w = (jnp.arange(x.shape[0]) < n).astype(jnp.float32)

    b_shard = NamedSharding(mesh, P("dp", None))
    r_shard = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def run(params, x, mask, w, key):
        def one_rep(k):
            k_maskp, k_model = jax.random.split(k)
            mask_p = masks.sub_mask(k_maskp, mask, cfg.p_missingness)
            out = model.eval_step(
                params, x, mask, mask_p, k_model, cfg,
                **({"num_samples": num_samples} if num_samples else {}),
            )
            hole = (1.0 - mask) * w[:, None]
            se = jnp.sum(jnp.square((out["x_imputed"] - x) * hole))
            cnt = jnp.sum(w)
            return {
                "rmse": jnp.sqrt(se / jnp.maximum(jnp.sum(hole), 1.0)),
                "loss": jnp.sum(out["row_loss"] * w) / cnt,
                "negl": jnp.sum(out["row_negl"] * w) / cnt,
                "negl_imp": jnp.sum(out["row_negl_imp"] * w) / cnt,
            }

        keys = jax.vmap(lambda m: jax.random.fold_in(key, m))(
            jnp.arange(n_reps)
        )
        per_rep = jax.lax.map(one_rep, keys)
        return jax.tree_util.tree_map(jnp.mean, per_rep)

    x = jax.device_put(x, b_shard)
    mask = jax.device_put(mask, b_shard)
    w = jax.device_put(w, r_shard)
    params = jax.device_put(params, repl)
    return {k: float(v) for k, v in run(params, x, mask, w, key).items()}


def eval_vae_sharded(dataset, cfg: RunConfig, mesh, params=None,
                     experiments_root: str = "experiments", key=None,
                     save: bool = True):
    """Mesh-path equivalent of engine/evaluate.eval_vae: cfg.M Monte-Carlo
    reps per split (fresh mask_p each, reference: evaluate.py:164-174),
    rows dp-sharded, same reference-named artifacts written.

    Aggregation deviation (documented): the single-chip engine reproduces the
    reference's mean-of-per-batch statistics; here each rep evaluates the
    whole split at once (no batching), so metrics are whole-split aggregates
    — statistically equivalent, and exact for the row-mean metrics when the
    split divides evenly.
    """
    from vae_posterior_consistency_tpu.engine.evaluate import (
        _save_eval_artifacts,
    )
    from vae_posterior_consistency_tpu.engine.train import load_trained

    model = get_model(cfg)
    if params is None:
        params = load_trained(dataset, cfg, experiments_root)
    key = jax.random.PRNGKey(cfg.seed + 1) if key is None else key
    num_samples = cfg.valid_k if model.eval_kind == "miwae" else None

    results = {}
    for split in (dataset.train, dataset.test):
        if split is None:
            continue
        agg = eval_split_sharded(
            params, split.x, split.mask, cfg, mesh, key=key,
            num_samples=num_samples, n_reps=cfg.M,
        )
        results[split.stage] = agg
        if save:
            # one artifact contract for the single-chip and mesh paths
            _save_eval_artifacts(cfg, model, split.stage, agg,
                                 experiments_root)
    return results
