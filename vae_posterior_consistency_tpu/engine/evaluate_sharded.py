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
                       num_samples=None):
    """One evaluation pass over all rows, dp-sharded.

    Returns global aggregates: {rmse, loss, negl, negl_imp} where rmse is the
    global missing-cell RMSE and the others are row means.
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
        k_maskp, k_model = jax.random.split(key)
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

    x = jax.device_put(x, b_shard)
    mask = jax.device_put(mask, b_shard)
    w = jax.device_put(w, r_shard)
    params = jax.device_put(params, repl)
    return {k: float(v) for k, v in run(params, x, mask, w, key).items()}
