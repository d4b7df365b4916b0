"""Sharded evaluation agrees with the single-device computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.engine.evaluate_sharded import eval_split_sharded
from vae_posterior_consistency_tpu.models import get_model
from vae_posterior_consistency_tpu.parallel import mesh as meshlib

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_sharded_eval_matches_local():
    cfg = RunConfig(vae_type="vanilla_vae1", latent_dim=4, M=1)
    model = get_model(cfg)
    n, D = 21, 6  # deliberately not divisible by dp=4
    params = model.init(jax.random.PRNGKey(0), cfg, D)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, D))
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (n, D)) < 0.7).astype(
        jnp.float32
    )
    mesh = meshlib.make_mesh(jax.devices()[:8])
    key = jax.random.PRNGKey(3)

    sharded = eval_split_sharded(params, x, mask, cfg, mesh, key=key)

    # local recomputation with the same key stream and padding layout
    from vae_posterior_consistency_tpu.ops import masks as M

    dp = mesh.shape["dp"]
    import math

    pad = math.ceil(n / dp) * dp - n
    xp = jnp.concatenate([x, jnp.zeros((pad, D))])
    mp_ = jnp.concatenate([mask, jnp.ones((pad, D))])
    w = (jnp.arange(n + pad) < n).astype(jnp.float32)
    # rep 0's key: the sharded path folds the rep index before splitting
    # (eval_split_sharded runs all n_reps inside one program)
    k_maskp, k_model = jax.random.split(jax.random.fold_in(key, 0))
    mask_p = M.sub_mask(k_maskp, mp_, cfg.p_missingness)
    out = model.eval_step(params, xp, mp_, mask_p, k_model, cfg)
    hole = (1.0 - mp_) * w[:, None]
    rmse = float(
        jnp.sqrt(jnp.sum(jnp.square((out["x_imputed"] - xp) * hole))
                 / jnp.sum(hole))
    )
    assert abs(sharded["rmse"] - rmse) < 1e-5
    loss = float(jnp.sum(out["row_loss"] * w) / n)
    assert abs(sharded["loss"] - loss) < 1e-4
