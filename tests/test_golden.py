"""Golden-value regression tests: fixed-PRNG few-step training trajectories
(SURVEY.md §4: 'golden-value tests of a few training steps with fixed PRNG
keys'). Values are pinned on the CPU backend (conftest forces it); loosened
tolerances absorb XLA version drift — a failure here means the *math* changed.

To re-pin after an intentional semantics change:
    python3 -m pytest tests/test_golden.py --capture=no  (prints actuals)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.models import get_model


def _two_step_losses(vae_type, **cfg_kw):
    """Deterministic 2-step loss pair under fixed keys."""
    import optax

    cfg = RunConfig(vae_type=vae_type, latent_dim=4, train_k=3, **cfg_kw)
    model = get_model(cfg)
    obs_dim, B = 6, 16
    params = model.init(jax.random.PRNGKey(11), cfg, obs_dim)
    x = jax.random.uniform(jax.random.PRNGKey(12), (B, obs_dim))
    mask = (jax.random.uniform(jax.random.PRNGKey(13), (B, obs_dim)) < 0.7
            ).astype(jnp.float32)
    mask_p = mask * (
        jax.random.uniform(jax.random.PRNGKey(14), (B, obs_dim)) < 0.7
    ).astype(jnp.float32)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def steps(params, opt):
        losses = []
        for i in range(2):
            loss, g = jax.value_and_grad(
                lambda p: model.train_loss(
                    p, x, mask, mask_p, jax.random.PRNGKey(20 + i),
                    jnp.float32(i + 1), cfg,
                )[0]
            )(params)
            u, opt = tx.update(g, opt, params)
            params = optax.apply_updates(params, u)
            losses.append(loss)
        return jnp.stack(losses)

    return np.asarray(steps(params, opt))


#: name -> (vae_type, cfg overrides, pinned 2-step losses). Covers all 5
#: families (VERDICT r1 item 7: flow + EDDI were unpinned) and every
#: non-default variant (item 4: ml_reg, author, both_s, sampled_mask).
GOLDEN = {
    "reg_vae1": ("reg_vae1", {}, [13.596199, 13.687790]),
    # near vanilla_vae1 by construction: the ml term enters scaled by
    # epoch/2800 (reference: VAE.py:133-138), ~4e-4 at epochs 1-2
    "reg_vae1_ml_reg": ("reg_vae1", {"reg_type": "ml_reg"},
                        [8.340076, 8.197827]),
    "vanilla_vae1": ("vanilla_vae1", {}, [8.337935, 8.193361]),
    "vanilla_EDDI1": ("vanilla_EDDI1", {}, [8.306475, 8.161387]),
    "vanilla_flow1": ("vanilla_flow1", {}, [633.704041, 636.735046]),
    "vanilla_MIWAE1": ("vanilla_MIWAE1", {}, [2.183942, 2.160026]),
    "vanilla_notMIWAE1": ("vanilla_notMIWAE1", {}, [11.296661, 11.138895]),
    "vanilla_notMIWAE1_author": (
        "vanilla_notMIWAE1", {"not_miwae_type": "author"},
        [12.010184, 11.547853]),
    "reg_notMIWAE1_v2": ("reg_notMIWAE1", {}, [11.157572, 10.926561]),
    "reg_notMIWAE1_both_s": (
        "reg_notMIWAE1", {"reg_notmiwae_variant": "both_s"},
        [15.900917, 15.661293]),
    "reg_notMIWAE1_sampled_mask": (
        "reg_notMIWAE1", {"reg_notmiwae_variant": "sampled_mask"},
        [14.520390, 14.400662]),
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_two_step_losses(name):
    vae_type, cfg_kw, want = GOLDEN[name]
    got = _two_step_losses(vae_type, **cfg_kw)
    print(f"{name}: {got.tolist()}")  # aid re-pinning
    np.testing.assert_allclose(got, want, rtol=2e-4)
    # and training moved the loss
    assert got[1] != got[0]
