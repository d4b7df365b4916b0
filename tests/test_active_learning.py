"""Active-learning engine: shapes, artifact layout, selection sanity
(reference behavior: src/experiment_main/evaluate.py:300-511)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.engine import active_learning as al
from vae_posterior_consistency_tpu.engine import artifacts as art
from vae_posterior_consistency_tpu.models import get_model


@pytest.fixture(scope="module")
def setup():
    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small", M=2,
                    latent_dim=4)
    model = get_model(cfg)
    D, n = 5, 9
    params = model.init(jax.random.PRNGKey(0), cfg, D)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, D))
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (n, D)) < 0.7).astype(
        jnp.float32
    )
    return cfg, params, x, mask


def test_al_shapes_and_artifacts(setup, tmp_path):
    cfg, params, x, mask = setup
    n, D = x.shape
    out = al.active_learning_func(None, x, mask, cfg, Repeat=2, params=params,
                                  experiments_root=str(tmp_path))
    assert out["information_curve"].shape == (2, n, D)
    assert out["action"].shape == (2, n, D - 1)
    assert out["R_hist"].shape == (2, D - 1, n, D - 1)
    assert out["im"].shape == (2, D - 1, cfg.M, n, D)
    for p in art.active_learning_paths(cfg, str(tmp_path)).values():
        assert os.path.exists(p)


def test_al_reveals_each_feature_once(setup, tmp_path):
    cfg, params, x, mask = setup
    n, D = x.shape
    out = al.active_learning_func(None, x, mask, cfg, Repeat=1, params=params,
                                  experiments_root=str(tmp_path), save=False)
    actions = np.asarray(out["action"])[0]  # [n, D-1]
    # per row, the D-1 candidate features are each revealed exactly once
    for row in actions:
        assert sorted(row.astype(int).tolist()) == list(range(D - 1))


def test_al_rewards_masked_for_revealed(setup, tmp_path):
    cfg, params, x, mask = setup
    out = al.active_learning_func(None, x, mask, cfg, Repeat=1, params=params,
                                  experiments_root=str(tmp_path), save=False)
    R = np.asarray(out["R_hist"])[0]  # [D-1, n, D-1]
    # at the last step, all but one candidate per row must be the -1e4 filler
    last = R[-1]
    assert ((last == al.NEG_INF_REWARD).sum(axis=1) == last.shape[1] - 1).all()


def test_al_flow_ratio_reward(tmp_path):
    """Flow-posterior models use the |log q - log q_i| ratio reward
    (reference: evaluate.py:637-708)."""
    cfg = RunConfig(vae_type="vanilla_flow1", data_type="synth_small", M=1,
                    latent_dim=4, hid_dim=16)
    model = get_model(cfg)
    D, n = 5, 6
    params = model.init(jax.random.PRNGKey(0), cfg, D)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, D))
    mask = jnp.ones((n, D))
    out = al.active_learning_func(None, x, mask, cfg, Repeat=1, params=params,
                                  experiments_root=str(tmp_path), save=False)
    assert np.isfinite(np.asarray(out["information_curve"])).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_al_mesh_matches_single_device(tmp_path):
    """dp-sharding the test rows over the mesh must not change the episode:
    rewards/reveals are row-independent and keys identical, so with n
    divisible by dp the artifacts match the single-device run exactly
    (VERDICT r2 item 6)."""
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib

    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small", M=2,
                    latent_dim=4)
    model = get_model(cfg)
    D, n = 5, 8  # n % dp == 0: no padding -> identical RNG draws
    params = model.init(jax.random.PRNGKey(0), cfg, D)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, D))
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (n, D)) < 0.7).astype(
        jnp.float32)
    ref = al.active_learning_func(None, x, mask, cfg, Repeat=2, params=params,
                                  save=False)
    mesh = meshlib.make_mesh(jax.devices()[:8])
    out = al.active_learning_func(None, x, mask, cfg, Repeat=2, params=params,
                                  save=False, mesh=mesh)
    for name in ("information_curve", "action", "R_hist", "im"):
        np.testing.assert_allclose(np.asarray(out[name]),
                                   np.asarray(ref[name]), rtol=1e-4,
                                   atol=1e-5, err_msg=name)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_al_mesh_padded_rows(setup, tmp_path):
    """n=9 on dp=4 exercises the padding path: shapes keep the TRUE row
    count, every row still reveals each feature exactly once, and the info
    curve is finite (padding changes the shape-keyed RNG stream, so values
    are a different — equally valid — MC draw than single-chip)."""
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib

    cfg, params, x, mask = setup
    n, D = x.shape
    mesh = meshlib.make_mesh(jax.devices()[:8])
    out = al.active_learning_func(None, x, mask, cfg, Repeat=1, params=params,
                                  save=False, mesh=mesh)
    assert out["information_curve"].shape == (1, n, D)
    assert out["action"].shape == (1, n, D - 1)
    assert out["R_hist"].shape == (1, D - 1, n, D - 1)
    assert out["im"].shape == (1, D - 1, cfg.M, n, D)
    acts = np.asarray(out["action"])[0]
    for r in range(n):
        assert sorted(acts[r].astype(int)) == list(range(D - 1))
    assert np.isfinite(np.asarray(out["information_curve"])).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_al_mesh_cache_keyed_on_true_rows(setup):
    """Two padded runs sharing n_run but differing in TRUE row count must not
    share a compiled program: row_weights (a function of n_test) is baked
    into the closure, so a stale cache hit would exclude real rows from the
    predictive-MSE means. Regression: the cache key once used only n_run."""
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib

    cfg, params, x, mask = setup
    n, D = x.shape  # n=9 -> pads to 12 on dp=4
    mesh = meshlib.make_mesh(jax.devices()[:8])
    x10 = jnp.concatenate([x, x[:1]])  # n=10 -> also pads to 12
    m10 = jnp.concatenate([mask, mask[:1]])

    al._AL_CACHE.clear()
    ref10 = al.active_learning_func(None, x10, m10, cfg, Repeat=1,
                                    params=params, save=False, mesh=mesh)
    al._AL_CACHE.clear()
    al.active_learning_func(None, x, mask, cfg, Repeat=1, params=params,
                            save=False, mesh=mesh)  # pollute with n_test=9
    out10 = al.active_learning_func(None, x10, m10, cfg, Repeat=1,
                                    params=params, save=False, mesh=mesh)
    assert len(al._AL_CACHE) == 2  # distinct programs per true row count
    np.testing.assert_allclose(np.asarray(out10["information_curve"]),
                               np.asarray(ref10["information_curve"]),
                               rtol=1e-6, atol=1e-7)


def test_al_ensemble_matches_serial(setup, tmp_path):
    """active_learning_ensemble (one vmapped [S]-seed program) must
    reproduce per-seed active_learning_func exactly: same episode
    key/mask_p streams, replicas differ only by parameters. Seed-0
    artifacts land at the reference paths; extra seeds under .seed{s}."""
    cfg, params, x, mask = setup
    model = get_model(cfg)
    D = x.shape[1]
    replicas = [params, model.init(jax.random.PRNGKey(42), cfg, D)]
    params_ens = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *replicas)

    out = al.active_learning_ensemble(x, mask, cfg, params_ens, Repeat=2,
                                      experiments_root=str(tmp_path))
    assert out["information_curve"].shape[:2] == (2, 2)  # [S, Repeat]
    for s, p_s in enumerate(replicas):
        serial = al.active_learning_func(None, x, mask, cfg, Repeat=2,
                                         params=p_s, save=False)
        for name in ("information_curve", "action", "R_hist", "im"):
            np.testing.assert_allclose(
                np.asarray(out[name][s]), np.asarray(serial[name]),
                rtol=1e-5, atol=1e-6, err_msg=f"seed{s}/{name}")
    for p in art.active_learning_paths(cfg, str(tmp_path)).values():
        assert os.path.exists(p) and os.path.exists(f"{p}.seed1")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_al_ensemble_mesh_matches_unsharded(tmp_path):
    """-seeds x -mesh composition: the [S]-seed vmapped episode dp-shards
    its test rows exactly like the single-seed path (params gain only a
    replicated [S] axis); with n % dp == 0 the artifacts match the
    unsharded ensemble run exactly."""
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib

    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small", M=2,
                    latent_dim=4)
    model = get_model(cfg)
    D, n = 5, 8
    replicas = [model.init(jax.random.PRNGKey(s), cfg, D) for s in (0, 42)]
    params_ens = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *replicas)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, D))
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (n, D)) < 0.7).astype(
        jnp.float32)
    ref = al.active_learning_ensemble(x, mask, cfg, params_ens, Repeat=1,
                                      save=False)
    mesh = meshlib.make_mesh(jax.devices()[:8])
    out = al.active_learning_ensemble(x, mask, cfg, params_ens, Repeat=1,
                                      save=False, mesh=mesh)
    for name in ("information_curve", "action", "R_hist", "im"):
        np.testing.assert_allclose(np.asarray(out[name]),
                                   np.asarray(ref[name]), rtol=1e-4,
                                   atol=1e-5, err_msg=name)
