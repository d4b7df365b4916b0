"""End-to-end engine tests: train -> checkpoint -> eval -> artifacts on a tiny
synthetic table (SURVEY.md §4: 'end-to-end smoke runs of each entry point on a
tiny synthetic table')."""

import os

import jax
import numpy as np
import pytest

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.data import loaders
from vae_posterior_consistency_tpu.engine import checkpoint, evaluate, train
from vae_posterior_consistency_tpu.engine import artifacts as art


def _cfg(**kw):
    defaults = dict(
        vae_type="reg_vae1", data_type="synth_small", epoch=5, batch_size=32,
        M=1, missing_rate=30, train_k=2, valid_k=3,
    )
    defaults.update(kw)
    return RunConfig(**defaults)


@pytest.fixture()
def dataset(tiny_dataset):
    return loaders.data_loader(tiny_dataset, "reg_vae1", 30, 32, "synth_small")


def test_train_reduces_loss(dataset, tmp_path):
    cfg = _cfg(epoch=80, vae_type="vanilla_vae1")
    params, hist = train.train(dataset, cfg, experiments_root=str(tmp_path),
                               save=False)
    # ELBO loss decreases substantially over training
    assert hist[-1] < hist[0] * 0.8


def test_early_stopping_stops_and_restores_best(dataset, tmp_path):
    """train(early_stopping=...) must stop before cfg.epoch on a plateau and
    return the best-validation parameters (VERDICT r1 item 3; reference's
    helper is dead code: src/utils/pytorchtools.py:5-58)."""
    from vae_posterior_consistency_tpu.utils.early_stopping import (
        EarlyStopping,
    )

    # delta so large that no later check ever counts as an improvement:
    # the first validation snapshot is "best", patience exhausts after 2
    # more checks, and training must stop at epoch 15 of 200.
    es = EarlyStopping(patience=2, delta=1e9)
    cfg = _cfg(epoch=200, vae_type="vanilla_vae1")
    params, hist = train.train(dataset, cfg, experiments_root=str(tmp_path),
                               save=False, chunk_epochs=5, early_stopping=es)
    assert es.early_stop
    assert len(hist) == 15  # 3 checks x 5-epoch chunks, not 200 epochs
    assert es.best_params is not None
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(es.best_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_early_stopping_improving_run_keeps_training(dataset, tmp_path):
    """A genuinely improving run must NOT stop early, and must return the
    best (= latest) validation params."""
    from vae_posterior_consistency_tpu.utils.early_stopping import (
        EarlyStopping,
    )

    es = EarlyStopping(patience=3)
    cfg = _cfg(epoch=40, vae_type="vanilla_vae1")
    params, hist = train.train(dataset, cfg, experiments_root=str(tmp_path),
                               save=False, chunk_epochs=10, early_stopping=es)
    assert not es.early_stop
    assert len(hist) == 40
    assert np.isfinite(es.best_loss)


def test_checkpoint_roundtrip(dataset, tmp_path):
    cfg = _cfg()
    params, _ = train.train(dataset, cfg, experiments_root=str(tmp_path))
    path = checkpoint.checkpoint_path(cfg, str(tmp_path))
    assert os.path.exists(path)
    reloaded = train.load_trained(dataset, cfg, str(tmp_path))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(reloaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_writes_reference_named_artifacts(dataset, tmp_path):
    cfg = _cfg()
    params, _ = train.train(dataset, cfg, experiments_root=str(tmp_path))
    res = evaluate.eval_vae(dataset, cfg, params=params,
                            experiments_root=str(tmp_path))
    assert set(res) == {"train", "test"}
    for stage in ("train", "test"):
        paths = art.eval_vae_paths(cfg, stage, str(tmp_path))
        for p in paths.values():
            assert os.path.exists(p), p
        import torch

        val = torch.load(paths["rmse"], weights_only=False)
        assert float(val) == pytest.approx(res[stage]["rmse"], rel=1e-5)
    # structured metrics log written too
    assert os.path.exists(
        os.path.join(str(tmp_path), cfg.experiment_type, cfg.data_type,
                     "metrics.jsonl")
    )


def test_eval_miwae_routing(tiny_dataset, tmp_path):
    cfg = _cfg(vae_type="vanilla_MIWAE1", valid_k=4)
    # load under the MIWAE vae_type (its digit selects the split files), so
    # the loader routing this test is named for actually runs
    ds = loaders.data_loader(tiny_dataset, "vanilla_MIWAE1", 30, 32,
                             "synth_small")
    params, _ = train.train(ds, cfg, experiments_root=str(tmp_path))
    evaluate.eval_vae(ds, cfg, params=params, experiments_root=str(tmp_path))
    paths = art.eval_miwae_paths(cfg, "test", str(tmp_path))
    assert os.path.exists(paths["rmse"])


def test_mnar_pipeline(tiny_dataset, tmp_path):
    cfg = _cfg(vae_type="vanilla_notMIWAE1", epoch=3, train_k=2,
               valid_k=3, p_missingness=50)
    ds = loaders.data_loader_mnar(tiny_dataset, cfg.vae_type, cfg.missing_rate,
                                  cfg.batch_size, "synth_small")
    params, _ = train.train(ds, cfg, experiments_root=str(tmp_path))
    rmse = evaluate.eval_vae_mnar(ds.train.x, ds.train.mask, cfg, params=params,
                                  experiments_root=str(tmp_path))
    assert np.isfinite(rmse) and rmse > 0
    assert os.path.exists(art.eval_mnar_paths(cfg, str(tmp_path))["rmse"])


def test_mnar_ensemble_eval_matches_serial(tiny_dataset, tmp_path):
    """eval_vae_mnar_ensemble (one vmapped program for all seed replicas)
    must reproduce per-replica serial eval_vae_mnar exactly: same key
    stream, same math, replicas differ only by parameters."""
    from vae_posterior_consistency_tpu.parallel import sweep

    cfg = _cfg(vae_type="vanilla_notMIWAE1", epoch=3, train_k=2,
               valid_k=3, p_missingness=50)
    ds = loaders.data_loader_mnar(tiny_dataset, cfg.vae_type, cfg.missing_rate,
                                  cfg.batch_size, "synth_small")
    params_ens, _ = sweep.train_seed_ensemble(ds, cfg, seeds=[0, 1],
                                              chunk_epochs=3)
    rmses = evaluate.eval_vae_mnar_ensemble(
        ds.train.x, ds.train.mask, cfg, params_ens,
        experiments_root=str(tmp_path))
    assert rmses.shape == (2,) and np.isfinite(rmses).all()
    for s in range(2):
        p_s = sweep.ensemble_replica(params_ens, s)
        serial = evaluate.eval_vae_mnar(ds.train.x, ds.train.mask, cfg,
                                        params=p_s, save=False)
        np.testing.assert_allclose(rmses[s], serial, rtol=1e-5, atol=1e-6)
    # seed-0 artifact lands at the reference path
    assert os.path.exists(art.eval_mnar_paths(cfg, str(tmp_path))["rmse"])


def test_checkpoint_name_mangling_parity():
    """Character-for-character parity with the reference's checkpoint naming
    (src/experiment_main/train.py:120-131)."""
    cfg = RunConfig(vae_type="reg_vae2_mask_augm", alpha=1.0, p_missingness=30,
                    reg_type="kl_reg", missing_rate=30, data_type="wine")
    p = checkpoint.checkpoint_path(cfg, "experiments")
    assert p == (
        "experiments/UCI_experiments_consistency_missingness/wine/checkpoints/"
        "reg_vae/checkpoint_reg_vae2_mask_augm_1.0_30_kl_reg_30_"
        "missing_rate_full_reg_test.pt"
    )
    cfg_v = RunConfig(vae_type="vanilla_notMIWAE1", missing_rate=50,
                      data_type="wine")
    p_v = checkpoint.checkpoint_path(cfg_v, "experiments")
    assert p_v == (
        "experiments/UCI_experiments_consistency_missingness/wine/checkpoints/"
        "vanilla_notMIWAE/checkpoint_vanilla_notMIWAE1_50_missing_rate_test.pt"
    )


def test_artifact_name_mangling_parity():
    cfg = RunConfig(vae_type="reg_vae1", alpha=1.0, p_missingness=30,
                    reg_type="kl_reg", missing_rate=30, data_type="wine")
    paths = art.eval_vae_paths(cfg, "test", "experiments")
    assert paths["rmse"].endswith(
        "rest/reg_vae/test_reg_vae1_rmse_1.0_30_kl_reg_30_missing_rate_"
        "full_reg_test.pt"
    )
    assert paths["negll"].endswith(
        "test_reg_vae1_negative_llh_q_1.0_30_kl_reg_30_missing_rate_"
        "full_reg_test.pt"
    )
    mnar = art.eval_mnar_paths(
        RunConfig(vae_type="reg_notMIWAE1", alpha=1.0, p_missingness=50,
                  reg_type="kl_reg", data_type="wine"),
        "experiments",
    )
    assert mnar["rmse"].endswith(
        "rest/reg_notMIWAE/reg_notMIWAE1_rmse_1.0_50_kl_reg_full_reg_"
        "large_batch_v2_test.pt"
    )


def test_program_cache_shares_split_siblings(dataset):
    """Split-digit siblings (reg_vae1/2/3) must reuse ONE compiled chunk
    runner and ONE eval program; any traced-config change must miss."""
    from vae_posterior_consistency_tpu.engine import evaluate as ev
    from vae_posterior_consistency_tpu.engine import train as tr
    from vae_posterior_consistency_tpu.models import get_model

    cfg1 = RunConfig(vae_type="reg_vae1", epoch=2, batch_size=16,
                     latent_dim=4, M=1)
    x, m = dataset.train.x, dataset.train.mask
    r1 = tr._build_epoch_runner(cfg1, x, m)
    r2 = tr._build_epoch_runner(cfg1.replace(vae_type="reg_vae2"), x, m)
    assert r1.run_chunk is r2.run_chunk  # same compiled program
    r3 = tr._build_epoch_runner(cfg1.replace(alpha=2.0), x, m)
    assert r3.run_chunk is not r1.run_chunk  # alpha is traced -> new program

    model = get_model(cfg1)
    n = x.shape[0]
    e1 = ev._split_eval_fn(cfg1, model, n, None)
    e2 = ev._split_eval_fn(cfg1.replace(vae_type="reg_vae3"), model, n, None)
    assert e1 is e2
    e3 = ev._split_eval_fn(cfg1, model, n - 1, None)  # n is baked -> miss
    assert e3 is not e1


def test_early_stopping_objective_is_epoch_fixed(dataset):
    """The validation objective must not drift across checks for
    epoch-dependent losses (ml_reg scales its reg term by epoch/2800 —
    ADVICE r2 finding #1): _build_val_fn bakes epoch = cfg.epoch, so the
    same params give the same loss no matter when the check runs, while
    different cfg.epoch values change the (fixed) objective."""
    from vae_posterior_consistency_tpu.engine.train import (
        _build_epoch_runner,
        _build_val_fn,
    )
    from vae_posterior_consistency_tpu.models import get_model

    cfg = _cfg(vae_type="reg_vae1", reg_type="ml_reg", epoch=500)
    model = get_model(cfg)
    sp = dataset.train
    params = model.init(jax.random.PRNGKey(0), cfg, dataset.obs_dim)
    runner = _build_epoch_runner(cfg, sp.x, sp.mask, model,
                                 template_params=params)
    key = jax.random.PRNGKey(3)

    val_fn = _build_val_fn(cfg, model, sp.x, sp.mask)
    v1 = float(val_fn(params, key))
    v2 = float(val_fn(params, key))  # a later check: identical objective
    assert v1 == v2

    # the objective genuinely depends on the (fixed) epoch: a different
    # cfg.epoch yields a different value for the same params
    cfg2 = cfg.replace(epoch=2500)
    val_fn2 = _build_val_fn(cfg2, model, sp.x, sp.mask)
    assert float(val_fn2(params, key)) != v1


def test_runner_cache_bypassed_for_custom_model(dataset):
    """A caller passing a model that differs from get_model(cfg) must not
    hit (or poison) the shared program cache (ADVICE r2 finding #2)."""
    import dataclasses

    from vae_posterior_consistency_tpu.engine.train import (
        _RUNNER_CACHE,
        _build_epoch_runner,
        _program_cache_key,
    )
    from vae_posterior_consistency_tpu.models import get_model

    cfg = _cfg(vae_type="vanilla_vae1")
    sp = dataset.train
    r1 = _build_epoch_runner(cfg, sp.x, sp.mask)
    key = _program_cache_key(cfg, sp.x.shape[0], sp.x.shape[1])
    assert key in _RUNNER_CACHE
    cached_entry = _RUNNER_CACHE[key]

    other = dataclasses.replace(get_model(cfg), name="custom-variant")
    r2 = _build_epoch_runner(cfg, sp.x, sp.mask, model=other)
    # cache neither consulted (r2 got its own program) nor poisoned
    assert _RUNNER_CACHE[key] is cached_entry
    assert r2.run_chunk is not r1.run_chunk


def test_eval_task_grouping_is_value_invariant(dataset):
    """The grouped-vmap evaluator (round 4: the M x steps (rep, batch)
    tasks run G per dispatch) must be bit-identical for EVERY group size —
    including ones that split the task list unevenly (pad tasks recompute
    the last task, n_tasks-1, and are sliced off). Pins the restructure's
    exactness claim
    beyond the goldens' single default shape."""
    import jax.numpy as jnp

    from vae_posterior_consistency_tpu.engine.evaluate import (
        _split_eval_fns,
    )
    from vae_posterior_consistency_tpu.models import get_model

    cfg = _cfg(vae_type="vanilla_vae1", batch_size=16, M=3)
    model = get_model(cfg)
    sp = dataset.train
    params = model.init(jax.random.PRNGKey(0), cfg, sp.x.shape[1])
    keys = jax.vmap(lambda m: jax.random.fold_in(jax.random.PRNGKey(7), m))(
        jnp.arange(cfg.M))

    # one-group baseline (default budget covers everything) vs tiny budgets
    # that force multi-group execution with a ragged final group
    base_fn, _ = _split_eval_fns(cfg, model, sp.n, None)
    base = jax.device_get(base_fn(params, sp.x, sp.mask, keys))
    for budget in (cfg.batch_size, 2 * cfg.batch_size):
        fn, _ = _split_eval_fns(cfg, model, sp.n, None, row_budget=budget)
        out = jax.device_get(fn(params, sp.x, sp.mask, keys))
        for k in base:
            np.testing.assert_array_equal(np.asarray(out[k]),
                                          np.asarray(base[k]),
                                          err_msg=f"{k} @ budget {budget}")
