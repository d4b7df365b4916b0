"""Mesh/sharding validation on the 8-virtual-CPU-device mesh (SURVEY.md §4:
'TPU-specific tests run on CPU via xla_force_host_platform_device_count')."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.data.loaders import Dataset, Split
from vae_posterior_consistency_tpu.models import get_model
from vae_posterior_consistency_tpu.parallel import mesh as meshlib
from vae_posterior_consistency_tpu.parallel import sweep
from vae_posterior_consistency_tpu.parallel.train_parallel import (
    dryrun_train_step,
    make_parallel_train_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_factor_devices():
    assert meshlib.factor_devices(8) == (4, 2)
    assert meshlib.factor_devices(2) == (2, 1)
    assert meshlib.factor_devices(1) == (1, 1)


def test_dryrun_full_mesh():
    mesh = meshlib.make_mesh(jax.devices()[:8])
    cfg = RunConfig(vae_type="reg_vae1", hid_dim=256, latent_dim=4)
    loss = dryrun_train_step(cfg, mesh, obs_dim=6, batch_per_device=2)
    assert np.isfinite(loss)


def test_sharded_step_matches_single_device():
    """The dp/tp-sharded step must compute the same loss and updated params as
    the unsharded step (same key, same data)."""
    from vae_posterior_consistency_tpu.engine.train import make_train_step

    cfg = RunConfig(vae_type="reg_vae1", latent_dim=4)
    model = get_model(cfg)
    obs_dim, B = 6, 16
    key = jax.random.PRNGKey(0)
    params = model.init(key, cfg, obs_dim)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, obs_dim))
    m = (jax.random.uniform(jax.random.PRNGKey(2), (B, obs_dim)) < 0.7).astype(
        jnp.float32
    )
    step_key = jax.random.PRNGKey(3)

    step_fn, tx = make_train_step(cfg, model)
    p1, _, loss1 = jax.jit(step_fn)(params, tx.init(params), x, m, step_key,
                                    jnp.float32(1.0))

    mesh = meshlib.make_mesh(jax.devices()[:8])
    sharded_step, shard_inputs, tx2 = make_parallel_train_step(
        cfg, mesh, model, params
    )
    opt2 = tx2.init(params)
    sp, so, sx, sm = shard_inputs(params, opt2, x, m)
    p2, _, loss2 = sharded_step(sp, so, sx, sm, step_key, jnp.float32(1.0))

    assert abs(float(loss1) - float(loss2)) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_seed_ensemble_sweep(tiny_dataset):
    from vae_posterior_consistency_tpu.data import loaders

    ds = loaders.data_loader(tiny_dataset, "vanilla_vae1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small", epoch=6,
                    batch_size=32, latent_dim=4)
    params, hist = sweep.train_seed_ensemble(ds, cfg, seeds=[0, 1, 2])
    assert hist.shape == (3, 6)
    assert np.isfinite(hist).all()
    # different seeds -> different trajectories
    assert not np.allclose(hist[0], hist[1])
    # ensemble leaves carry the seed axis
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.shape[0] == 3


def test_alpha_ensemble_sweep(tiny_dataset):
    """The alpha sweep axis trains as one vmapped program; alpha enters the
    traced loss (reference's serial loop: imputation.py:24)."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel.sweep import (
        train_alpha_ensemble,
    )

    ds = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", epoch=20,
                    batch_size=16, p_missingness=30, latent_dim=4)
    params, hist = train_alpha_ensemble(ds, cfg, [0.0, 5.0],
                                        chunk_epochs=10)
    assert hist.shape == (2, 20)
    assert np.all(np.isfinite(hist))
    # the two regularization strengths must actually train differently
    assert abs(hist[0, -1] - hist[1, -1]) > 1e-3
    leaves = jax.tree_util.tree_leaves(params)
    assert all(leaf.shape[0] == 2 for leaf in leaves)


def test_train_sharded_tiny_dataset():
    """n < dp: the padded epoch needs more rows than one permutation holds;
    the tiled pad must keep the loop traceable and finite (ADVICE r1)."""
    from vae_posterior_consistency_tpu.parallel.train_parallel import (
        train_sharded,
    )

    n, obs_dim = 3, 5  # 3 rows on a dp=4 mesh
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (n, obs_dim))
    m = jnp.ones((n, obs_dim), jnp.float32)
    ds = Dataset(train=Split(x, m, "train"), test=None, obs_dim=obs_dim)
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", epoch=2,
                    batch_size=64, latent_dim=2)
    mesh = meshlib.make_mesh(jax.devices()[:8])
    params, hist = train_sharded(ds, cfg, mesh, chunk_epochs=2)
    assert hist.shape == (2,)
    assert np.all(np.isfinite(hist))


def test_train_sharded_full_loop(tiny_dataset):
    """The full multi-chip training loop runs on the virtual mesh and learns
    (loss decreases); batches shard over dp."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib
    from vae_posterior_consistency_tpu.parallel.train_parallel import (
        train_sharded,
    )

    ds = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", epoch=40,
                    batch_size=32, latent_dim=4, p_missingness=30)
    mesh = meshlib.make_mesh(jax.devices()[:8])
    params, hist = train_sharded(ds, cfg, mesh, chunk_epochs=20)
    assert hist.shape == (40,)
    assert np.all(np.isfinite(hist))
    assert hist[-1] < hist[0]  # it trains
    # params came back in the mesh layout
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.sharding.mesh.shape["dp"] == mesh.shape["dp"]


def test_cli_mesh_routing(tiny_dataset, tmp_path):
    """The MCAR entry point with -mesh 4,2 must train+eval through the
    sharded engines from the CLI and write the same reference-named
    checkpoint/artifacts (VERDICT r1 item 1; the reference assumes one
    device: src/experiment_main/imputation.py:16)."""
    import os
    import subprocess

    from tests.cli_harness import cli_env, entry, grid_record, make_sandbox

    make_sandbox(tmp_path, tiny_dataset, [grid_record(
        vae_type="reg_vae1", data_type="synth_small", epoch=4,
        batch_size=16, M=2, train_k=2, valid_k=3, latent_dim=4,
        missing_rate=30, hid_dim=64)])
    out = subprocess.run(
        ["python3", entry("imputation.py"), "-mesh", "4,2"],
        cwd=tmp_path,
        env=cli_env(XLA_FLAGS="--xla_force_host_platform_device_count=8"),
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "mesh={'dp': 4, 'tp': 2}" in out.stdout
    assert "[test]" in out.stdout

    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.engine import artifacts as art
    from vae_posterior_consistency_tpu.engine import checkpoint

    cfg = RunConfig(vae_type="reg_vae1", data_type="synth_small",
                    missing_rate=30, alpha=1.0, p_missingness=30)
    root = str(tmp_path / "experiments")
    assert os.path.exists(checkpoint.checkpoint_path(cfg, root))
    for stage in ("train", "test"):
        for p in art.eval_vae_paths(cfg, stage, root).values():
            assert os.path.exists(p), p


@pytest.mark.skipif(not __import__("os").environ.get("VPC_MULTIHOST_TEST"),
                    reason="opt-in: set VPC_MULTIHOST_TEST=1 (spawns 2 "
                           "jax.distributed processes)")
def test_multihost_two_process_smoke():
    """2-process jax.distributed handshake + global mesh + cross-process
    reduction (VERDICT r1 item 9). Always runnable directly:
    `python3 tools/multihost_smoke.py`."""
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        ["python3", os.path.join(repo, "tools", "multihost_smoke.py")],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout


def test_train_split_ensemble(tiny_dataset):
    """The vae_type split-digit axis trains as one vmapped program
    (VERDICT r1 item 2): per-replica datasets, shared shuffle order,
    independent inits/keys."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel.sweep import (
        ensemble_replica,
        train_split_ensemble,
    )

    cfgs = [RunConfig(vae_type=f"reg_vae{i}", data_type="synth_small",
                      epoch=20, batch_size=32, latent_dim=4,
                      p_missingness=30) for i in "123"]
    datasets = [loaders.data_loader(tiny_dataset, c.vae_type, 30, 32,
                                    "synth_small") for c in cfgs]
    params, hist = train_split_ensemble(datasets, cfgs[0], chunk_epochs=10)
    assert hist.shape == (3, 20)
    assert np.all(np.isfinite(hist))
    assert (hist[:, -1] < hist[:, 0]).all()  # every replica trains
    # different splits + inits -> different trajectories
    assert not np.allclose(hist[0], hist[1])
    p0 = ensemble_replica(params, 0)
    leaf = jax.tree_util.tree_leaves(p0)[0]
    assert leaf.ndim == jax.tree_util.tree_leaves(params)[0].ndim - 1


def test_cli_ensemble_suite(tiny_dataset, tmp_path):
    """`imputation.py -ensemble true` trains split triples as ensembles from
    the CLI and writes every config's reference-named checkpoint+artifacts."""
    import os
    import subprocess

    from tests.cli_harness import cli_env, entry, grid_record, make_sandbox

    base = dict(data_type="synth_small", epoch=4, batch_size=16, M=1,
                train_k=2, valid_k=3, latent_dim=4, missing_rate=30,
                hid_dim=32)
    make_sandbox(tmp_path, tiny_dataset,
                 [grid_record(vae_type=f"{fam}{i}", **base)
                  for fam in ("reg_vae", "vanilla_vae") for i in "123"])
    out = subprocess.run(
        ["python3", entry("imputation.py"), "-ensemble", "true"],
        cwd=tmp_path, env=cli_env(), capture_output=True, text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert out.stdout.count("=== ensemble train") == 2  # 2 family groups

    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.engine import artifacts as art
    from vae_posterior_consistency_tpu.engine import checkpoint

    root = str(tmp_path / "experiments")
    for fam in ("reg_vae", "vanilla_vae"):
        for i in "123":
            cfg = RunConfig(vae_type=f"{fam}{i}", data_type="synth_small",
                            missing_rate=30, alpha=1.0, p_missingness=30)
            assert os.path.exists(checkpoint.checkpoint_path(cfg, root))
            assert os.path.exists(
                art.eval_vae_paths(cfg, "test", root)["rmse"])


def test_seed_ensemble_sharded_matches_unsharded(tiny_dataset):
    """Sharding the ensemble's [S, P] rows over the mesh's dp axis must not
    change the training math: replicas are independent, so the dp-sharded
    run reproduces the single-device ensemble trajectories."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib

    ds = loaders.data_loader(tiny_dataset, "vanilla_vae1", 30, 32,
                             "synth_small")
    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small", epoch=6,
                    batch_size=32, latent_dim=4)
    seeds = list(range(8))
    p_ref, h_ref = sweep.train_seed_ensemble(ds, cfg, seeds)
    m = meshlib.make_mesh(jax.devices()[:8], dp=8, tp=1)
    p_sh, h_sh = sweep.train_seed_ensemble(ds, cfg, seeds, mesh=m)
    np.testing.assert_allclose(h_sh, h_ref, rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_sh),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_shard_ensemble_rejects_indivisible():
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib

    m = meshlib.make_mesh(jax.devices()[:8], dp=8, tp=1)
    P = jnp.zeros((6, 10))
    with pytest.raises(ValueError, match="not divisible"):
        sweep.shard_ensemble(P, {"mu": jnp.zeros((6, 10))}, m)


def test_seed_ensemble_mesh_padding(tiny_dataset):
    """S=3 seeds on a dp=4 mesh: the seed path pads by repeating the last
    seed (mirror of the split path's replica padding), trains dp-sharded,
    and returns exactly the 3 true replicas — matching the unsharded run."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib

    ds = loaders.data_loader(tiny_dataset, "vanilla_vae1", 30, 32,
                             "synth_small")
    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small", epoch=6,
                    batch_size=32, latent_dim=4)
    seeds = [0, 1, 2]
    p_ref, h_ref = sweep.train_seed_ensemble(ds, cfg, seeds)
    m = meshlib.make_mesh(jax.devices()[:8], dp=4, tp=2)
    p_sh, h_sh = sweep.train_seed_ensemble(ds, cfg, seeds, mesh=m)
    assert h_sh.shape == (3, 6)
    np.testing.assert_allclose(h_sh, h_ref, rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_sh),
                    jax.tree_util.tree_leaves(p_ref)):
        assert np.asarray(a).shape[0] == 3
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_split_ensemble_mesh_padding_matches_unsharded(tiny_dataset):
    """`-ensemble x -mesh` composition (VERDICT r2 item 2): a split triple
    (S=3) dp-shards over dp=4 via replica padding, and the padded/sharded run
    must reproduce the unsharded ensemble's trajectories exactly (replica
    streams are keyed by replica index, so the pad rows change nothing for
    rows 0..S-1)."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib
    from vae_posterior_consistency_tpu.parallel.sweep import (
        train_split_ensemble,
    )

    cfgs = [RunConfig(vae_type=f"reg_vae{i}", data_type="synth_small",
                      epoch=6, batch_size=32, latent_dim=4,
                      p_missingness=30) for i in "123"]
    datasets = [loaders.data_loader(tiny_dataset, c.vae_type, 30, 32,
                                    "synth_small") for c in cfgs]
    p_ref, h_ref = train_split_ensemble(datasets, cfgs[0], chunk_epochs=6)
    m = meshlib.make_mesh(jax.devices()[:8])  # dp=4, tp=2: 3 % 4 != 0
    p_sh, h_sh = train_split_ensemble(datasets, cfgs[0], chunk_epochs=6,
                                      mesh=m)
    assert h_sh.shape == (3, 6)
    np.testing.assert_allclose(h_sh, h_ref, rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p_sh),
                    jax.tree_util.tree_leaves(p_ref)):
        assert np.asarray(a).shape[0] == 3  # padding sliced off
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_split_ensemble_ragged_wrap_equivalence(tiny_dataset):
    """Ragged splits train in ONE program (VERDICT r3 item 5; reference
    index CSVs carry no equal-size guarantee, src/utils/loaders.py:322-326):
    a smaller split wrap-pads to the group max — row j is the split's row
    j mod n, real data only — and must train BITWISE like an equal-shape
    group whose table was wrapped by hand. The full-size replica is
    untouched by its neighbor's padding."""
    import jax.numpy as jnp

    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.data.loaders import Dataset, Split
    from vae_posterior_consistency_tpu.parallel.sweep import (
        train_split_ensemble,
    )

    cfg = RunConfig(vae_type="reg_vae1", data_type="synth_small", epoch=6,
                    batch_size=16, latent_dim=4, p_missingness=30)
    ds1 = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 16, "synth_small")
    n = ds1.train.n
    small = Dataset(train=Split(ds1.train.x[:-5], ds1.train.mask[:-5],
                                "train"), test=None, obs_dim=ds1.obs_dim)
    idx = jnp.arange(n) % (n - 5)
    wrapped = Dataset(train=Split(ds1.train.x[:-5][idx],
                                  ds1.train.mask[:-5][idx], "train"),
                      test=None, obs_dim=ds1.obs_dim)

    p_rag, h_rag = train_split_ensemble([ds1, small], cfg, chunk_epochs=6)
    p_ref, h_ref = train_split_ensemble([ds1, wrapped], cfg, chunk_epochs=6)
    assert h_rag.shape == (2, 6) and np.all(np.isfinite(h_rag))
    assert (h_rag[:, -1] < h_rag[:, 0]).all()  # both replicas train
    np.testing.assert_array_equal(h_rag, h_ref)
    for a, b in zip(jax.tree_util.tree_leaves(p_rag),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_split_ensemble_rejects_mixed_obs_dim(tiny_dataset):
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.data.loaders import Dataset, Split
    from vae_posterior_consistency_tpu.parallel.sweep import (
        train_split_ensemble,
    )

    cfg = RunConfig(vae_type="reg_vae1", data_type="synth_small", epoch=2,
                    batch_size=16, latent_dim=4)
    ds1 = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 16, "synth_small")
    ds2 = Dataset(train=Split(ds1.train.x[:, :-1], ds1.train.mask[:, :-1],
                              "train"), test=None, obs_dim=ds1.obs_dim - 1)
    with pytest.raises(ValueError, match="one obs_dim"):
        train_split_ensemble([ds1, ds2], cfg)


def test_cli_ensemble_ragged_splits(tiny_dataset, tmp_path):
    """`imputation.py -ensemble true` keeps ragged split groups on the
    one-program path (the r3 serial-fallback branch is gone): a truncated
    train_index2.csv trains inside the ensemble and every config's
    checkpoint+artifacts still land at the reference paths."""
    import shutil
    import subprocess

    from tests.cli_harness import cli_env, entry, grid_record

    # a REAL copy (not the fixture symlink) so the index edit stays local
    data_dir = tmp_path / "Data"
    data_dir.mkdir()
    shutil.copytree(os.path.join(tiny_dataset, "synth_small"),
                    data_dir / "synth_small")
    idx_path = data_dir / "synth_small" / "train_index2.csv"
    ids = idx_path.read_text().strip().split(",")
    idx_path.write_text(",".join(ids[:-4]))

    base = dict(data_type="synth_small", epoch=4, batch_size=16, M=1,
                train_k=2, valid_k=3, latent_dim=4, missing_rate=30,
                hid_dim=32)
    (data_dir / "imputation_args.json").write_text("\n".join(
        grid_record(vae_type=f"reg_vae{i}", **base) for i in "12") + "\n")
    out = subprocess.run(
        ["python3", entry("imputation.py"), "-ensemble", "true"],
        cwd=tmp_path, env=cli_env(), capture_output=True, text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "serial fallback" not in out.stdout
    assert out.stdout.count("=== ensemble train") == 1

    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.engine import checkpoint

    for i in "12":
        cfg = RunConfig(vae_type=f"reg_vae{i}", data_type="synth_small",
                        epoch=4, batch_size=16, M=1, train_k=2, valid_k=3,
                        latent_dim=4, missing_rate=30, hid_dim=32)
        path = checkpoint.checkpoint_path(
            cfg, str(tmp_path / "experiments"))
        assert os.path.exists(path), path
        # both size classes evaluated: the [stage] metric lines printed
        assert f"reg_vae{i} [train]" in out.stdout
        assert f"reg_vae{i} [test]" in out.stdout


def test_cli_serial_grid_honors_seeds(tiny_dataset, tmp_path):
    """`imputation.py -seeds 2` WITHOUT -ensemble (VERDICT r3 item 6): the
    serial grid routes each record through one seed-ensemble program,
    prints mean±std metrics, and writes checkpoint.pt + .seed1 — the old
    '-seeds is only applied in ensemble mode' warning is gone."""
    import subprocess

    from tests.cli_harness import cli_env, entry, grid_record, make_sandbox

    base = dict(data_type="synth_small", epoch=4, batch_size=16, M=1,
                train_k=2, valid_k=3, latent_dim=4, missing_rate=30,
                hid_dim=32)
    make_sandbox(tmp_path, tiny_dataset,
                 [grid_record(vae_type="vanilla_vae1", **base)])
    out = subprocess.run(
        ["python3", entry("imputation.py"), "-seeds", "2"],
        cwd=tmp_path, env=cli_env(), capture_output=True, text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "only applied in ensemble mode" not in out.stdout
    assert "seeds=2" in out.stdout
    assert "±" in out.stdout

    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.engine import checkpoint

    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small",
                    epoch=4, batch_size=16, M=1, train_k=2, valid_k=3,
                    latent_dim=4, missing_rate=30, hid_dim=32)
    path = checkpoint.checkpoint_path(cfg, str(tmp_path / "experiments"))
    assert os.path.exists(path), path
    assert os.path.exists(path + ".seed1"), path + ".seed1"


def test_eval_vae_ensemble_matches_serial(tiny_dataset, tmp_path):
    """One vmapped [S]-replica eval program must reproduce the serial
    per-replica eval_vae metrics exactly (VERDICT r2 item 3): same key
    stream, same aggregation, just stacked on the batch dims."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.engine import evaluate as ev
    from vae_posterior_consistency_tpu.parallel.sweep import (
        ensemble_replica,
        train_split_ensemble,
    )

    cfgs = [RunConfig(vae_type=f"reg_vae{i}", data_type="synth_small",
                      epoch=6, batch_size=32, latent_dim=4, M=2,
                      p_missingness=30) for i in "123"]
    datasets = [loaders.data_loader(tiny_dataset, c.vae_type, 30, 32,
                                    "synth_small") for c in cfgs]
    params_ens, _ = train_split_ensemble(datasets, cfgs[0], chunk_epochs=6)

    ens = ev.eval_vae_ensemble(datasets, cfgs, params_ens,
                               experiments_root=str(tmp_path / "ens"))
    for i, cfg in enumerate(cfgs):
        serial = ev.eval_vae(datasets[i], cfg,
                             params=ensemble_replica(params_ens, i),
                             experiments_root=str(tmp_path / "serial"))
        for stage in serial:
            for k, v in serial[stage].items():
                np.testing.assert_allclose(ens[i][stage][k], v, rtol=1e-5,
                                           atol=1e-6, err_msg=f"{i}/{stage}/{k}")


def test_eval_vae_ensemble_miwae_matches_serial(tiny_dataset, tmp_path):
    """The vmapped ensemble eval must also reproduce the MIWAE family's
    serial metrics (valid_k importance samples flow through num_samples)."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.engine import evaluate as ev
    from vae_posterior_consistency_tpu.parallel.sweep import (
        ensemble_replica,
        train_split_ensemble,
    )

    cfgs = [RunConfig(vae_type=f"vanilla_MIWAE{i}", data_type="synth_small",
                      epoch=4, batch_size=32, latent_dim=4, M=2, train_k=3,
                      valid_k=5) for i in "123"]
    datasets = [loaders.data_loader(tiny_dataset, c.vae_type, 30, 32,
                                    "synth_small") for c in cfgs]
    params_ens, _ = train_split_ensemble(datasets, cfgs[0], chunk_epochs=4)
    ens = ev.eval_vae_ensemble(datasets, cfgs, params_ens, save=False)
    for i, cfg in enumerate(cfgs):
        serial = ev.eval_vae(datasets[i], cfg,
                             params=ensemble_replica(params_ens, i),
                             save=False)
        for stage in serial:
            for k, v in serial[stage].items():
                np.testing.assert_allclose(ens[i][stage][k], v, rtol=1e-5,
                                           atol=1e-6,
                                           err_msg=f"{i}/{stage}/{k}")


def test_train_sharded_eddi_family(tiny_dataset):
    """The dp/tp-sharded engine must handle the EDDI/pointnet family — the
    MNIST-scale workload that most wants the mesh — including the shared
    q/p embed path (type_pars [D, K] shards by the generic shape rules)."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib
    from vae_posterior_consistency_tpu.parallel.train_parallel import (
        train_sharded,
    )

    ds = loaders.data_loader(tiny_dataset, "reg_EDDI1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="reg_EDDI1", reg_type="kl_reg", epoch=6,
                    batch_size=32, latent_dim=4, K=6, p_missingness=30,
                    data_type="synth_small")
    mesh = meshlib.make_mesh(jax.devices()[:8])
    params, hist = train_sharded(ds, cfg, mesh, chunk_epochs=6, save=False)
    hist = np.asarray(hist)
    assert hist.shape == (6,) and np.isfinite(hist).all()
    assert hist[-1] < hist[0]  # it learns


def test_split_ensemble_n_seeds(tiny_dataset):
    """n_seeds > 1 replicates the split axis inside the same program: row
    s*S0+i is seed s of split i, every row an independent run (own init +
    streams). Seed rows of the same split must differ from each other and
    the seed-0 rows must match a plain n_seeds=1 run exactly."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel.sweep import (
        train_split_ensemble,
    )

    cfgs = [RunConfig(vae_type=f"reg_vae{i}", data_type="synth_small",
                      epoch=6, batch_size=32, latent_dim=4,
                      p_missingness=30) for i in "123"]
    datasets = [loaders.data_loader(tiny_dataset, c.vae_type, 30, 32,
                                    "synth_small") for c in cfgs]
    p2, h2 = train_split_ensemble(datasets, cfgs[0], chunk_epochs=6,
                                  n_seeds=2)
    assert h2.shape == (6, 6)
    assert np.isfinite(h2).all()
    # seed replicas of the same split are different runs
    assert not np.allclose(h2[0], h2[3])
    # the seed-0 block reproduces the plain run (same replica indices 0..2)
    p1, h1 = train_split_ensemble(datasets, cfgs[0], chunk_epochs=6)
    np.testing.assert_allclose(h2[:3], h1, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p2),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a)[:3], np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_eval_vae_ensemble_mixed_none_split_raises(tiny_dataset):
    """A group where only SOME datasets carry a test split is a caller bug:
    the ensemble evaluator must raise (a silent skip would drop the stage
    for every config in the group), while an all-None stage is skipped."""
    import dataclasses

    import pytest

    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.engine import evaluate as ev
    from vae_posterior_consistency_tpu.parallel.sweep import (
        train_split_ensemble,
    )

    cfgs = [RunConfig(vae_type=f"reg_vae{i}", data_type="synth_small",
                      epoch=2, batch_size=32, latent_dim=4, M=2,
                      p_missingness=30) for i in "123"]
    datasets = [loaders.data_loader(tiny_dataset, c.vae_type, 30, 32,
                                    "synth_small") for c in cfgs]
    params_ens, _ = train_split_ensemble(datasets, cfgs[0], chunk_epochs=2)

    mixed = list(datasets)
    mixed[1] = dataclasses.replace(mixed[1], test=None)
    with pytest.raises(ValueError, match="present for only"):
        ev.eval_vae_ensemble(mixed, cfgs, params_ens, save=False)

    # all-None test stage: evaluates train only, no error
    none_test = [dataclasses.replace(d, test=None) for d in datasets]
    res = ev.eval_vae_ensemble(none_test, cfgs, params_ens, save=False)
    assert all(set(r) == {"train"} for r in res)


def test_alpha_ensemble_mesh_padding_matches_unsharded(tiny_dataset):
    """`-alphas` x `-mesh`: 3 alpha replicas padded onto dp=4 (repeat-last
    padding, rows sliced off) must train bitwise like the unsharded
    3-replica run — same scheme as train_split_ensemble's padding."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib
    from vae_posterior_consistency_tpu.parallel.sweep import (
        train_alpha_ensemble,
    )

    ds = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", epoch=8,
                    batch_size=16, p_missingness=30, latent_dim=4)
    alphas = [0.0, 1.0, 5.0]
    p_ref, h_ref = train_alpha_ensemble(ds, cfg, alphas, chunk_epochs=8)
    mesh = meshlib.make_mesh(jax.devices()[:8])  # dp=4: pads 3 -> 4 rows
    p_mesh, h_mesh = train_alpha_ensemble(ds, cfg, alphas, chunk_epochs=8,
                                          mesh=mesh)
    assert h_mesh.shape == (3, 8)
    np.testing.assert_allclose(np.asarray(h_mesh), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_mesh),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_cli_alpha_ensemble(tiny_dataset, tmp_path):
    """`imputation.py -ensemble true -alphas 0.5,2`: each reg config's alpha
    sweep trains as one vmapped program with per-alpha reference-named
    checkpoints; vanilla configs (alpha-free losses) train once."""
    import os
    import subprocess

    from tests.cli_harness import cli_env, entry, grid_record, make_sandbox

    base = dict(data_type="synth_small", epoch=4, batch_size=16, M=1,
                train_k=2, valid_k=3, latent_dim=4, missing_rate=30,
                hid_dim=32)
    make_sandbox(tmp_path, tiny_dataset, [
        grid_record(vae_type="reg_vae1", **base),
        grid_record(vae_type="vanilla_vae1", **base),
    ])
    out = subprocess.run(
        ["python3", entry("imputation.py"), "-ensemble", "true",
         "-alphas", "0.5,2"],
        cwd=tmp_path, env=cli_env(), capture_output=True, text=True,
        timeout=580)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "alpha-ensemble train reg_vae1" in out.stdout
    assert "(vanilla: alpha-free, once)" in out.stdout
    assert "alpha=0.5 [test]" in out.stdout and "alpha=2 [test]" in out.stdout

    ck = (tmp_path / "experiments" / "UCI_experiments_consistency_missingness"
          / "synth_small" / "checkpoints")
    for a in ("0.5", "2.0"):
        p = (ck / "reg_vae"
             / f"checkpoint_reg_vae1_{a}_30_kl_reg_30_missing_rate_full_reg_test.pt")
        assert p.exists(), p
    assert (ck / "vanilla_vae"
            / "checkpoint_vanilla_vae1_30_missing_rate_test.pt").exists()


def test_alpha_seed_ensemble_reduces_to_seed_ensemble(tiny_dataset):
    """The `-alphas` x `-seeds` composition at a single alpha must reproduce
    train_seed_ensemble BITWISE: rows reuse mode='seed' streams keyed by the
    row's seed, and alpha only substitutes into the traced loss."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel.sweep import (
        train_alpha_seed_ensemble,
        train_seed_ensemble,
    )

    ds = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", epoch=8,
                    batch_size=16, p_missingness=30, latent_dim=4, alpha=1.0)
    seeds = [0, 7]
    p_ref, h_ref = train_seed_ensemble(ds, cfg, seeds, chunk_epochs=8)
    p_as, h_as = train_alpha_seed_ensemble(ds, cfg, [cfg.alpha], seeds,
                                           chunk_epochs=8)
    np.testing.assert_array_equal(np.asarray(h_as), np.asarray(h_ref))
    for a, b in zip(jax.tree_util.tree_leaves(p_as),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_alpha_seed_ensemble_paired_rows(tiny_dataset):
    """Within one seed, rows across alphas share init+streams (paired
    comparison): the alpha=0 rows of two different seeds must differ, while
    a row's result is alpha-sensitive within the same seed."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel.sweep import (
        train_alpha_seed_ensemble,
    )

    ds = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", epoch=10,
                    batch_size=16, p_missingness=30, latent_dim=4)
    params, hist = train_alpha_seed_ensemble(ds, cfg, [0.0, 5.0], [0, 7],
                                             chunk_epochs=10)
    assert hist.shape == (4, 10)  # rows: (a0,s0),(a0,s7),(a5,s0),(a5,s7)
    assert np.all(np.isfinite(hist))
    assert abs(hist[0, -1] - hist[1, -1]) > 1e-4  # seeds differ at fixed a
    assert abs(hist[0, -1] - hist[2, -1]) > 1e-4  # alphas differ at fixed s


def test_alpha_seed_ensemble_mesh_matches_unsharded(tiny_dataset):
    """`-alphas` x `-seeds` x `-mesh`: [2x3]=6 rows padded onto dp=4 (to 8)
    must train bitwise like the unsharded composed run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib
    from vae_posterior_consistency_tpu.parallel.sweep import (
        train_alpha_seed_ensemble,
    )

    ds = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", epoch=6,
                    batch_size=16, p_missingness=30, latent_dim=4)
    p_ref, h_ref = train_alpha_seed_ensemble(ds, cfg, [0.5, 2.0], [0, 3, 7],
                                             chunk_epochs=6)
    mesh = meshlib.make_mesh(jax.devices()[:8])  # dp=4: pads 6 -> 8 rows
    p_mesh, h_mesh = train_alpha_seed_ensemble(ds, cfg, [0.5, 2.0],
                                               [0, 3, 7], chunk_epochs=6,
                                               mesh=mesh)
    assert h_mesh.shape == (6, 6)
    np.testing.assert_allclose(np.asarray(h_mesh), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_mesh),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_sweep_ensemble_missing_axis(tiny_dataset):
    """`-missings`: the p_missingness axis trains as one vmapped program;
    the rate enters the traced mask_p draw only (reference's outer serial
    loop: imputation.py:23)."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel.sweep import (
        train_sweep_ensemble,
    )

    ds = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", epoch=20,
                    batch_size=16, p_missingness=30, latent_dim=4)
    params, hist, rows = train_sweep_ensemble(ds, cfg, missings=[10, 60],
                                              alphas=[1.0], chunk_epochs=10)
    assert rows == [(10, 1.0, None), (60, 1.0, None)]
    assert hist.shape == (2, 20)
    assert np.all(np.isfinite(hist))
    # the two rates must actually train differently
    assert abs(hist[0, -1] - hist[1, -1]) > 1e-4
    leaves = jax.tree_util.tree_leaves(params)
    assert all(leaf.shape[0] == 2 for leaf in leaves)


def test_sweep_ensemble_singleton_missing_delegates_bitwise(tiny_dataset):
    """A singleton `missings` must reproduce the pinned alpha/seed ensembles
    BITWISE (delegation, not a parallel reimplementation)."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel.sweep import (
        train_alpha_ensemble,
        train_alpha_seed_ensemble,
        train_sweep_ensemble,
    )

    ds = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", epoch=8,
                    batch_size=16, p_missingness=30, latent_dim=4)
    p_sw, h_sw, rows = train_sweep_ensemble(ds, cfg, missings=[30],
                                            alphas=[0.0, 5.0],
                                            chunk_epochs=8)
    p_a, h_a = train_alpha_ensemble(ds, cfg, [0.0, 5.0], chunk_epochs=8)
    assert rows == [(30, 0.0, None), (30, 5.0, None)]
    np.testing.assert_array_equal(np.asarray(h_sw), np.asarray(h_a))
    for a, b in zip(jax.tree_util.tree_leaves(p_sw),
                    jax.tree_util.tree_leaves(p_a)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    p_sw, h_sw, rows = train_sweep_ensemble(ds, cfg, missings=[30],
                                            alphas=[1.0], seeds=[0, 7],
                                            chunk_epochs=8)
    p_s, h_s = train_alpha_seed_ensemble(ds, cfg, [1.0], [0, 7],
                                         chunk_epochs=8)
    assert rows == [(30, 1.0, 0), (30, 1.0, 7)]
    np.testing.assert_array_equal(np.asarray(h_sw), np.asarray(h_s))


def test_sweep_ensemble_missing_seed_product(tiny_dataset):
    """missings x seeds: rows of one seed share init+streams across rates
    (paired), different seeds replicate independently."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel.sweep import (
        train_sweep_ensemble,
    )

    ds = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", epoch=10,
                    batch_size=16, p_missingness=30, latent_dim=4)
    params, hist, rows = train_sweep_ensemble(ds, cfg, missings=[10, 60],
                                              alphas=[1.0], seeds=[0, 7],
                                              chunk_epochs=10)
    assert rows == [(10, 1.0, 0), (10, 1.0, 7), (60, 1.0, 0), (60, 1.0, 7)]
    assert hist.shape == (4, 10)
    assert np.all(np.isfinite(hist))
    assert abs(hist[0, -1] - hist[2, -1]) > 1e-5  # rate differs at fixed seed
    assert abs(hist[0, -1] - hist[1, -1]) > 1e-5  # seed differs at fixed rate


def test_sweep_ensemble_mesh_matches_unsharded(tiny_dataset):
    """`-missings` x `-mesh`: [2x3]=6 rows padded onto dp=4 (to 8) must train
    like the unsharded run (same tolerance as the other ensemble axes)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib
    from vae_posterior_consistency_tpu.parallel.sweep import (
        train_sweep_ensemble,
    )

    ds = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", epoch=6,
                    batch_size=16, p_missingness=30, latent_dim=4)
    p_ref, h_ref, rows = train_sweep_ensemble(
        ds, cfg, missings=[10, 30, 60], alphas=[0.5, 2.0], chunk_epochs=6)
    mesh = meshlib.make_mesh(jax.devices()[:8])  # dp=4: pads 6 -> 8 rows
    p_mesh, h_mesh, rows_m = train_sweep_ensemble(
        ds, cfg, missings=[10, 30, 60], alphas=[0.5, 2.0], chunk_epochs=6,
        mesh=mesh)
    assert rows_m == rows and h_mesh.shape == (6, 6)
    np.testing.assert_allclose(np.asarray(h_mesh), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_mesh),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_cli_missings_sweep_ensemble(tiny_dataset, tmp_path):
    """`imputation.py -ensemble true -missings 10,50`: each reg config's
    missing-rate sweep trains as one vmapped program with per-rate
    reference-named checkpoints; vanilla configs (rate-free training) train
    once and re-evaluate per rate."""
    import subprocess

    from tests.cli_harness import cli_env, entry, grid_record, make_sandbox

    base = dict(data_type="synth_small", epoch=4, batch_size=16, M=1,
                train_k=2, valid_k=3, latent_dim=4, missing_rate=30,
                hid_dim=32)
    make_sandbox(tmp_path, tiny_dataset, [
        grid_record(vae_type="reg_vae1", **base),
        grid_record(vae_type="vanilla_vae1", **base),
    ])
    out = subprocess.run(
        ["python3", entry("imputation.py"), "-ensemble", "true",
         "-missings", "10,50"],
        cwd=tmp_path, env=cli_env(), capture_output=True, text=True,
        timeout=580)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "sweep-ensemble train reg_vae1" in out.stdout
    assert "(vanilla: rate/alpha-free training, once)" in out.stdout
    assert "missing=10 alpha=1 [test]" in out.stdout
    assert "missing=50 alpha=1 [test]" in out.stdout

    ck = (tmp_path / "experiments" / "UCI_experiments_consistency_missingness"
          / "synth_small" / "checkpoints")
    for m in ("10", "50"):
        p = (ck / "reg_vae"
             / f"checkpoint_reg_vae1_1.0_{m}_kl_reg_30_missing_rate_full_reg_test.pt")
        assert p.exists(), p
    assert (ck / "vanilla_vae"
            / "checkpoint_vanilla_vae1_30_missing_rate_test.pt").exists()


def test_split_ensemble_resume_bit_identical(tiny_dataset, tmp_path,
                                             monkeypatch):
    """Kill a split-ensemble run mid-flight (after its first chunk) and
    resume: the final stacked params must be BIT-identical to an
    uninterrupted run (VERDICT r4 item 2). Epoch keys derive from absolute
    epoch indices, so the restart point cannot perturb any stream; the
    resume file round-trips f32 leaves exactly."""
    from vae_posterior_consistency_tpu.data import loaders

    cfgs = [RunConfig(vae_type=f"reg_vae{i}", data_type="synth_small",
                      epoch=8, batch_size=32, latent_dim=4,
                      p_missingness=30) for i in "123"]
    datasets = [loaders.data_loader(tiny_dataset, c.vae_type, 30, 32,
                                    "synth_small") for c in cfgs]
    rp = str(tmp_path / "split_ens.resume.pt")

    ref_params, ref_hist = sweep.train_split_ensemble(
        datasets, cfgs[0], chunk_epochs=4)
    assert ref_hist.shape == (3, 8)

    # crash the SECOND chunk call — the run dies at epoch 4 of 8, after
    # the checkpoint_every=4 boundary wrote the resume file
    orig = sweep._make_ensemble_chunk

    def crashing(*a, **k):
        run, calls = orig(*a, **k), {"n": 0}

        def wrapped(P, o, e0, ne):
            if calls["n"] == 1:
                raise RuntimeError("simulated kill")
            calls["n"] += 1
            return run(P, o, e0, ne)

        return wrapped

    monkeypatch.setattr(sweep, "_make_ensemble_chunk", crashing)
    with pytest.raises(RuntimeError, match="simulated kill"):
        sweep.train_split_ensemble(datasets, cfgs[0], chunk_epochs=4,
                                   checkpoint_every=4, resume_path=rp)
    monkeypatch.setattr(sweep, "_make_ensemble_chunk", orig)
    assert os.path.exists(rp)

    res_params, res_hist = sweep.train_split_ensemble(
        datasets, cfgs[0], chunk_epochs=4, checkpoint_every=4,
        resume_path=rp, resume=True)
    # only the post-resume epochs ran in this process
    assert res_hist.shape == (3, 4)
    np.testing.assert_array_equal(res_hist, ref_hist[:, 4:])
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(res_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_seed_ensemble_resume_sharded(tiny_dataset, tmp_path):
    """Resume of a dp-SHARDED seed ensemble: the loaded host state must be
    laid back out over the mesh (sweep._shard_fn) and finish bit-identical
    to the uninterrupted sharded run."""
    from vae_posterior_consistency_tpu.data import loaders

    ds = loaders.data_loader(tiny_dataset, "vanilla_vae1", 30, 32,
                             "synth_small")
    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small",
                    epoch=8, batch_size=32, latent_dim=4)
    mesh = meshlib.make_mesh(jax.devices()[:8])
    seeds = [0, 1, 2, 3]
    rp = str(tmp_path / "seed_ens.resume.pt")

    ref_params, _ = sweep.train_seed_ensemble(ds, cfg, seeds, chunk_epochs=4,
                                              mesh=mesh)
    # "killed" at epoch 4: a truncated run whose final boundary wrote rp
    sweep.train_seed_ensemble(ds, cfg.replace(epoch=4), seeds,
                              chunk_epochs=4, checkpoint_every=4, mesh=mesh,
                              resume_path=rp)
    assert os.path.exists(rp)
    res_params, res_hist = sweep.train_seed_ensemble(
        ds, cfg, seeds, chunk_epochs=4, checkpoint_every=4, mesh=mesh,
        resume_path=rp, resume=True)
    assert res_hist.shape == (4, 4)
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(res_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # resumed state is back on the mesh
    leaf = jax.tree_util.tree_leaves(res_params)[0]
    assert leaf.sharding.mesh.shape["dp"] == mesh.shape["dp"]


def test_train_sharded_resume_bit_identical(tiny_dataset, tmp_path):
    """train_sharded's checkpoint_every/resume contract on the 8-device
    mesh: kill at epoch 4 of 8, resume, finish bit-identical to the
    uninterrupted sharded run (VERDICT r4 item 2)."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.engine import checkpoint
    from vae_posterior_consistency_tpu.parallel.train_parallel import (
        train_sharded,
    )

    ds = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", epoch=8,
                    batch_size=32, latent_dim=4, p_missingness=30)
    mesh = meshlib.make_mesh(jax.devices()[:8])
    root = str(tmp_path)

    ref_params, ref_hist = train_sharded(ds, cfg, mesh, chunk_epochs=4,
                                         experiments_root=root)
    # killed at epoch 4: the truncated run's final boundary writes .resume.pt
    train_sharded(ds, cfg.replace(epoch=4), mesh, chunk_epochs=4,
                  checkpoint_every=4, experiments_root=root)
    rp = checkpoint.checkpoint_path(cfg, root) + ".resume.pt"
    assert os.path.exists(rp)
    res_params, res_hist = train_sharded(ds, cfg, mesh, chunk_epochs=4,
                                         checkpoint_every=4, resume=True,
                                         experiments_root=root)
    assert res_hist.shape == (4,)
    np.testing.assert_array_equal(res_hist, ref_hist[4:])
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(res_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_seed_ensemble_per_step_gather_layout_equivalence(
        tiny_dataset, monkeypatch):
    """The wide-seed-ensemble layout (per-step row gather, unroll=1;
    parallel/sweep.PER_STEP_GATHER_MIN_S) is a pure gather reorder of the
    hoisted [S, n+pad, D] epoch-table layout: identical loss streams and
    final params (VERDICT r4 item 3 — the measured rollover fix)."""
    from vae_posterior_consistency_tpu.data import loaders

    ds = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", epoch=6,
                    batch_size=16, latent_dim=4, p_missingness=30)
    seeds = [0, 1, 2]

    monkeypatch.setattr(sweep, "PER_STEP_GATHER_MIN_S", 10 ** 9)
    p_table, h_table = sweep.train_seed_ensemble(ds, cfg, seeds,
                                                 chunk_epochs=3)
    monkeypatch.setattr(sweep, "PER_STEP_GATHER_MIN_S", 1)
    p_step, h_step = sweep.train_seed_ensemble(ds, cfg, seeds,
                                               chunk_epochs=3)

    np.testing.assert_allclose(h_step, h_table, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_table),
                    jax.tree_util.tree_leaves(p_step)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_sweep_ensemble_per_step_gather_layout_equivalence(
        tiny_dataset, monkeypatch):
    """The per-step-gather policy also covers the seeded full-sweep grid
    (mode='seed' with traced per-row alpha AND missing rate): both layouts
    produce the same history and params."""
    from vae_posterior_consistency_tpu.data import loaders

    ds = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", epoch=4,
                    batch_size=16, latent_dim=4, p_missingness=30)

    monkeypatch.setattr(sweep, "PER_STEP_GATHER_MIN_S", 10 ** 9)
    p_table, h_table, rows_t = sweep.train_sweep_ensemble(
        ds, cfg, missings=[30, 50], alphas=[0.5, 1.0], seeds=[0, 1],
        chunk_epochs=2)
    monkeypatch.setattr(sweep, "PER_STEP_GATHER_MIN_S", 1)
    p_step, h_step, rows_s = sweep.train_sweep_ensemble(
        ds, cfg, missings=[30, 50], alphas=[0.5, 1.0], seeds=[0, 1],
        chunk_epochs=2)

    assert rows_t == rows_s
    np.testing.assert_allclose(h_step, h_table, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_table),
                    jax.tree_util.tree_leaves(p_step)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_seed_ensemble_group_split_equivalence(tiny_dataset, monkeypatch):
    """Ultra-wide seed ensembles train as sequential <=SEED_GROUP_MAX_S
    groups (sweep.SEED_GROUP_MAX_S — the measured S=1024 mitigation).
    Replica streams key off the SEED VALUE, so grouping changes no PRNG
    draw; only FP reassociation across the differently-sized compiled
    programs moves values, at rounding level (measured ~1e-6 on the
    singleton group)."""
    from vae_posterior_consistency_tpu.data import loaders

    ds = loaders.data_loader(tiny_dataset, "vanilla_vae1", 30, 32,
                             "synth_small")
    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small",
                    epoch=4, batch_size=16, latent_dim=4)
    seeds = [0, 1, 2, 3, 4]

    p_one, h_one = sweep.train_seed_ensemble(ds, cfg, seeds, chunk_epochs=2)
    monkeypatch.setattr(sweep, "SEED_GROUP_MAX_S", 2)
    p_grp, h_grp = sweep.train_seed_ensemble(ds, cfg, seeds, chunk_epochs=2)

    np.testing.assert_allclose(h_grp, h_one, rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_one),
                    jax.tree_util.tree_leaves(p_grp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_seed_ensemble_group_resume_uneven_histories(
        tiny_dataset, tmp_path, monkeypatch):
    """A killed multi-group run resumes group-accurately (code-review r5):
    groups that already finished rerun 0 epochs, so per-group histories
    have unequal lengths — the concat NaN-pads on the left instead of
    crashing after all the training is done. Params must match the
    uninterrupted run exactly."""
    import os

    from vae_posterior_consistency_tpu.data import loaders

    ds = loaders.data_loader(tiny_dataset, "vanilla_vae1", 30, 32,
                             "synth_small")
    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small",
                    epoch=4, batch_size=16, latent_dim=4)
    seeds = [0, 1, 2, 3]
    monkeypatch.setattr(sweep, "SEED_GROUP_MAX_S", 2)
    rp = str(tmp_path / "ens.resume.pt")

    p_full, h_full = sweep.train_seed_ensemble(
        ds, cfg, seeds, chunk_epochs=2, checkpoint_every=2, resume_path=rp)
    assert os.path.exists(rp + ".g0") and os.path.exists(rp + ".g1")
    # simulate a kill while group 1 was still training: its file vanishes
    os.remove(rp + ".g1")
    p_res, h_res = sweep.train_seed_ensemble(
        ds, cfg, seeds, chunk_epochs=2, checkpoint_every=2, resume_path=rp,
        resume=True)

    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_res)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert h_res.shape == h_full.shape
    # group 0 ran nothing in the resumed process: NaN rows; group 1 real
    assert np.isnan(h_res[:2]).all()
    np.testing.assert_array_equal(h_res[2:], h_full[2:])


def test_ensemble_early_stopping_per_replica_tracker():
    """EnsembleEarlyStopping unit semantics: independent per-replica
    counters, best-row snapshots that MIX checks, and a stop only when
    EVERY replica has exhausted patience."""
    from vae_posterior_consistency_tpu.utils.early_stopping import (
        EnsembleEarlyStopping,
    )

    es = EnsembleEarlyStopping(patience=2)
    p1 = {"w": np.arange(6, dtype=np.float32).reshape(3, 2)}
    # first check: every row improves from inf and snapshots in full
    assert not es.update(np.array([3.0, 3.0, 3.0]), p1)
    np.testing.assert_array_equal(es.counter, [0, 0, 0])
    # second: only row 1 improves; rows 0/2 count up
    p2 = {"w": p1["w"] + 100}
    assert not es.update(np.array([3.0, 2.0, 4.0]), p2)
    np.testing.assert_array_equal(es.counter, [1, 0, 1])
    # best rows mix the two checks: rows 0/2 keep p1, row 1 takes p2
    np.testing.assert_array_equal(es.best_params["w"][0], p1["w"][0])
    np.testing.assert_array_equal(es.best_params["w"][1], p2["w"][1])
    np.testing.assert_array_equal(es.best_params["w"][2], p1["w"][2])
    # third: nobody improves — rows 0/2 exhaust patience, row 1 does not
    assert not es.update(np.array([5.0, 5.0, 5.0]), p2)
    np.testing.assert_array_equal(es.counter, [2, 1, 2])
    # fourth: row 1 exhausts too -> the WHOLE ensemble stops
    assert es.update(np.array([5.0, 5.0, 5.0]), p2)
    np.testing.assert_array_equal(es.best_loss, [3.0, 2.0, 3.0])


def test_seed_ensemble_early_stopping_stops_and_restores(tiny_dataset):
    """A forced plateau (delta=1e9 makes every post-first check a
    non-improvement) stops the seed ensemble after `patience` chunk-boundary
    checks and returns each replica's FIRST-check parameters — bit-equal to
    the same ensemble trained only to that boundary."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.utils.early_stopping import (
        EnsembleEarlyStopping,
    )

    ds = loaders.data_loader(tiny_dataset, "vanilla_vae1", 30, 32,
                             "synth_small")
    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small",
                    epoch=20, batch_size=32, latent_dim=4)
    es = EnsembleEarlyStopping(patience=2, delta=1e9)
    params, hist = sweep.train_seed_ensemble(ds, cfg, [0, 1, 2],
                                             chunk_epochs=2,
                                             early_stopping=es)
    # checks at epoch 2 (first: improves), 4 (counter 1), 6 (counter 2
    # >= patience -> stop): 6 of the requested 20 epochs ran
    assert hist.shape == (3, 6)
    ref_params, _ = sweep.train_seed_ensemble(ds, cfg.replace(epoch=2),
                                              [0, 1, 2], chunk_epochs=2)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_split_ensemble_early_stopping(tiny_dataset):
    """Per-replica early stopping on the split ensemble (stacked
    per-replica validation tables): plateau stop + first-check restore."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.utils.early_stopping import (
        EnsembleEarlyStopping,
    )

    cfgs = [RunConfig(vae_type=f"reg_vae{i}", data_type="synth_small",
                      epoch=20, batch_size=32, latent_dim=4,
                      p_missingness=30) for i in "123"]
    datasets = [loaders.data_loader(tiny_dataset, c.vae_type, 30, 32,
                                    "synth_small") for c in cfgs]
    es = EnsembleEarlyStopping(patience=1, delta=1e9)
    params, hist = sweep.train_split_ensemble(datasets, cfgs[0],
                                              chunk_epochs=2,
                                              early_stopping=es)
    # checks at epoch 2 (first: improves), 4 (counter 1 >= patience)
    assert hist.shape == (3, 4)
    ref_params, _ = sweep.train_split_ensemble(
        datasets, cfgs[0].replace(epoch=2), chunk_epochs=2)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sweep_ensemble_early_stopping_swept_knobs(tiny_dataset):
    """The stacked validation objective honors the swept per-row knobs
    (alpha AND p_missingness enter each row's own val loss) and the
    plateau stop works on the full sweep product."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.utils.early_stopping import (
        EnsembleEarlyStopping,
    )

    ds = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", epoch=20,
                    batch_size=32, latent_dim=4, p_missingness=30)
    es = EnsembleEarlyStopping(patience=1, delta=1e9)
    params, hist, rows = sweep.train_sweep_ensemble(
        ds, cfg, missings=[20, 40], alphas=[0.5, 1.0], chunk_epochs=2,
        early_stopping=es)
    assert hist.shape == (4, 4)
    assert len(rows) == 4
    # the per-row val losses must differ across alpha rows at a fixed rate
    # (alpha scales the kl_reg composite) — identical values would mean the
    # swept knob never reached its row's validation objective
    assert es.best_loss is not None
    assert not np.isclose(es.best_loss[0], es.best_loss[1])


def test_train_sharded_early_stopping(tiny_dataset):
    """train_sharded carries the serial engine's early-stopping contract on
    the 8-device mesh: plateau stop + best(first)-check restore."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel.train_parallel import (
        train_sharded,
    )
    from vae_posterior_consistency_tpu.utils.early_stopping import (
        EarlyStopping,
    )

    ds = loaders.data_loader(tiny_dataset, "reg_vae1", 30, 32, "synth_small")
    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", epoch=20,
                    batch_size=32, latent_dim=4, p_missingness=30)
    mesh = meshlib.make_mesh(jax.devices()[:8])
    es = EarlyStopping(patience=1, delta=1e9)
    params, hist = train_sharded(ds, cfg, mesh, chunk_epochs=2,
                                 early_stopping=es)
    # checks at epoch 2 (improves) and 4 (counter 1 >= patience -> stop)
    assert hist.shape == (4,)
    ref_params, _ = train_sharded(ds, cfg.replace(epoch=2), mesh,
                                  chunk_epochs=2)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_seed_ensemble_early_stopping_on_mesh(tiny_dataset):
    """Ensemble early stopping composes with dp-sharding: the vmapped val
    objective runs on sharded replica rows, host snapshots gather sharded
    leaves, and the plateau stop + first-check restore match the unsharded
    contract (padded dp rows duplicate real seeds, so they cannot delay the
    stop in seed mode)."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.utils.early_stopping import (
        EnsembleEarlyStopping,
    )

    ds = loaders.data_loader(tiny_dataset, "vanilla_vae1", 30, 32,
                             "synth_small")
    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small",
                    epoch=20, batch_size=32, latent_dim=4)
    mesh = meshlib.make_mesh(jax.devices()[:8])
    es = EnsembleEarlyStopping(patience=1, delta=1e9)
    # 3 seeds pad to dp=4 rows internally; the tracker sees all 4
    params, hist = sweep.train_seed_ensemble(ds, cfg, [0, 1, 2],
                                             chunk_epochs=2, mesh=mesh,
                                             early_stopping=es)
    assert hist.shape == (3, 4)  # checks at 2 (improves) and 4 (stop)
    ref_params, _ = sweep.train_seed_ensemble(ds, cfg.replace(epoch=2),
                                              [0, 1, 2], chunk_epochs=2,
                                              mesh=mesh)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
