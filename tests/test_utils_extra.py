"""Tensor utils, flow combinators, early stopping, resume, debugging, MI,
completion — the remaining SURVEY §2 inventory pieces."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.nn import flow, tensor_utils as tu
from vae_posterior_consistency_tpu.utils.early_stopping import EarlyStopping


def test_searchsorted():
    cdf = jnp.asarray([[0.0, 0.2, 0.5, 1.0]])
    vals = jnp.asarray([[0.1], [0.3], [0.9]])
    idx = tu.searchsorted(jnp.repeat(cdf, 3, 0), vals[:, 0])
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2])


def test_leading_dim_roundtrip():
    x = jnp.arange(24).reshape(6, 4)
    y = tu.split_leading_dim(x, (2, 3))
    assert y.shape == (2, 3, 4)
    z = tu.merge_leading_dims(y, 2)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))


def test_random_orthogonal():
    q = tu.random_orthogonal(jax.random.PRNGKey(0), 5)
    np.testing.assert_allclose(np.asarray(q @ q.T), np.eye(5), atol=1e-5)


def test_binary_masks():
    m = tu.create_alternating_binary_mask(6, even=True)
    np.testing.assert_array_equal(np.asarray(m), [1, 0, 1, 0, 1, 0])
    m2 = tu.create_mid_split_binary_mask(5)
    np.testing.assert_array_equal(np.asarray(m2), [1, 1, 1, 0, 0])
    m3 = tu.create_random_binary_mask(jax.random.PRNGKey(1), 8)
    assert int(m3.sum()) == 4


def test_gaussian_kde():
    samples = jax.random.normal(jax.random.PRNGKey(0), (2000, 1))
    lp = tu.gaussian_kde_log_eval(samples, jnp.asarray([[0.0]]))
    # density of N(0,1) at 0 is ~0.399
    assert abs(float(jnp.exp(lp[0])) - 0.399) < 0.05


def test_actnorm_invertible():
    params = {"log_scale": jnp.asarray([0.5, -0.3]),
              "shift": jnp.asarray([1.0, 2.0])}
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 2))
    y, ld = flow.actnorm_apply(params, x)
    x2, ld_inv = flow.actnorm_apply(params, y, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-6)


def test_composite_and_inverse_transform():
    p1 = {"log_scale": jnp.asarray([0.2]), "shift": jnp.asarray([0.5])}
    layer = lambda x, c, inv: flow.actnorm_apply(p1, x, c, inv)
    x = jnp.asarray([[1.0], [2.0]])
    y, _ = flow.composite_apply([layer, layer], x)
    x2, _ = flow.composite_apply([layer, layer], y, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6)
    # inverse_transform swaps directions: inv(fwd(x)) == x
    inv_layer = flow.inverse_transform(layer)
    y3, _ = inv_layer(*(layer(x, None, False)[0], None, False))
    np.testing.assert_allclose(np.asarray(y3), np.asarray(x), atol=1e-6)


def test_early_stopping(tmp_path):
    es = EarlyStopping(patience=2, path=str(tmp_path / "best.pt"))
    p = {"w": jnp.ones((2, 2))}
    assert not es.update(1.0, p)
    assert not es.update(0.5, p)  # improvement
    assert not es.update(0.6, p)  # 1
    # the RETURN VALUE is the stopping contract callers branch on
    # (`if es.update(...): break`) — pin it, not just the flag
    assert es.update(0.7, p) is True  # 2 -> stop
    assert es.early_stop
    assert os.path.exists(tmp_path / "best.pt")
    assert es.best_loss == 0.5


def test_train_resume(tiny_dataset, tmp_path):
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.engine import train as T

    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small", epoch=6,
                    batch_size=32, latent_dim=4)
    ds = loaders.data_loader(tiny_dataset, cfg.vae_type, 30, 32, "synth_small")
    # run 6 epochs with a resume checkpoint every 3
    p_full, h_full = T.train(ds, cfg, experiments_root=str(tmp_path),
                             checkpoint_every=3)
    # interrupt after 3 epochs, then resume to 6: same final params
    cfg3 = cfg.replace(epoch=3)
    T.train(ds, cfg3, experiments_root=str(tmp_path), checkpoint_every=3)
    p_res, _ = T.train(ds, cfg, experiments_root=str(tmp_path),
                       checkpoint_every=3, resume=True)
    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_res)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_mutual_information_and_completion(batch):
    from vae_posterior_consistency_tpu.engine.inference import (
        completion,
        mutual_information,
    )
    from vae_posterior_consistency_tpu.models import get_model

    x, mask, mask_p = batch
    cfg = RunConfig(vae_type="vanilla_vae1", latent_dim=4)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0), cfg, x.shape[1])
    mi = mutual_information(params, x, mask, cfg)
    assert bool(jnp.isfinite(mi))
    im = completion(params, x, mask, mask_p, M=3, cfg=cfg)
    assert im.shape == (3,) + x.shape


def test_checked_nan_tripwire():
    from vae_posterior_consistency_tpu.utils.debugging import checked

    def bad(x):
        return jnp.log(x)

    import pytest

    with pytest.raises(Exception):
        checked(bad)(jnp.asarray(-1.0))


def test_multiscale_apply_logdet_and_shapes():
    """Multiscale cascade splits half the dims per scale and accumulates the
    per-row logabsdet (reference behavior: src/models/VAE.py:1481-1624)."""
    p = {"log_scale": jnp.asarray([0.3]), "shift": jnp.asarray([-0.1])}
    layer = lambda x, c, inv: flow.actnorm_apply(p, x, c, inv)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(4, 8)),
                    jnp.float32)
    out, log_det = flow.multiscale_apply([layer, layer, layer], x)
    # all dims come back out: 4 split off at scale 1, 2 at scale 2, 2 at end
    assert out.shape == x.shape
    assert log_det.shape == (4,)
    # actnorm logdet per element is log_scale; dims seen: 8 + 4 + 2
    np.testing.assert_allclose(np.asarray(log_det),
                               0.3 * (8 + 4 + 2), rtol=1e-5)


def test_apply_rng_impl_switches_default():
    from vae_posterior_consistency_tpu.config import RunConfig, apply_rng_impl

    try:
        apply_rng_impl(RunConfig(vae_type="vanilla_vae1", rng_impl="rbg"))
        k = jax.random.PRNGKey(0)
        assert k.shape == (4,)  # rbg keys are 4x uint32
    finally:
        apply_rng_impl(
            RunConfig(vae_type="vanilla_vae1", rng_impl="threefry2x32"))
    assert jax.random.PRNGKey(0).shape == (2,)


def test_enable_nan_debugging_from_env(monkeypatch):
    from vae_posterior_consistency_tpu.utils import debugging

    monkeypatch.setenv("VPC_DEBUG_NANS", "1")
    try:
        debugging.enable_nan_debugging_from_env()
        assert jax.config.jax_debug_nans
    finally:
        debugging.enable_nan_debugging(False)
    assert not jax.config.jax_debug_nans


def test_multihost_env_parsing(monkeypatch):
    from vae_posterior_consistency_tpu.parallel import multihost

    calls = {}
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda coordinator_address, num_processes, process_id: calls.update(
            addr=coordinator_address, n=num_processes, pid=process_id))
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    multihost.initialize()
    assert calls == {"addr": "10.0.0.1:1234", "n": 4, "pid": 2}


def test_profile_trace_and_timed(tmp_path, capsys):
    from vae_posterior_consistency_tpu.utils.logging import (
        profile_trace,
        timed,
    )

    with timed("probe"):
        jnp.ones((4,)).block_until_ready()
    assert "probe" in capsys.readouterr().out
    with profile_trace(str(tmp_path / "trace")):
        jnp.ones((4,)).block_until_ready()
    assert (tmp_path / "trace").exists()


def test_str2bool():
    from vae_posterior_consistency_tpu.config import str2bool

    assert str2bool("true") and str2bool("1") and str2bool(True)
    assert not str2bool("false") and not str2bool("0")


def test_mutual_information_kde_orders_informative_vs_constant():
    """The KDE MI diagnostic (engine/inference.mutual_information_kde) must
    score an input-dependent posterior well above an input-independent one
    (which has MI ~ 0)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.engine.inference import (
        mutual_information_kde,
    )
    from vae_posterior_consistency_tpu.models import get_model

    cfg = RunConfig(vae_type="vanilla_vae1", latent_dim=3)
    model = get_model(cfg)
    D, B = 6, 64
    params = model.init(jax.random.PRNGKey(0), cfg, D)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, D))
    mask = jnp.ones((B, D))

    mi_info = float(mutual_information_kde(params, 10.0 * x, mask, cfg))
    # input-independent encoder: zero out the input
    mi_const = float(mutual_information_kde(params, 0.0 * x, mask, cfg))
    assert np.isfinite(mi_info) and np.isfinite(mi_const)
    assert mi_info > mi_const
    assert abs(mi_const) < 1.0  # near-zero for a constant posterior


def test_gaussian_kde_loo_drops_self_kernel():
    """loo=True excludes each fit point's own kernel: it is strictly below
    the plain estimate at the fit points, and unbiased where the plain
    estimate is dominated by the self term (small N, moderate D)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_posterior_consistency_tpu.nn import tensor_utils as tu

    z = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    plain = tu.gaussian_kde_log_eval(z, z)
    loo = tu.gaussian_kde_log_eval(z, z, loo=True)
    assert np.all(np.asarray(plain) > np.asarray(loo))
    # N(0,I_8) log-density at typical points is ~ -0.5*||z||^2 - 4 log 2pi
    # in [-18, -7]; the self-kernel floor -8*log(bw*sqrt(2pi)) ~ -5.5 pulls
    # the plain estimate above the truth while LOO stays below it on average
    true_ld = -0.5 * jnp.sum(z**2, axis=-1) - 4.0 * jnp.log(2 * jnp.pi)
    assert float(jnp.mean(plain - true_ld)) > float(
        jnp.mean(loo - true_ld))

    import pytest
    with pytest.raises(ValueError):
        tu.gaussian_kde_log_eval(z, z[:4], loo=True)


def test_mutual_information_kde_small_batch_not_negative():
    """The review's failure regime (B=16, latent_dim=8): without
    leave-one-out the self-kernel floor (-8*log(bw*sqrt(2pi)) ~ -5.5)
    dominates log q_agg and drives the constant-encoder MI well below 0,
    breaking the informative-vs-constant ordering the diagnostic exists
    for. With LOO the constant case stays near zero."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.engine.inference import (
        mutual_information_kde,
    )
    from vae_posterior_consistency_tpu.models import get_model

    cfg = RunConfig(vae_type="vanilla_vae1", latent_dim=8)
    model = get_model(cfg)
    D, B = 6, 16
    params = model.init(jax.random.PRNGKey(0), cfg, D)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, D))
    mask = jnp.ones((B, D))

    mi_info = float(mutual_information_kde(params, 10.0 * x, mask, cfg))
    mi_const = float(mutual_information_kde(params, 0.0 * x, mask, cfg))
    assert np.isfinite(mi_info) and np.isfinite(mi_const)
    assert mi_info > mi_const
    # pre-LOO, measured: info=-3.58 (sign flipped!), const=-2.39; post-LOO
    # info=+2.98, const=+1.50 (the residual is KDE finite-sample bias at
    # B=16, D=8 — shared by both cases, so the ordering is trustworthy)
    assert mi_const > -1.0 and mi_info > 0.0


def test_gaussian_kde_scott_scale_equivariance():
    """Scott's rule is per-dimension (h_j = sigma_j * n^(-1/(d+4))): scaling
    the data by `a` must shift the log-density by exactly -sum(log a_j)
    (change of variables), which only holds when the bandwidth tracks the
    data scale — pre-fix a collapsed/wide dim was over/under-smoothed."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_posterior_consistency_tpu.nn import tensor_utils as tu

    z = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    q = jax.random.normal(jax.random.PRNGKey(3), (5, 3)) * 0.5
    a = jnp.asarray([0.1, 1.0, 3.0])
    base = tu.gaussian_kde_log_eval(z, q)
    scaled = tu.gaussian_kde_log_eval(z * a, q * a)
    np.testing.assert_allclose(np.asarray(scaled),
                               np.asarray(base - jnp.sum(jnp.log(a))),
                               rtol=1e-5, atol=1e-5)


def test_train_resume_final_boundary_not_multiple(tiny_dataset, tmp_path):
    """The final resume state is written even when cfg.epoch is NOT a
    multiple of checkpoint_every (code-review r5): a later higher-epoch run
    must resume from the true end, not the last multiple."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.engine import checkpoint
    from vae_posterior_consistency_tpu.engine import train as T

    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small", epoch=5,
                    batch_size=32, latent_dim=4)
    ds = loaders.data_loader(tiny_dataset, cfg.vae_type, 30, 32, "synth_small")
    T.train(ds, cfg, experiments_root=str(tmp_path), checkpoint_every=2)
    rp = checkpoint.checkpoint_path(cfg, str(tmp_path)) + ".resume.pt"
    assert os.path.exists(rp)
    # read back the epoch counter: it must be 5, not 4
    from vae_posterior_consistency_tpu.models import get_model
    import optax

    from vae_posterior_consistency_tpu.engine.train import LEARNING_RATE

    model = get_model(cfg)
    tmpl_p = model.init(jax.random.PRNGKey(0), cfg, ds.obs_dim)
    tmpl_o = optax.adam(LEARNING_RATE).init(tmpl_p)
    _, _, done = checkpoint.load_resume(
        tmpl_p, tmpl_o, rp,
        tag=f"run:{cfg.vae_type}:seed={cfg.seed}:batch={cfg.batch_size}")
    assert done == 5


def test_load_resume_rejects_mismatched_tag(tiny_dataset, tmp_path):
    """A .resume.pt written under one sweep identity refuses to load under
    another (code-review r5: same shapes, different sweep VALUES would
    silently continue a mismatched state)."""
    import optax
    import pytest

    from vae_posterior_consistency_tpu.engine import checkpoint
    from vae_posterior_consistency_tpu.engine.train import LEARNING_RATE
    from vae_posterior_consistency_tpu.models import get_model

    cfg = RunConfig(vae_type="reg_vae1", reg_type="kl_reg", latent_dim=4)
    model = get_model(cfg)
    p = model.init(jax.random.PRNGKey(0), cfg, 6)
    o = optax.adam(LEARNING_RATE).init(p)
    path = str(tmp_path / "x.resume.pt")
    checkpoint.save_resume(p, o, 3, path, tag="alpha:0.5,1.0:seed=0")
    # same tag loads
    _, _, done = checkpoint.load_resume(p, o, path,
                                        tag="alpha:0.5,1.0:seed=0")
    assert done == 3
    # different sweep values refuse
    with pytest.raises(RuntimeError, match="different sweep values"):
        checkpoint.load_resume(p, o, path, tag="alpha:1.0,2.0:seed=0")


def test_train_resume_rejects_smaller_epoch_budget(tiny_dataset, tmp_path):
    """Resuming a completed (or further-along) run under a SMALLER -epoch
    must fail loudly (code-review r5): the filename encodes no epoch count,
    so without the guard the over-trained params would be republished —
    with zero training — under the smaller budget's labels."""
    import pytest

    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.engine import train as T

    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small", epoch=6,
                    batch_size=32, latent_dim=4)
    ds = loaders.data_loader(tiny_dataset, cfg.vae_type, 30, 32, "synth_small")
    T.train(ds, cfg, experiments_root=str(tmp_path), checkpoint_every=3)
    with pytest.raises(RuntimeError, match="already trained"):
        T.train(ds, cfg.replace(epoch=4), experiments_root=str(tmp_path),
                resume=True)
    # equal budget is fine (idempotent re-publish of the finished run)
    T.train(ds, cfg, experiments_root=str(tmp_path), resume=True)


def test_train_resume_rejects_changed_seed_or_batch(tiny_dataset, tmp_path):
    """The serial/sharded resume tag carries seed and batch_size — neither
    is in the checkpoint filename, so `-resume true` after changing either
    must refuse instead of silently continuing the old run's state under
    the new labels (code-review r5)."""
    import pytest

    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.engine import train as T

    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small", epoch=4,
                    batch_size=32, latent_dim=4, seed=0)
    ds = loaders.data_loader(tiny_dataset, cfg.vae_type, 30, 32, "synth_small")
    T.train(ds, cfg.replace(epoch=2), experiments_root=str(tmp_path),
            checkpoint_every=2)
    with pytest.raises(RuntimeError, match="different sweep values"):
        T.train(ds, cfg.replace(seed=1), experiments_root=str(tmp_path),
                resume=True)
    with pytest.raises(RuntimeError, match="different sweep values"):
        T.train(ds, cfg.replace(batch_size=16), experiments_root=str(tmp_path),
                resume=True)


def test_ensemble_checkpoint_every_requires_resume_path(tiny_dataset):
    """checkpoint_every/resume without resume_path on the ensemble trainers
    raises instead of silently writing no checkpoints (code-review r5)."""
    import pytest

    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.parallel import sweep

    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small", epoch=2,
                    batch_size=32, latent_dim=4)
    ds = loaders.data_loader(tiny_dataset, cfg.vae_type, 30, 32, "synth_small")
    with pytest.raises(ValueError, match="resume_path"):
        sweep.train_seed_ensemble(ds, cfg, seeds=[0, 1], checkpoint_every=1)


def test_checkpoint_every_does_not_change_early_stopping(tiny_dataset,
                                                         tmp_path):
    """checkpoint_every is a pure-restartability knob: with early stopping
    active it must not change which epochs are validated — and therefore
    which parameters the run produces (code-review r5: the chunk clamp used
    to quadruple the validation cadence)."""
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.engine import train as T
    from vae_posterior_consistency_tpu.utils.early_stopping import (
        EarlyStopping,
    )

    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small", epoch=8,
                    batch_size=32, latent_dim=4)
    ds = loaders.data_loader(tiny_dataset, cfg.vae_type, 30, 32, "synth_small")
    p_plain, h_plain = T.train(ds, cfg, experiments_root=str(tmp_path / "a"),
                               chunk_epochs=4, save=False,
                               early_stopping=EarlyStopping(patience=1))
    p_ckpt, h_ckpt = T.train(ds, cfg, experiments_root=str(tmp_path / "b"),
                             chunk_epochs=4, checkpoint_every=1, save=False,
                             early_stopping=EarlyStopping(patience=1))
    # same stopping epoch (the cadence contract), same training trajectory
    # (up to FP reassociation across differently-sized chunk programs)
    assert len(h_plain) == len(h_ckpt)
    np.testing.assert_allclose(h_plain, h_ckpt, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_plain),
                    jax.tree_util.tree_leaves(p_ckpt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_save_many_roundtrips_each_replica(tmp_path):
    """checkpoint.save_many (the threaded ensemble save path, VERDICT r4
    item 4) writes every (params, path) pair identically to a serial
    checkpoint.save: each file loads back bit-equal to its replica."""
    import numpy as np

    from vae_posterior_consistency_tpu.engine import checkpoint
    from vae_posterior_consistency_tpu.models import get_model

    cfg = RunConfig(vae_type="vanilla_vae1", latent_dim=4)
    model = get_model(cfg)
    replicas = [model.init(jax.random.PRNGKey(s), cfg, 6) for s in range(5)]
    pairs = [(jax.device_get(p), str(tmp_path / f"r{s}.pt"))
             for s, p in enumerate(replicas)]
    checkpoint.save_many(pairs)
    for (p, path), orig in zip(pairs, replicas):
        got = checkpoint.load(orig, path)
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(orig)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restrict_grid_records_modes():
    """config.restrict_grid_records — the ensemble-mode `-vae_type`
    contract shared by all three entry points (PARITY.md round-5 note):
    record[0]'s own default passes the full grid through, any other grid
    vae_type restricts to exactly its record (so the ensemble trains under
    THAT record's defaults, not record[0]'s), and a non-grid vae_type is a
    hard SystemExit instead of silently training a custom config under
    every record's unrelated defaults."""
    import pytest

    from vae_posterior_consistency_tpu.config import restrict_grid_records
    from vae_posterior_consistency_tpu.data.default_configs import (
        mcar_records,
    )

    records = mcar_records()

    class _Probe:
        def __init__(self, vt):
            self.vae_type = vt

    # record[0]'s own default: full grid unchanged (the undetectable-edge
    # case documented in the docstring)
    assert restrict_grid_records(records, _Probe(
        records[0]["vae_type"]["default"])) is records

    # a non-first grid vae_type: exactly its own record(s), defaults intact
    target = records[3]["vae_type"]["default"]
    got = restrict_grid_records(records, _Probe(target))
    assert [r["vae_type"]["default"] for r in got] == [
        r["vae_type"]["default"] for r in records
        if r["vae_type"]["default"] == target]
    assert got[0] is records[3]

    # not a grid record at all: SystemExit with the -ensemble hint
    with pytest.raises(SystemExit, match="not a grid record"):
        restrict_grid_records(records, _Probe("no_such_vae_type"))
