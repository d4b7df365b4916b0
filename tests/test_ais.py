"""AIS+HMC estimator: schedules, and logZ accuracy on a tractable model
(reference behavior: src/utils/AIS.py:19-305)."""

import jax
import jax.numpy as jnp
import numpy as np

from vae_posterior_consistency_tpu.engine import ais


def test_linear_schedule():
    s = ais.linear_schedule(5)
    np.testing.assert_allclose(s, [0, 0.25, 0.5, 0.75, 1.0])


def test_sigmoidial_schedule_endpoints():
    s = ais.sigmoidial_schedule(50)
    assert abs(s[0]) < 1e-12 and abs(s[-1] - 1.0) < 1e-12
    assert np.all(np.diff(s) > 0)


def test_ais_recovers_tractable_logz():
    """Linear-Gaussian model: x = A z + noise, with exact marginal likelihood.

    p(z) = N(0, I_L); p(x|z) = N(A z, s^2 I_D)  =>
    p(x) = N(0, A A^T + s^2 I_D) — AIS must land near the closed form.
    """
    L, D, s = 2, 3, 0.5
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(L, D)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(4, D)) * 0.8, jnp.float32)

    def decoder_fn(z):
        return z @ A, jnp.full((z.shape[0], D), 2.0 * np.log(s))

    res = ais.ais_batch(decoder_fn, x, n_sample=64, latent_dim=L,
                        schedule=ais.linear_schedule(150),
                        key=jax.random.PRNGKey(0))
    # closed-form log p(x) WITHOUT the 2pi constants (ais uses constant-free
    # log-normals for both prior and likelihood; the -D/2 log(2pi) of the
    # likelihood and the marginal cancel; what remains of the difference is
    # the quadratic form + logdets)
    cov = np.asarray(A).T @ np.asarray(A) + s**2 * np.eye(D)
    xs = np.asarray(x)
    # AIS target: log int p(z) p(x|z)^1 dz with constant-free densities
    #   = log N_full(x; 0, cov) + D/2 log(2pi) [likelihood const dropped]
    #     ... both prior and lik dropped their constants:
    # log f_1(z) = -1/2(z'z + ||x-Az||^2/s^2 + D log s^2)
    # => logZ = log \int ... dz = log N(x;0,cov) + (D+L)/2 log(2pi) - L/2 log(2pi)
    #         = log N(x;0,cov) + D/2 log(2pi)
    sign, logdet = np.linalg.slogdet(cov)
    quad = np.einsum("bi,ij,bj->b", xs, np.linalg.inv(cov), xs)
    expected = float(np.mean(-0.5 * (quad + logdet)))
    assert abs(res.logw - expected) < 0.35, (res.logw, expected)


def test_bdmc_sandwich_brackets_tractable_logz():
    """BDMC on the linear-Gaussian model: the forward bound must sit below
    (within MC noise) and the reverse bound above the closed-form log p of
    the SIMULATED batch, with a tight gap — the sandwich certifying the
    schedule (engine/ais.bdmc; the reference ships only BDMC's schedule,
    src/utils/AIS.py:65-77, never the bound)."""
    L, D, s = 2, 3, 0.5
    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.normal(size=(L, D)), jnp.float32)

    def decoder_fn(z):
        return z @ A, jnp.full((z.shape[0], D), 2.0 * np.log(s))

    res = ais.bdmc(decoder_fn, n_batch=4, n_sample=64, latent_dim=L,
                   schedule=ais.linear_schedule(150),
                   key=jax.random.PRNGKey(0))
    # closed form on the simulated rows, same constant-free convention as
    # test_ais_recovers_tractable_logz
    cov = np.asarray(A).T @ np.asarray(A) + s**2 * np.eye(D)
    _, logdet = np.linalg.slogdet(cov)
    quad = np.einsum("bi,ij,bj->b", res.x_sim, np.linalg.inv(cov), res.x_sim)
    expected = float(np.mean(-0.5 * (quad + logdet)))
    mc_tol = 0.25  # per-bound MC slack at 64 chains x 150 temps
    assert res.lower <= expected + mc_tol, (res.lower, expected)
    assert res.upper >= expected - mc_tol, (res.upper, expected)
    assert res.gap >= -2 * mc_tol
    assert res.gap < 1.0, f"sandwich too loose: {res}"


def test_bdmc_gap_shrinks_with_schedule_length():
    """More bridge temperatures must tighten (or hold) the sandwich — the
    property that makes the gap a schedule-accuracy certificate."""
    L, D, s = 2, 3, 0.5
    rng = np.random.default_rng(4)
    A = jnp.asarray(rng.normal(size=(L, D)), jnp.float32)

    def decoder_fn(z):
        return z @ A, jnp.full((z.shape[0], D), 2.0 * np.log(s))

    gaps = [
        ais.bdmc(decoder_fn, n_batch=4, n_sample=32, latent_dim=L,
                 schedule=ais.linear_schedule(T),
                 key=jax.random.PRNGKey(1)).gap
        for T in (10, 150)
    ]
    assert gaps[1] < gaps[0] + 0.1, gaps


def test_bdmc_flag_is_ais_entry_only():
    """-bdmc belongs to the ais_eval parser alone (title-gated in
    config.setup_parser); the other entries keep the reference flag surface
    plus the documented framework extensions."""
    from vae_posterior_consistency_tpu.config import setup_parser

    record = {"vae_type": {"default": "vanilla_vae1", "help": ""}}
    ais_args = setup_parser(record, "ais_eval").parse_args(["-bdmc", "true"])
    assert ais_args.bdmc is True
    assert (setup_parser(record, "ais_eval").parse_args([]).bdmc is False)
    impute = setup_parser(record, "impute_eval").parse_args([])
    assert not hasattr(impute, "bdmc")


def test_ais_student_t_bridge_recovers_tractable_logz():
    """Student-t bridge (the MIWAE likelihood, full density, fat-tailed
    df=5) on a 1-D latent model, where log p(x) = log ∫ N(z) ∏_d t(x_d; z
    a_d, s, df) dz is computable by dense numerical integration. Pins the
    'exact' convention: the Student-t bridge's logw IS log p(x), constants
    included (unlike the constant-free Gaussian bridge)."""
    import math

    from vae_posterior_consistency_tpu.ops.math import student_t_logpdf

    L, D, s, df = 1, 2, 0.5, 5.0
    rng = np.random.default_rng(5)
    a = rng.normal(size=(L, D))
    A = jnp.asarray(a, jnp.float32)
    x = jnp.asarray(rng.normal(size=(4, D)) * 0.8, jnp.float32)

    def log_lik_fn(z, x_rep):
        return jnp.sum(
            student_t_logpdf(x_rep, z @ A, jnp.float32(s), jnp.float32(df)),
            axis=-1)

    res = ais.ais_batch(None, x, n_sample=64, latent_dim=L,
                        schedule=ais.linear_schedule(150),
                        key=jax.random.PRNGKey(0), log_lik_fn=log_lik_fn)

    # float64 ground truth on a dense z-grid
    zg = np.linspace(-8.0, 8.0, 4001)[:, None]  # [G, 1]
    log_prior = -0.5 * zg[:, 0] ** 2 - 0.5 * np.log(2.0 * np.pi)
    y = (np.asarray(x)[None, :, :] - (zg @ a)[:, None, :]) / s  # [G, B, D]
    log_t = (math.lgamma(0.5 * (df + 1.0)) - math.lgamma(0.5 * df)
             - 0.5 * np.log(df * np.pi) - np.log(s)
             - 0.5 * (df + 1.0) * np.log1p(y**2 / df))
    integrand = log_prior[:, None] + log_t.sum(-1)  # [G, B]
    m = integrand.max(0)
    log_px = m + np.log(np.trapezoid(np.exp(integrand - m), zg[:, 0],
                                     axis=0))
    expected = float(np.mean(log_px))
    assert abs(res.logw - expected) < 0.35, (res.logw, expected)


def _tiny_dataset(D=5, n=6):
    from vae_posterior_consistency_tpu.data.loaders import Dataset, Split

    x_tr = jax.random.uniform(jax.random.PRNGKey(1), (n, D))
    m = jnp.ones((n, D))
    return Dataset(train=Split(x_tr, m, "train"), test=None, obs_dim=D)


def test_ais_and_bdmc_run_for_every_family():
    """eval_ais / eval_bdmc accept every vae_type via its bridge likelihood
    (VERDICT r3 item 1; the reference driver is checkpoint-agnostic,
    src/utils/AIS.py:120,135): Gaussian bridges for gauss/flow/notMIWAE,
    Student-t for MIWAE."""
    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.models import get_model

    ds = _tiny_dataset()
    for vt in ("vanilla_vae1", "reg_flow1", "vanilla_notMIWAE1", "MIWAE1"):
        cfg = RunConfig(vae_type=vt, data_type="synth_small", latent_dim=3,
                        n_ais_dist=10, ais_schedule="linear")
        model = get_model(cfg)
        params = model.init(jax.random.PRNGKey(0), cfg, ds.obs_dim)
        r = ais.eval_ais(ds, cfg, params=params, n_sample=4, save=False)
        assert np.isfinite(r["train"].logw), vt
        assert r["train"].latents.shape == (6, 4, 3), vt
        bd = ais.eval_bdmc(ds, cfg, params=params, n_sample=4, n_batch=3,
                           save=False)
        assert np.isfinite(bd.lower) and np.isfinite(bd.upper), vt


def test_ais_ensemble_matches_serial_nongauss():
    """The vmapped [S]-replica runner keys per-family (bridge singletons):
    replica 0 of a MIWAE ensemble must reproduce serial eval_ais exactly,
    as the gauss family already pins."""
    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.models import get_model

    ds = _tiny_dataset()
    cfg = RunConfig(vae_type="MIWAE1", data_type="synth_small", latent_dim=3,
                    n_ais_dist=10, ais_schedule="linear")
    model = get_model(cfg)
    replicas = [model.init(jax.random.PRNGKey(s), cfg, ds.obs_dim)
                for s in (0, 7)]
    params_ens = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *replicas)
    ens = ais.eval_ais_ensemble(ds, cfg, params_ens, n_sample=4, save=False)
    for s, p_s in enumerate(replicas):
        serial = ais.eval_ais(ds, cfg, params=p_s, n_sample=4, save=False)
        np.testing.assert_allclose(ens["train"].logw[s],
                                   serial["train"].logw, rtol=1e-5,
                                   atol=1e-5, err_msg=f"s{s}")


def test_ais_latents_shape():
    def decoder_fn(z):
        return z[:, :1] * 0.0, jnp.zeros((z.shape[0], 1))

    x = jnp.zeros((3, 1))
    res = ais.ais_batch(decoder_fn, x, n_sample=8, latent_dim=2,
                        schedule=ais.linear_schedule(10),
                        key=jax.random.PRNGKey(1))
    assert res.latents.shape == (3, 8, 2)


def test_ais_mesh_matches_single_device():
    """dp-sharding the independent AIS chains must reproduce the
    single-device estimate (same keys, row-independent math)."""
    import jax

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    import jax.numpy as jnp
    import numpy as np

    from vae_posterior_consistency_tpu.engine import ais
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib

    latent, D, n = 3, 4, 6
    key = jax.random.PRNGKey(0)
    W = jax.random.normal(key, (latent, D)) * 0.5

    def decoder_fn(z):
        return z @ W, jnp.full((z.shape[0], D), -1.0)

    x = jax.random.normal(jax.random.PRNGKey(1), (n, D))
    sched = ais.linear_schedule(20)
    r_ref = ais.ais_batch(decoder_fn, x, 8, latent, sched,
                          jax.random.PRNGKey(2))
    mesh = meshlib.make_mesh(jax.devices()[:8])
    r_mesh = ais.ais_batch(decoder_fn, x, 8, latent, sched,
                           jax.random.PRNGKey(2), mesh=mesh)
    np.testing.assert_allclose(r_mesh.logw, r_ref.logw, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(r_mesh.latents, r_ref.latents, rtol=1e-3,
                               atol=1e-4)


def test_ais_ensemble_matches_serial(tmp_path):
    """eval_ais_ensemble (one vmapped [S]-replica program per split) must
    reproduce per-replica eval_ais exactly: same chains, same z0/HMC keys,
    replicas differ only by decoder parameters. Seed-0 artifacts land at
    the reference paths; extra seeds under .seed{s}."""
    import os

    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.data.loaders import Dataset, Split
    from vae_posterior_consistency_tpu.models import get_model

    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small",
                    latent_dim=3, n_ais_dist=15, ais_schedule="linear")
    model = get_model(cfg)
    D = 5
    x_tr = jax.random.uniform(jax.random.PRNGKey(1), (6, D))
    x_te = jax.random.uniform(jax.random.PRNGKey(2), (4, D))
    m = jnp.ones((6, D))
    ds = Dataset(train=Split(x_tr, m, "train"),
                 test=Split(x_te, m[:4], "test"), obs_dim=D)
    replicas = [model.init(jax.random.PRNGKey(s), cfg, D) for s in (0, 7)]
    params_ens = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *replicas)

    ens = ais.eval_ais_ensemble(ds, cfg, params_ens, n_sample=8,
                                experiments_root=str(tmp_path))
    # eval_ais computes BOTH splits per call — run it once per replica
    # outside the stage loop (it was inside, doubling the AIS work)
    serial_by_seed = [ais.eval_ais(ds, cfg, params=p_s, n_sample=8,
                                   save=False) for p_s in replicas]
    for stage in ("train", "test"):
        assert ens[stage].logw.shape == (2,)
        for s, serial in enumerate(serial_by_seed):
            np.testing.assert_allclose(ens[stage].logw[s],
                                       serial[stage].logw, rtol=1e-5,
                                       atol=1e-5, err_msg=f"{stage}/s{s}")
            np.testing.assert_allclose(ens[stage].latents[s],
                                       serial[stage].latents, rtol=1e-4,
                                       atol=1e-5)
    base = os.path.join(str(tmp_path), cfg.vae_type, cfg.data_type, "elbos",
                        f"{cfg.missing_rate}_missing", f"{cfg.epoch}_epochs")
    assert os.path.exists(os.path.join(base, "train_ais.pt"))
    assert os.path.exists(os.path.join(base, "train_ais.pt.seed1"))


def test_ais_ensemble_mesh_matches_unsharded(tmp_path):
    """-seeds x -mesh composition on ais_eval.py: the [S]-replica vmapped
    AIS program dp-shards its chains exactly like the single-seed path
    (params gain only a replicated [S] axis); the estimates must match the
    unsharded ensemble run."""
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")

    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.data.loaders import Dataset, Split
    from vae_posterior_consistency_tpu.models import get_model
    from vae_posterior_consistency_tpu.parallel import mesh as meshlib

    cfg = RunConfig(vae_type="vanilla_vae1", data_type="synth_small",
                    latent_dim=3, n_ais_dist=12, ais_schedule="linear")
    model = get_model(cfg)
    D = 5
    x_tr = jax.random.uniform(jax.random.PRNGKey(1), (6, D))
    m = jnp.ones((6, D))
    ds = Dataset(train=Split(x_tr, m, "train"), test=None, obs_dim=D)
    replicas = [model.init(jax.random.PRNGKey(s), cfg, D) for s in (0, 7)]
    params_ens = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *replicas)

    ref = ais.eval_ais_ensemble(ds, cfg, params_ens, n_sample=8, save=False)
    mesh = meshlib.make_mesh(jax.devices()[:8])
    out = ais.eval_ais_ensemble(ds, cfg, params_ens, n_sample=8, save=False,
                                mesh=mesh)
    np.testing.assert_allclose(out["train"].logw, ref["train"].logw,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out["train"].latents, ref["train"].latents,
                               rtol=1e-3, atol=1e-4)


def test_record_selection_matches_requested_vae_type(tmp_path):
    """ais_eval.py derives its checkpoint-path defaults (missing_rate,
    epochs, data_type) from the grid record matching `-vae_type`, not from
    record[0] (a reg_MIWAE config at missing_rate=50) — otherwise the
    documented `-vae_type vanilla_vae1` example looks for a checkpoint the
    imputation grid never wrote. The request is resolved by a probe
    argparse pass, so `-vae_type=x` and unambiguous abbreviations work."""
    import importlib

    from vae_posterior_consistency_tpu.config import (
        iter_jsonl_configs,
        setup_parser,
    )
    from vae_posterior_consistency_tpu.data.default_configs import (
        write_default_configs,
    )

    mod = importlib.import_module("experiment_main.ais_eval")
    write_default_configs(str(tmp_path))
    records = list(
        iter_jsonl_configs(str(tmp_path / "imputation_args.json")))
    assert records[0]["vae_type"]["default"] != "vanilla_vae1"

    rec = mod._record_for_vae_type(records, "vanilla_vae1")
    assert rec["vae_type"]["default"] == "vanilla_vae1"
    assert rec["missing_rate"]["default"] == 30
    # a vae_type outside the grid falls back to record[0] (CLI overrides
    # still apply on the real parse, same as before the fix)
    assert mod._record_for_vae_type(records, "nope") is records[0]

    # the probe pass hands argparse the resolution: every spelling the
    # reference flag contract accepts lands on the same record
    parser = setup_parser(records[0], "ais_eval")
    for argv in (["-vae_type", "vanilla_vae1"], ["-vae_type=vanilla_vae1"],
                 ["-vae", "vanilla_vae1"]):
        probe = parser.parse_args(argv)
        assert (mod._record_for_vae_type(records, probe.vae_type)
                ["vae_type"]["default"] == "vanilla_vae1")
