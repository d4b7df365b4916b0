"""Annealed importance sampling with HMC transitions for marginal likelihood.

Rebuild of the reference's AIS library (reference: src/utils/AIS.py:19-305):
geometric bridge log f_t(z) = log p(z) + t * log p(x|z), per-temperature HMC
(L=10 leapfrog), adaptive step size (x1.02 / x0.98 targeting 0.65 acceptance,
clamped to [1e-4, 0.5]), IWAE-style log-mean-exp over n_sample chains.
Like the reference, it is a library entry (not wired into the main run.sh flow).

TPU-first: the temperature loop is a `lax.scan`, gradients come from `jax.grad`
of the potential, and all `n_sample` chains for a batch run as one [B*n, L]
tensor — no Python loops on the hot path.

Family coverage: the reference's `ais_trajectory` drives whatever checkpoint
`model_loader` returns through `model.decoder(z)` with a Gaussian likelihood
(AIS.py:120,135,125-140). Here the observation ("bridge") likelihood is
pluggable per family (`bridge_for`): fixed-logvar Gaussian for the gauss
family (VAE.py:379), fixed obs_logvar=-8 Gaussian for the flow family
(VAE.py:1874,1946-1947), learned-variance Gaussian for notMIWAE
(VAE.py:2768-2776, both 'changed' and 'author' decoder variants), and the
Student-t likelihood for MIWAE (VAE.py:3061-3066) — so eval_ais /
eval_ais_ensemble / eval_bdmc run for every vae_type.

Parity notes:
- Gaussian log-densities drop the constant, exactly as the reference's
  `log_normal` (AIS.py:32-46), so Gaussian-bridge logw estimates
  log p(x) + D/2 log 2pi. The Student-t bridge has no such reference
  convention and uses the exact density: MIWAE logw IS log p(x).
- Deviation (documented intent): the annealed term uses +t*log p(x|z). The
  reference multiplies the *negative* log-likelihood by t (AIS.py:125-140 calls
  neg_gaussian_log_likelihood), flipping the bridge's sign; we implement the
  BDMC form its docstring states.
- Gradient clamp to [-1e4, 1e4] kept (AIS.py:196).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.models import (
    flow_vae,
    gauss,
    get_model,
    layers,
)
from vae_posterior_consistency_tpu.ops.math import student_t_logpdf


def linear_schedule(T: int) -> np.ndarray:
    """(reference: AIS.py:19-20)."""
    return np.linspace(0.0, 1.0, T)


def sigmoidial_schedule(T: int, delta: float = 4.0) -> np.ndarray:
    """Sigmoidal temperature schedule from BDMC §6 (reference: AIS.py:65-77)."""

    def sigmoid(x):
        return np.exp(x) / (1.0 + np.exp(x))

    def beta_tilde(t):
        return sigmoid(delta * (2.0 * t / T - 1.0))

    t = np.arange(1, T + 1, dtype=np.float64)
    return (beta_tilde(t) - beta_tilde(1)) / (beta_tilde(T) - beta_tilde(1))


def _log_normal_nc(x, mean=None, logvar=None):
    """log N without the constant (reference: AIS.py:32-46)."""
    if mean is None:
        mean = jnp.zeros_like(x)
    if logvar is None:
        logvar = jnp.zeros_like(x)
    return -0.5 * jnp.sum(logvar + jnp.square(x - mean) * jnp.exp(-logvar),
                          axis=1)


# ---------------------------------------------------------------------------
# Per-family bridge likelihoods
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BridgeLik:
    """A model family's observation likelihood as AIS sees it.

    log_lik(params, z, x) -> [B] log p(x|z) (the bridge's annealed term);
    sample_x(params, z, key) -> x ~ p(x|z) (BDMC simulation).
    `convention` records the logw offset: 'gauss_nc' estimates
    log p(x) + D/2 log 2pi (reference AIS.py:32-46 constant-free normals);
    'exact' estimates log p(x) itself (Student-t, full density)."""

    family: str
    log_lik: Callable
    sample_x: Callable
    convention: str


def _gaussian_ll_from(decode):
    def log_lik(params, z, x):
        mean, logvar = decode(params, z)
        return _log_normal_nc(x, mean, jnp.broadcast_to(logvar, mean.shape))

    return log_lik


def _gaussian_sample_from(decode):
    def sample_x(params, z, key):
        mean, logvar = decode(params, z)
        logvar = jnp.broadcast_to(logvar, mean.shape)
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(key,
                                                                mean.shape)

    return sample_x


def _notmiwae_decode_changed(params, z):
    return layers.notmiwae_decoder_apply(params["decoder"], z,
                                         variant="changed")


def _notmiwae_decode_author(params, z):
    return layers.notmiwae_decoder_apply(params["decoder"], z,
                                         variant="author")


def _miwae_log_lik(params, z, x):
    """Exact Student-t log p(x|z) (reference decoder: VAE.py:3061-3066)."""
    mean, scale, df = layers.student_t_decoder_apply(params["decoder"], z)
    return jnp.sum(student_t_logpdf(x, mean, scale, df), axis=-1)


def _miwae_sample_x(params, z, key):
    mean, scale, df = layers.student_t_decoder_apply(params["decoder"], z)
    return mean + scale * jax.random.t(key, df, mean.shape)


_BRIDGES = {
    ("gauss",): BridgeLik("gauss", _gaussian_ll_from(gauss.decode),
                          _gaussian_sample_from(gauss.decode), "gauss_nc"),
    ("flow",): BridgeLik("flow", _gaussian_ll_from(flow_vae.decode),
                         _gaussian_sample_from(flow_vae.decode), "gauss_nc"),
    ("notmiwae", "changed"): BridgeLik(
        "notmiwae", _gaussian_ll_from(_notmiwae_decode_changed),
        _gaussian_sample_from(_notmiwae_decode_changed), "gauss_nc"),
    ("notmiwae", "author"): BridgeLik(
        "notmiwae", _gaussian_ll_from(_notmiwae_decode_author),
        _gaussian_sample_from(_notmiwae_decode_author), "gauss_nc"),
    ("miwae",): BridgeLik("miwae", _miwae_log_lik, _miwae_sample_x, "exact"),
}


def bridge_for(cfg: RunConfig) -> BridgeLik:
    """The AIS observation likelihood for cfg's model family. Returns module
    singletons so the lru-cached jitted ensemble runners key by identity."""
    model = get_model(cfg)
    if model.name == "notmiwae":
        return _BRIDGES[("notmiwae", getattr(cfg, "not_miwae_type",
                                             "changed"))]
    return _BRIDGES[(model.name,)]


#: flow-family bridge floor: the measured BDMC curve for the flow
#: checkpoints' obs_logvar=-8 likelihood (sigmoidal gaps: ~2.5 nats at
#: T=1000, ~0.68 at T=2000, ~0.069 at T=4000 — RESULTS.md "AIS/BDMC
#: schedule certification" + round-5 follow-up) closes only around T=4000;
#: the Gaussian-certified default T=500 is far too loose there
FLOW_MIN_AIS_DIST = 4000


def default_schedule(cfg: RunConfig, bridge: BridgeLik | None = None,
                     warn: bool = True):
    """cfg's (ais_schedule, n_ais_dist) bridge schedule.

    The T=500 sigmoidal default is BDMC-certified only for Gaussian-decoder
    checkpoints (<0.01-nat sandwich gap); the flow family's obs_logvar=-8
    likelihood is a much harder bridge whose measured sigmoidal gaps are
    ~2.5 nats at T=1000, ~0.68 at T=2000 and ~0.069 at T=4000 (RESULTS.md).
    When a flow checkpoint would silently run on a sub-certified
    temperature count, warn loudly (ADVICE r4 #2) — pass an explicit
    `schedule` (or raise -n_ais_dist) to size the bridge deliberately;
    `ais_eval.py -bdmc true` measures the actual gap."""
    if (warn and bridge is not None and bridge.family == "flow"
            and cfg.n_ais_dist < FLOW_MIN_AIS_DIST):
        print(
            f"[ais] WARNING: flow-family checkpoint on a "
            f"{cfg.ais_schedule} T={cfg.n_ais_dist} bridge — certified only "
            f"for Gaussian decoders; the flow likelihood's measured BDMC "
            f"gap is ~2.5 nats at T=1000 / ~0.7 at T=2000, closing "
            f"(~0.07) only at sigmoidal T={FLOW_MIN_AIS_DIST}. Raise "
            f"-n_ais_dist (and run ais_eval.py -bdmc true to measure the "
            "remaining gap).",
            flush=True,
        )
    return (linear_schedule(cfg.n_ais_dist) if cfg.ais_schedule == "linear"
            else sigmoidial_schedule(cfg.n_ais_dist))


@dataclasses.dataclass
class AISResult:
    logw: float  # mean log marginal-likelihood estimate
    latents: np.ndarray  # final chain positions [B, n_sample, L]


def _prep_chains(x, n_sample: int, latent_dim: int, schedule, key, mesh,
                 z_init=None):
    """Shared chain setup for ais_batch and eval_ais_ensemble: mesh
    chain-count padding, chain replication, z0/HMC key derivation, and dp
    sharding. One definition keeps the single and ensemble paths'
    PRNG/padding byte-identical (replica 0 of the ensemble must reproduce
    eval_ais — tests/test_ais.py::test_ais_ensemble_matches_serial).
    With `z_init` [B0, L] (reverse AIS / BDMC), chains start at those exact
    latents instead of fresh prior draws.
    Returns (x_rep [B, D], z0 [B, L], keys, B0_run)."""
    B0 = x.shape[0]
    B0_run = B0
    if mesh is not None:
        # even-shard requirement: pad data rows until the chain count
        # divides dp; padded rows' chains are dropped before the bound
        dp = mesh.shape["dp"]
        while (B0_run * n_sample) % dp:
            B0_run += 1
        if B0_run != B0:
            x = jnp.concatenate(
                [x, jnp.zeros((B0_run - B0, x.shape[1]), x.dtype)])
            if z_init is not None:
                z_init = jnp.concatenate(
                    [z_init,
                     jnp.zeros((B0_run - B0, latent_dim), z_init.dtype)])
    B = B0_run * n_sample
    x_rep = jnp.tile(x, (n_sample, 1))
    k_init, k_scan = jax.random.split(key)
    if z_init is None:
        z0 = jax.random.normal(k_init, (B, latent_dim))
    else:
        z0 = jnp.tile(z_init, (n_sample, 1))
    keys = jax.random.split(k_scan, len(schedule) - 1)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        x_rep = jax.device_put(x_rep, NamedSharding(mesh, P("dp", None)))
        z0 = jax.device_put(z0, NamedSharding(mesh, P("dp", None)))
    return x_rep, z0, keys, B0_run


def _chain_views(logw, z, n_sample: int, B0_run: int, B0: int,
                 latent_dim: int):
    """[..., B0_run*n_sample] chain outputs -> per-row views:
    (logw_mat [..., B0, n_sample], latents [..., B0, n_sample, L]).
    Padded rows (mesh even-shard fill) drop out here."""
    lead = logw.shape[:-1]
    logw_mat = jnp.moveaxis(
        logw.reshape(lead + (n_sample, B0_run)), -2, -1)[..., :B0, :]
    lats = jnp.moveaxis(
        z.reshape(lead + (n_sample, B0_run, latent_dim)), -3, -2
    )[..., :B0, :, :]
    return logw_mat, lats


def ais_batch(decoder_fn, x, n_sample: int, latent_dim: int, schedule, key,
              initial_eps: float = 0.01, leapfrog: int = 10,
              mesh=None, log_lik_fn=None) -> AISResult:
    """Run AIS for one batch of data.

    decoder_fn(z) -> (mean, logvar): a Gaussian observation decoder
    (reference uses model.decoder the same way, AIS.py:135). For a
    non-Gaussian bridge pass `log_lik_fn(z, x_rep) -> [B]` instead and
    decoder_fn=None (eval_ais routes every family through here via
    bridge_for).

    With `mesh`, the B0*n_sample independent chains dp-shard across the mesh
    (rows never interact until the final host-side logsumexp), so the whole
    temperature scan partitions with zero collectives.
    """
    B0 = x.shape[0]
    schedule = jnp.asarray(schedule, jnp.float32)
    x_rep, z0, keys, B0_run = _prep_chains(x, n_sample, latent_dim,
                                           schedule, key, mesh)
    if log_lik_fn is None:
        log_lik_fn = _gaussian_ll_from(lambda _p, z: decoder_fn(z))
        ll = functools.partial(log_lik_fn, None)
    else:
        ll = log_lik_fn
    logw, z = _ais_chain(lambda z: ll(z, x_rep), z0, schedule, keys,
                         initial_eps, leapfrog)
    # IWAE-style bound over chains (reference: AIS.py:219-220)
    logw_mat, lats = _chain_views(logw, z, n_sample, B0_run, B0, latent_dim)
    lw = jax.scipy.special.logsumexp(logw_mat, axis=-1) - jnp.log(n_sample)
    return AISResult(logw=float(jnp.mean(lw)), latents=np.asarray(lats))


@dataclasses.dataclass
class BDMCResult:
    lower: float  # forward-AIS stochastic lower bound on log p(x_sim)
    upper: float  # reverse-AIS stochastic upper bound on log p(x_sim)
    gap: float  # upper - lower; certifies schedule accuracy
    x_sim: np.ndarray  # the simulated batch [B, D]
    z_true: np.ndarray  # its exact posterior samples [B, L]


def bdmc(decoder_fn, n_batch: int, n_sample: int, latent_dim: int, schedule,
         key, initial_eps: float = 0.01, leapfrog: int = 10,
         mesh=None, log_lik_fn=None, sample_fn=None) -> BDMCResult:
    """Bidirectional Monte Carlo sandwich (Grosse et al. 2015) on data
    SIMULATED from the model itself.

    Forward AIS (prior -> posterior) gives a stochastic LOWER bound on
    log p(x_sim); reverse AIS, whose chains start at the exact posterior
    sample z_true that generated x_sim and anneal the bridge backwards
    (1 -> 0, so E[w_rev] = Z_0/Z_1 and -logmeanexp(w_rev) upper-bounds
    log Z_1/Z_0 by Jensen), gives a stochastic UPPER bound. The gap
    certifies the AIS schedule's accuracy for this decoder — the reference
    ships BDMC's sigmoidal schedule (src/utils/AIS.py:65-77, citing BDMC
    §6) but never the sandwich itself; this is the framework's completion
    of that machinery. Simulated data is REQUIRED: only there is an exact
    posterior sample available (the (z, x) pair from the generative roll).

    Gaussian bridges (decoder_fn) use the same constant-free log-densities
    as ais_batch, so the bounds bracket eval_ais's logw convention
    (log p(x) + D/2 log 2pi). Non-Gaussian families pass log_lik_fn /
    sample_fn (z, key) -> x instead (eval_bdmc wires them via bridge_for).
    """
    schedule = jnp.asarray(schedule, jnp.float32)
    k_sim, k_fwd, k_rev = jax.random.split(key, 3)
    kz, kx = jax.random.split(k_sim)
    z_true = jax.random.normal(kz, (n_batch, latent_dim))
    if sample_fn is None:
        mean, logvar = decoder_fn(z_true)
        logvar = jnp.broadcast_to(logvar, mean.shape)
        x = mean + jnp.exp(0.5 * logvar) * jax.random.normal(kx, mean.shape)
    else:
        x = sample_fn(z_true, kx)

    fwd = ais_batch(decoder_fn, x, n_sample, latent_dim, schedule, k_fwd,
                    initial_eps, leapfrog, mesh=mesh, log_lik_fn=log_lik_fn)

    if log_lik_fn is None:
        gauss_ll = _gaussian_ll_from(lambda _p, z: decoder_fn(z))
        log_lik_fn = functools.partial(gauss_ll, None)
    rev_sched = schedule[::-1]
    x_rep, z0, keys, B0_run = _prep_chains(x, n_sample, latent_dim,
                                           rev_sched, k_rev, mesh,
                                           z_init=z_true)
    logw, z = _ais_chain(lambda z: log_lik_fn(z, x_rep), z0, rev_sched, keys,
                         initial_eps, leapfrog)
    logw_mat, _ = _chain_views(logw, z, n_sample, B0_run, n_batch,
                               latent_dim)
    upper_rows = -(jax.scipy.special.logsumexp(logw_mat, axis=-1)
                   - jnp.log(n_sample))
    upper = float(jnp.mean(upper_rows))
    return BDMCResult(lower=fwd.logw, upper=upper, gap=upper - fwd.logw,
                      x_sim=np.asarray(x), z_true=np.asarray(z_true))


def _ais_chain(ll_fn, z0, schedule, keys,
               initial_eps: float = 0.01, leapfrog: int = 10):
    """The device-pure AIS core: annealed HMC over the bridge schedule for
    B independent chains. `ll_fn(z) -> [B]` is the bridge's annealed term
    log p(x|z), closed over the data (and, in the ensemble runner, over one
    replica's params). Returns (logw [B], final z [B, L])."""

    def _prior_and_lik(z):
        """One likelihood evaluation -> (log p(z), log p(x|z)); every bridge
        quantity is an affine combination of these two."""
        return _log_normal_nc(z), ll_fn(z)

    def log_f(z, t):
        log_prior, log_lik = _prior_and_lik(z)
        return log_prior + t * log_lik

    def U(z, t):
        return -log_f(z, t)

    grad_U_sum = jax.grad(lambda z, t: jnp.sum(U(z, t)))

    def grad_U(z, t):
        return jnp.clip(grad_U_sum(z, t), -1e4, 1e4)

    def hmc_leapfrog(z, v, eps, t):
        """(reference: AIS.py:237-262)."""
        eps_c = eps[:, None]
        v = v - 0.5 * eps_c * grad_U(z, t)
        for i in range(1, leapfrog + 1):
            z = z + eps_c * v
            if i < leapfrog:
                v = v - eps_c * grad_U(z, t)
        v = v - 0.5 * eps_c * grad_U(z, t)
        return z, -v

    def step(carry, inp):
        z, eps, accept_hist, logw, j = carry
        t0, t1, k = inp
        # one likelihood evaluation serves both the bridge increment
        # (log f_t1 - log f_t0 = (t1-t0)·log p(x|z)) and cur_H's energy
        lp_z, ll_z = _prior_and_lik(z)
        logw = logw + (t1 - t0) * ll_z
        kv, ku = jax.random.split(k)
        v = jax.random.normal(kv, z.shape)
        z_new, v_new = hmc_leapfrog(z, v, eps, t1)
        # accept/reject with adaptive eps (reference: AIS.py:265-304)
        cur_H = 0.5 * jnp.sum(jnp.square(v), 1) - (lp_z + t1 * ll_z)
        prop_H = 0.5 * jnp.sum(jnp.square(v_new), 1) + U(z_new, t1)
        prob = jnp.exp(cur_H - prop_H)
        accept = (prob > jax.random.uniform(ku, prob.shape)).astype(jnp.float32)
        z = z_new * accept[:, None] + z * (1.0 - accept[:, None])
        accept_hist = accept_hist + accept
        criteria = (accept_hist / j > 0.65).astype(jnp.float32)
        eps = jnp.clip(eps * (1.02 * criteria + 0.98 * (1.0 - criteria)),
                       1e-4, 0.5)
        return (z, eps, accept_hist, logw, j + 1.0), None

    B = z0.shape[0]
    init = (
        z0,
        jnp.full((B,), initial_eps),
        jnp.zeros((B,)),
        jnp.zeros((B,)),
        jnp.float32(1.0),
    )
    (z, eps, _, logw, _), _ = jax.lax.scan(
        step, init, (schedule[:-1], schedule[1:], keys)
    )
    return logw, z


@functools.lru_cache(maxsize=None)
def _ensemble_runner(bridge: BridgeLik):
    """[S]-replica AIS in one program for one family's bridge: _ais_chain
    vmapped over stacked decoder params (same chains/keys for every
    replica). lru-cached per bridge singleton so repeated calls with the
    same shapes hit jax's compile cache instead of re-tracing a closure."""

    @jax.jit
    def run(params_ens, x_rep, z0, sched, keys):
        def one_seed(p):
            return _ais_chain(lambda z: bridge.log_lik(p, z, x_rep), z0,
                              sched, keys)

        return jax.vmap(one_seed)(params_ens)

    return run


def eval_ais(dataset, cfg: RunConfig, params=None, schedule=None,
             n_sample: int = 100, key=None,
             experiments_root: str = "experiments", save: bool = True,
             mesh=None):
    """AIS driver over the dataset splits (reference: AIS.py:80-91) against the
    pre-trained checkpoint; saves <stage>_ais.pt artifacts
    (reference: AIS.py:230-233). Runs for every model family via its
    bridge likelihood (bridge_for — the reference driver is likewise
    checkpoint-agnostic, AIS.py:120,135). With `mesh`, chains dp-shard
    (ais_batch)."""
    import os

    from vae_posterior_consistency_tpu.engine import artifacts
    from vae_posterior_consistency_tpu.engine.train import load_trained

    bridge = bridge_for(cfg)
    if params is None:
        params = load_trained(dataset, cfg, experiments_root)
    if schedule is None:
        schedule = default_schedule(cfg, bridge)
    key = jax.random.PRNGKey(cfg.seed + 4) if key is None else key

    log_lik_fn = functools.partial(bridge.log_lik, params)

    results = {}
    for split_idx, split in enumerate((dataset.train, dataset.test)):
        if split is None:
            continue
        # fixed per-split key derivation (Python's str hash is salted per
        # process and would make AIS chains non-reproducible across runs)
        res = ais_batch(None, split.x, n_sample, cfg.latent_dim,
                        schedule, jax.random.fold_in(key, split_idx),
                        mesh=mesh, log_lik_fn=log_lik_fn)
        results[split.stage] = res
        if save:
            base = os.path.join(
                experiments_root, cfg.vae_type, cfg.data_type, "elbos",
                f"{cfg.missing_rate}_missing", f"{cfg.epoch}_epochs",
            )
            artifacts.save_tensor(res.logw, os.path.join(base,
                                                         f"{split.stage}_ais.pt"))
            lat_base = base.replace("elbos", "latents")
            artifacts.save_tensor(
                res.latents, os.path.join(lat_base,
                                          f"{split.stage}_ais_true_latents.pt")
            )
            artifacts.log_metric(cfg, "ais_logw", res.logw, split.stage,
                                 experiments_root)
    return results


def eval_ais_ensemble(dataset, cfg: RunConfig, params_ens, schedule=None,
                      n_sample: int = 100, key=None,
                      experiments_root: str = "experiments", save: bool = True,
                      mesh=None):
    """AIS over an [S]-stack of seed-replica checkpoints in ONE compiled
    program per split: _ais_chain vmapped over the stacked decoder params.
    Every replica anneals the SAME chains (same z0/HMC keys, same data) —
    replicas differ only by their trained parameters, exactly as S serial
    eval_ais runs would derive them — so replica 0 reproduces eval_ais
    (pinned by tests/test_ais.py::test_ais_ensemble_matches_serial). Works
    for every model family (bridge_for). With `mesh`, chains dp-shard
    exactly as in ais_batch (the vmap adds a replicated [S] axis on params
    only).

    Saves replica 0's logw/latents at the reference artifact paths and the
    extra seeds under `.seed{s}` suffixes (the reference CLI has no
    seed-replication equivalent; serial entry: src/utils/AIS.py:80-91).
    Returns {stage: AISResult} with logw/latents stacked on a leading [S].
    """
    import os

    from vae_posterior_consistency_tpu.engine import artifacts, checkpoint

    bridge = bridge_for(cfg)
    if schedule is None:
        schedule = default_schedule(cfg, bridge)
    key = jax.random.PRNGKey(cfg.seed + 4) if key is None else key

    results = {}
    for split_idx, split in enumerate((dataset.train, dataset.test)):
        if split is None:
            continue
        B0 = split.x.shape[0]
        sched = jnp.asarray(schedule, jnp.float32)
        # identical stream derivation to ais_batch (fold per split)
        x_rep, z0, keys, B0_run = _prep_chains(
            split.x, n_sample, cfg.latent_dim, sched,
            jax.random.fold_in(key, split_idx), mesh)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            params_ens = jax.device_put(params_ens, NamedSharding(mesh, P()))

        logw_s, z_s = _ensemble_runner(bridge)(params_ens, x_rep, z0, sched,
                                               keys)  # [S,B], [S,B,L]
        logw_mat, lats_s = _chain_views(logw_s, z_s, n_sample, B0_run, B0,
                                        cfg.latent_dim)
        lw = (jax.scipy.special.logsumexp(logw_mat, axis=-1)
              - jnp.log(n_sample))  # [S, B0]
        logws = np.asarray(jax.device_get(jnp.mean(lw, axis=-1)))  # [S]
        lats = np.asarray(jax.device_get(lats_s))
        results[split.stage] = AISResult(logw=logws, latents=lats)
        if save:
            base = os.path.join(
                experiments_root, cfg.vae_type, cfg.data_type, "elbos",
                f"{cfg.missing_rate}_missing", f"{cfg.epoch}_epochs",
            )
            lat_base = base.replace("elbos", "latents")
            for s in range(logws.shape[0]):
                sfx = checkpoint.seed_suffix(s)
                artifacts.save_tensor(
                    float(logws[s]),
                    os.path.join(base, f"{split.stage}_ais.pt{sfx}"))
                artifacts.save_tensor(
                    lats[s],
                    os.path.join(lat_base,
                                 f"{split.stage}_ais_true_latents.pt{sfx}"))
            artifacts.log_metric(cfg, "ais_logw", float(logws[0]),
                                 split.stage, experiments_root)
    return results


def eval_bdmc(dataset, cfg: RunConfig, params=None, schedule=None,
              n_sample: int = 100, n_batch: int | None = None, key=None,
              experiments_root: str = "experiments", save: bool = True,
              mesh=None) -> BDMCResult:
    """BDMC sandwich for a trained checkpoint of any family: simulate
    `n_batch` rows from the decoder (Gaussian or Student-t, per bridge_for),
    then bracket log p(x_sim) between the forward and reverse AIS bounds
    (see `bdmc`). The gap is the actionable output — it certifies (or
    indicts) the cfg.ais_schedule/cfg.n_ais_dist bridge that eval_ais uses
    on the real splits. Saves bdmc_{lower,upper} artifacts next to
    eval_ais's <stage>_ais.pt files."""
    import os

    from vae_posterior_consistency_tpu.engine import artifacts
    from vae_posterior_consistency_tpu.engine.train import load_trained

    bridge = bridge_for(cfg)
    if params is None:
        params = load_trained(dataset, cfg, experiments_root)
    if schedule is None:
        # no warning: BDMC is the tool that MEASURES the gap
        schedule = default_schedule(cfg, bridge, warn=False)
    if n_batch is None:
        n_batch = min(cfg.batch_size, dataset.test.x.shape[0]
                      if dataset.test is not None else cfg.batch_size)
    key = jax.random.PRNGKey(cfg.seed + 5) if key is None else key

    res = bdmc(None, n_batch, n_sample, cfg.latent_dim, schedule, key,
               mesh=mesh, log_lik_fn=functools.partial(bridge.log_lik, params),
               sample_fn=functools.partial(bridge.sample_x, params))
    if save:
        base = os.path.join(
            experiments_root, cfg.vae_type, cfg.data_type, "elbos",
            f"{cfg.missing_rate}_missing", f"{cfg.epoch}_epochs",
        )
        artifacts.save_tensor(res.lower, os.path.join(base, "bdmc_lower.pt"))
        artifacts.save_tensor(res.upper, os.path.join(base, "bdmc_upper.pt"))
        artifacts.log_metric(cfg, "bdmc_gap", res.gap, "sim",
                             experiments_root)
    return res
