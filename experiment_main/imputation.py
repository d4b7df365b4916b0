"""MCAR imputation experiment entry point.

CLI-compatible rebuild of the reference driver
(reference: src/experiment_main/imputation.py:20-59): iterates the JSONL config
records in Data/imputation_args.json, sweeps the hard-coded (missing %, alpha)
grid, trains each model, then evaluates imputation RMSE / ELBO / negative
log-likelihoods and writes the reference-named artifacts under experiments/.

Run:  PYTHONPATH=. python3 experiment_main/imputation.py [-vae_type ...] [...]
Every JSONL field is overridable as a single-dash CLI flag (same contract as
the reference's setup_parser, src/utils/utils.py:177-189).
"""

import os
import sys

# repo-checkout layout only: make the package importable when run as a
# script. Installed (this module living under the package as
# vae_posterior_consistency_tpu.experiment_main), the parent dir is the
# package itself and must NOT go on sys.path (its subpackages would shadow
# top-level names like `config`).
_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_parent, "vae_posterior_consistency_tpu")):
    sys.path.insert(0, _parent)

import jax

# opt-in NaN tripwire (the reference's always-on detect_anomaly equivalent —
# PARITY.md documented deviation #7): VPC_DEBUG_NANS=1
from vae_posterior_consistency_tpu.utils.debugging import (
    apply_platform_from_env,
    enable_nan_debugging_from_env,
)

apply_platform_from_env()
enable_nan_debugging_from_env()

from vae_posterior_consistency_tpu.config import (
    RunConfig,
    apply_rng_impl,
    early_stopper,
    iter_jsonl_configs,
    maybe_profile,
    parse_alphas,
    parse_missings,
    resolve_mesh,
    restart_opts,
    restrict_grid_records,
    setup_parser,
)
from vae_posterior_consistency_tpu.data import loaders
from vae_posterior_consistency_tpu.data.default_configs import write_default_configs
from vae_posterior_consistency_tpu.engine import evaluate as eval_engine
from vae_posterior_consistency_tpu.engine import train as train_engine
from vae_posterior_consistency_tpu.utils.logging import epoch_logger

#: hard-coded sweep axes, matching the reference driver
#: (src/experiment_main/imputation.py:23-24)
MISSING_SWEEP = [30]
ALPHA_SWEEP = [1.0]


def _group_records(records):
    """Group config records into compiled-shape families: identical except
    the vae_type split digit (reg_vae1/2/3 -> one group)."""
    import json as _json

    groups, order = {}, []
    for rec in records:
        d = {k: v["default"] for k, v in rec.items()}
        key = ("".join(c for c in d["vae_type"] if not c.isdigit()),
               _json.dumps({k: v for k, v in sorted(d.items())
                            if k != "vae_type"}))
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(rec)
    return [groups[k] for k in order]


def _train_and_eval_one(dataset, cfg, mesh, checkpoint_every=None,
                        resume=False, early_stopping=None):
    """Train + eval ONE config, honoring `-mesh` (multi-chip engine when a
    mesh is resolved, single-chip otherwise), the -checkpoint_every /
    -resume restart flags, and `-early_stop`. Shared by the serial grid and
    the ensemble path's unequal-shapes fallback so the two dispatch blocks
    cannot drift apart."""
    if mesh is not None:
        # multi-chip engine: batch dp-sharded, wide params tp-sharded;
        # same checkpoint/artifact contract
        from vae_posterior_consistency_tpu.engine.evaluate_sharded import (
            eval_vae_sharded,
        )
        from vae_posterior_consistency_tpu.parallel.train_parallel import (
            train_sharded,
        )

        train_sharded(dataset, cfg, mesh, save=True,
                      checkpoint_every=checkpoint_every, resume=resume,
                      early_stopping=early_stopping)
        print(f"=== eval {cfg.vae_type} ===")
        return eval_vae_sharded(dataset, cfg, mesh)
    train_engine.train(dataset, cfg, log_fn=epoch_logger(cfg.epoch),
                       checkpoint_every=checkpoint_every, resume=resume,
                       early_stopping=early_stopping)
    print(f"=== eval {cfg.vae_type} ===")
    return eval_engine.eval_vae(dataset, cfg)


def _train_and_eval_seeds(dataset, cfg, mesh, n_seeds, checkpoint_every=None,
                          resume=False, early_stopping=None):
    """`-seeds N` on the serial (non-ensemble) grid: the N seed replicas of
    ONE config train as a single seed-ensemble program
    (parallel/sweep.train_seed_ensemble) and evaluate as one vmapped
    program. Seed 0 keeps the reference checkpoint/artifact PATHS; extra
    seeds save under `.seed{s}` suffixes — the same convention as every
    other entry point.

    PRNG-stream deviation (PARITY.md deviation #8, serial-grid case): the
    seed ensemble derives replica s's init from PRNGKey(seed+s) and its
    epoch keys via fold_in, while a plain (no `-seeds`) run splits
    PRNGKey(cfg.seed) — so the seed-0 checkpoint/artifacts this path writes
    are statistically equivalent to, but NOT reproductions of, the plain
    run's (they overwrite the same files). The banner below flags it, same
    as the ensemble path's.
    Returns {stage: {metric: (mean, std)}}."""
    import jax as _jax

    from vae_posterior_consistency_tpu.engine import checkpoint
    from vae_posterior_consistency_tpu.parallel import sweep

    print("[seeds mode] seed replicas run as one vmapped program; PRNG "
          "streams differ from the plain serial run — seed-0 artifacts are "
          "statistically equivalent, not reproductions (PARITY.md deviation "
          "#8)", flush=True)
    seeds = [cfg.seed + si for si in range(n_seeds)]
    params_ens, _hist = sweep.train_seed_ensemble(
        dataset, cfg, seeds, mesh=mesh, checkpoint_every=checkpoint_every,
        resume=resume,
        resume_path=checkpoint.checkpoint_path(cfg, "experiments")
        + f".seeds{n_seeds}.resume.pt", early_stopping=early_stopping)
    _jax.block_until_ready(_hist)
    # ONE stacked device_get; replicas slice on host (VERDICT r4 item 4 —
    # per-row ensemble_replica cost a device slice + transfer RTT per seed)
    params_host = _jax.device_get(params_ens)
    checkpoint.save_many(
        [(sweep.ensemble_replica(params_host, si),
          checkpoint.checkpoint_path(cfg, "experiments")
          + checkpoint.seed_suffix(si)) for si in range(n_seeds)])
    print(f"=== eval {cfg.vae_type} (seeds={n_seeds}) ===")
    per_row = eval_engine.eval_vae_ensemble(
        [dataset] * n_seeds, [cfg] * n_seeds, params_ens, save_rows=[0])
    out = {}
    for stage in per_row[0]:
        out[stage] = {}
        for k in per_row[0][stage]:
            vals = [r[stage][k] for r in per_row]
            mu = sum(vals) / len(vals)
            sd = (sum((v - mu) ** 2 for v in vals) / len(vals)) ** 0.5
            out[stage][k] = (mu, sd)
    return out


def run_suite_alpha_ensembles(records, missing, alphas, n_seeds=1):
    """`-ensemble true -alphas a,b,...`: each REG config's whole alpha sweep
    trains as ONE vmapped replica program (parallel/sweep.train_alpha_ensemble
    — replicas deliberately share the data/shuffle/mask streams, isolating
    the effect of alpha; the reference's serial loop re-draws everything per
    alpha, src/experiment_main/imputation.py:24). Vanilla configs ignore
    alpha arithmetically, so they train ONCE at alphas[0]. Per-alpha
    checkpoints/artifacts keep the reference naming (alpha is in the reg
    families' mangled filenames). Replica rows dp-shard over `-mesh`."""
    import time as _time

    import jax as _jax

    from vae_posterior_consistency_tpu.engine import checkpoint
    from vae_posterior_consistency_tpu.parallel import sweep

    printed = False
    for rec in records:
        args = setup_parser(rec, "impute_eval").parse_args()
        cfg = RunConfig.from_args(args, alpha=alphas[0],
                                  p_missingness=missing)
        apply_rng_impl(cfg)
        mesh = resolve_mesh(cfg)
        if not printed:
            tag = f", mesh={dict(mesh.shape)}" if mesh is not None else ""
            print("[alpha-ensemble mode] each config's alpha sweep runs as "
                  f"one vmapped program{tag}; replicas share data/mask "
                  "streams by design (isolates alpha)", flush=True)
            printed = True
        dataset = loaders.data_loader(cfg.data_path, cfg.vae_type,
                                      cfg.missing_rate, cfg.batch_size,
                                      cfg.data_type)
        cfg_alphas = list(alphas) if cfg.info.regularized else alphas[:1]
        note = "" if cfg.info.regularized else " (vanilla: alpha-free, once)"
        seed_tag = f", seeds={n_seeds}" if n_seeds > 1 else ""
        print(f"=== alpha-ensemble train {cfg.vae_type} (missing={missing}, "
              f"alphas={cfg_alphas}{seed_tag}){note} ===", flush=True)
        t0 = _time.perf_counter()
        ck, rs = restart_opts(args)
        rp = (checkpoint.checkpoint_path(cfg, "experiments")
              + f".alphas{len(cfg_alphas)}x{n_seeds}.resume.pt")
        if n_seeds > 1:
            # paired error bars: [A * n_seeds] rows in ONE program; rows of
            # one seed share init/streams across alphas
            # (sweep.train_alpha_seed_ensemble)
            seeds = [cfg.seed + si for si in range(n_seeds)]
            params_ens, hist = sweep.train_alpha_seed_ensemble(
                dataset, cfg, cfg_alphas, seeds, mesh=mesh,
                checkpoint_every=ck, resume=rs, resume_path=rp,
                early_stopping=early_stopper(args, cfg, ensemble=True))
        else:
            params_ens, hist = sweep.train_alpha_ensemble(
                dataset, cfg, cfg_alphas, seed=cfg.seed, mesh=mesh,
                checkpoint_every=ck, resume=rs, resume_path=rp,
                early_stopping=early_stopper(args, cfg, ensemble=True))
        _jax.block_until_ready(hist)
        t_train = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        # one stacked device_get + threaded checkpoint writes (VERDICT r4
        # item 4); rows then slice on host. Eval stays per (alpha, seed) row
        # because alpha enters eval math (e.g. miwae.eval_step row_loss) —
        # rows with different alphas cannot share one vmapped eval program.
        params_host = _jax.device_get(params_ens)
        checkpoint.save_many([
            (sweep.ensemble_replica(params_host, i * n_seeds + si),
             checkpoint.checkpoint_path(cfg.replace(alpha=a), "experiments")
             + checkpoint.seed_suffix(si))
            for i, a in enumerate(cfg_alphas) for si in range(n_seeds)])
        for i, a in enumerate(cfg_alphas):
            cfg_a = cfg.replace(alpha=a)
            per_seed = []
            for si in range(n_seeds):
                row = i * n_seeds + si
                p_r = sweep.ensemble_replica(params_host, row)
                per_seed.append(eval_engine.eval_vae(dataset, cfg_a,
                                                     params=p_r,
                                                     save=si == 0))
            for stage in per_seed[0]:
                line = []
                for k in per_seed[0][stage]:
                    vals = [ps[stage][k] for ps in per_seed]
                    mu = sum(vals) / len(vals)
                    if n_seeds > 1:
                        sd = (sum((v - mu) ** 2 for v in vals)
                              / len(vals)) ** 0.5
                        line.append(f"{k}={mu:.5f}±{sd:.5f}")
                    else:
                        line.append(f"{k}={mu:.5f}")
                print(f"  alpha={a:g} [{stage}] " + "  ".join(line))
        print(f"  [timing] train {t_train:.1f}s  eval+save "
              f"{_time.perf_counter() - t0:.1f}s", flush=True)


def run_suite_sweep_ensembles(records, missings, alphas, n_seeds=1):
    """`-ensemble true -missings m1,m2[,...]`: each config's full
    (missing-rate x alpha x seed) product trains as ONE vmapped replica
    program (parallel/sweep.train_sweep_ensemble — the reference's two
    outer serial loops, src/experiment_main/imputation.py:23-24). Vanilla
    training is arithmetically free of BOTH knobs (ops/masks.train_masks
    ignores p_missingness off the reg branch), so vanilla configs train
    once per seed and re-evaluate per missing rate (eval's mask_p draw
    depends on the rate — e.g. miwae.eval_step — and the reference names
    artifacts per (alpha, missing)). Replica rows dp-shard over `-mesh`."""
    import time as _time

    import jax as _jax

    from vae_posterior_consistency_tpu.engine import checkpoint
    from vae_posterior_consistency_tpu.parallel import sweep

    printed = False
    for rec in records:
        args = setup_parser(rec, "impute_eval").parse_args()
        cfg = RunConfig.from_args(args, alpha=alphas[0],
                                  p_missingness=missings[0])
        apply_rng_impl(cfg)
        mesh = resolve_mesh(cfg)
        if not printed:
            tag = f", mesh={dict(mesh.shape)}" if mesh is not None else ""
            print("[sweep-ensemble mode] each config's (missing x alpha"
                  " x seed) product runs as one vmapped program"
                  f"{tag}; rows share data/shuffle streams by design "
                  "(pairs the swept knobs)", flush=True)
            printed = True
        dataset = loaders.data_loader(cfg.data_path, cfg.vae_type,
                                      cfg.missing_rate, cfg.batch_size,
                                      cfg.data_type)
        reg = cfg.info.regularized
        cfg_alphas = list(alphas) if reg else alphas[:1]
        cfg_miss = list(missings) if reg else missings[:1]
        note = "" if reg else " (vanilla: rate/alpha-free training, once)"
        seeds = ([cfg.seed + si for si in range(n_seeds)]
                 if n_seeds > 1 else None)
        seed_tag = f", seeds={n_seeds}" if n_seeds > 1 else ""
        print(f"=== sweep-ensemble train {cfg.vae_type} "
              f"(missings={cfg_miss}, alphas={cfg_alphas}{seed_tag})"
              f"{note} ===", flush=True)
        t0 = _time.perf_counter()
        ck, rs = restart_opts(args)
        params_ens, hist, rows = sweep.train_sweep_ensemble(
            dataset, cfg, missings=cfg_miss, alphas=cfg_alphas, seeds=seeds,
            mesh=mesh, checkpoint_every=ck, resume=rs,
            resume_path=checkpoint.checkpoint_path(cfg, "experiments")
            + f".sweep{len(cfg_miss) * len(cfg_alphas) * n_seeds}"
            ".resume.pt",
            early_stopping=early_stopper(args, cfg, ensemble=True))
        _jax.block_until_ready(hist)
        t_train = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        # one stacked device_get + threaded checkpoint writes (VERDICT r4
        # item 4). Group the rows by (missing, alpha); seeds inside a group
        # give error bars. Vanilla: the single trained row (per seed) is
        # re-evaluated at every requested rate (training is rate-free).
        params_host = _jax.device_get(params_ens)
        # grouping computed ONCE for both the checkpoint and eval passes —
        # the row-matching predicate must never desynchronize between them
        groups = []
        for mi, m in enumerate(missings):
            for a in cfg_alphas:
                m_trained = m if reg else cfg_miss[0]
                row_ids = [ri for ri, (rm, ra, _) in enumerate(rows)
                           if rm == m_trained and ra == a]
                groups.append((m, a, mi, row_ids,
                               cfg.replace(alpha=a, p_missingness=m)))
        # one checkpoint per trained row (vanilla names don't carry
        # p_missingness — saving the mi == 0 group suffices)
        checkpoint.save_many(
            (sweep.ensemble_replica(params_host, ri),
             checkpoint.checkpoint_path(cfg_ma, "experiments")
             + checkpoint.seed_suffix(si))
            for m, a, mi, row_ids, cfg_ma in groups
            if reg or mi == 0
            for si, ri in enumerate(row_ids))
        for m, a, mi, row_ids, cfg_ma in groups:
            per_seed = []
            for si, ri in enumerate(row_ids):
                p_r = sweep.ensemble_replica(params_host, ri)
                per_seed.append(eval_engine.eval_vae(
                    dataset, cfg_ma, params=p_r, save=si == 0))
            for stage in per_seed[0]:
                line = []
                for k in per_seed[0][stage]:
                    vals = [ps[stage][k] for ps in per_seed]
                    mu = sum(vals) / len(vals)
                    if n_seeds > 1:
                        sd = (sum((v - mu) ** 2 for v in vals)
                              / len(vals)) ** 0.5
                        line.append(f"{k}={mu:.5f}±{sd:.5f}")
                    else:
                        line.append(f"{k}={mu:.5f}")
                print(f"  missing={m} alpha={a:g} [{stage}] "
                      + "  ".join(line))
        print(f"  [timing] train {t_train:.1f}s  eval+save "
              f"{_time.perf_counter() - t0:.1f}s", flush=True)


def run_suite_ensembles(records, missing, alpha):
    """Train each family's split triple as ONE vmapped program, then save the
    per-config checkpoints and run ONE [S]-replica eval program per stage —
    the reference's serial 39-record loop (imputation.py:21-25) becomes ~13
    compiled ensembles with ~2 eval dispatches each.

    Composes with `-mesh`: replica rows dp-shard over the resolved mesh
    (parallel/sweep.shard_ensemble; replica padding handles S % dp != 0).
    Groups whose splits have unequal row counts still train as ONE program
    (smaller splits wrap-pad — parallel/sweep.train_split_ensemble); eval
    runs one vmapped program per split-size class.
    """
    import time as _time

    import jax as _jax
    import jax.numpy as jnp

    from vae_posterior_consistency_tpu.engine import checkpoint
    from vae_posterior_consistency_tpu.parallel import sweep

    printed_banner = False
    for group in _group_records(records):
        args = setup_parser(group[0], "impute_eval").parse_args()
        cfgs = [
            RunConfig.from_args(args, vae_type=rec["vae_type"]["default"],
                                alpha=alpha, p_missingness=missing)
            for rec in group
        ]
        apply_rng_impl(cfgs[0])
        mesh = resolve_mesh(cfgs[0])
        if not printed_banner:
            # the ensemble path deliberately uses its own PRNG streams
            # (per-replica fold_in init, shared shuffle) — its checkpoints
            # are statistically equivalent but not reproductions of the
            # serial grid (PARITY.md documented deviation #8)
            tag = f", mesh={dict(mesh.shape)}" if mesh is not None else ""
            print("[ensemble mode] grid runs as vmapped split-ensembles"
                  f"{tag}; PRNG streams differ from the serial path "
                  "(PARITY.md deviation #8)", flush=True)
            printed_banner = True
        datasets = [
            loaders.data_loader(c.data_path, c.vae_type, c.missing_rate,
                                c.batch_size, c.data_type)
            for c in cfgs
        ]
        names = [c.vae_type for c in cfgs]
        n_seeds = max(1, int(getattr(args, "seeds", 1)))
        seed_tag = f", seeds={n_seeds}" if n_seeds > 1 else ""
        print(f"=== ensemble train {names} (missing={missing}, "
              f"alpha={alpha}{seed_tag}) ===", flush=True)
        t0 = _time.perf_counter()
        ck, rs = restart_opts(args)
        params_ens, _hist = sweep.train_split_ensemble(
            datasets, cfgs[0], mesh=mesh, n_seeds=n_seeds,
            checkpoint_every=ck, resume=rs,
            resume_path=checkpoint.checkpoint_path(cfgs[0], "experiments")
            + f".ens{len(cfgs) * n_seeds}.resume.pt",
            early_stopping=early_stopper(args, cfgs[0], ensemble=True))
        _jax.block_until_ready(_hist)
        t_train = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        S0 = len(cfgs)
        # ONE stacked device_get for the whole group + threaded writes
        # (VERDICT r4 item 4: the save bucket was a device slice + transfer
        # RTT + serial torch.save per replica)
        params_host = _jax.device_get(params_ens)
        checkpoint.save_many([
            (sweep.ensemble_replica(params_host, row),
             # extra seeds: suffixed, reference contract untouched
             checkpoint.checkpoint_path(cfgs[row % S0], "experiments")
             + checkpoint.seed_suffix(row // S0))
            for row in range(S0 * n_seeds)])
        t_save = _time.perf_counter() - t0
        # seed-0 rows keep the reference artifact contract; the engine owns
        # the write policy (eval_vae_ensemble's save_rows). Ragged groups:
        # one vmapped eval program per split-SIZE class (the evaluator's
        # perm/batch structure is shape-static per n; equal-size groups take
        # one program exactly as before).
        all_datasets = datasets * n_seeds
        all_cfgs = cfgs * n_seeds
        classes: dict = {}
        for r in range(S0 * n_seeds):
            d = all_datasets[r]
            size_key = (d.train.n, None if d.test is None else d.test.n)
            classes.setdefault(size_key, []).append(r)
        all_results = [None] * (S0 * n_seeds)
        for rows_cls in classes.values():
            p_sub = _jax.tree_util.tree_map(
                lambda leaf: leaf[jnp.asarray(rows_cls)], params_ens)
            res = eval_engine.eval_vae_ensemble(
                [all_datasets[r] for r in rows_cls],
                [all_cfgs[r] for r in rows_cls], p_sub,
                save_rows=[j for j, r in enumerate(rows_cls) if r < S0])
            for j, r in enumerate(rows_cls):
                all_results[r] = res[j]
        for i, cfg in enumerate(cfgs):
            per_seed = [all_results[s * S0 + i] for s in range(n_seeds)]
            for stage in per_seed[0]:
                line = []
                for k in per_seed[0][stage]:
                    vals = [ps[stage][k] for ps in per_seed]
                    mu = sum(vals) / len(vals)
                    if n_seeds > 1:
                        sd = (sum((v - mu) ** 2 for v in vals)
                              / len(vals)) ** 0.5
                        line.append(f"{k}={mu:.5f}±{sd:.5f}")
                    else:
                        line.append(f"{k}={mu:.5f}")
                print(f"  {cfg.vae_type} [{stage}] " + "  ".join(line))
        t_eval = _time.perf_counter() - t0
        # eval+save is the r4 headline bucket; the (save=, eval=) split
        # decomposes it — save is the gather+checkpoint writes, eval is the
        # vmapped eval dispatches + artifact scalars (VERDICT r4 item 4)
        print(f"  [timing] train {t_train:.1f}s  eval+save {t_eval:.1f}s  "
              f"(save={t_save:.1f}s eval={t_eval - t_save:.1f}s)",
              flush=True)


def main():
    print("Devices:", jax.devices())
    write_default_configs("Data")
    records = list(iter_jsonl_configs("Data/imputation_args.json"))
    probe = setup_parser(records[0], "impute_eval").parse_args()
    with maybe_profile(probe):
        _run_grid(records, probe)


def _run_grid(records, probe):
    if probe.ensemble:
        # ensemble mode groups records by family, so a `-vae_type` override
        # restricts the grid to the matching record (config.py helper shared
        # with the MNAR/AL ensemble modes) instead of being silently
        # clobbered by each record's default — the serial grid applies the
        # override to EVERY record, the reference parse-per-record contract.
        records = restrict_grid_records(records, probe)
        alphas = parse_alphas(probe, ALPHA_SWEEP)
        missings = parse_missings(probe, MISSING_SWEEP)
        n_seeds = max(1, int(getattr(probe, "seeds", 1)))
        if len(missings) > 1:
            # the whole (missing x alpha x seed) product as one program
            # per config record
            run_suite_sweep_ensembles(records, missings, alphas,
                                      n_seeds=n_seeds)
            return
        if len(alphas) > 1:
            for missing in missings:
                run_suite_alpha_ensembles(records, missing, alphas,
                                          n_seeds=n_seeds)
            return
        for missing in missings:
            for alpha in alphas:
                run_suite_ensembles(records, missing, alpha)
        return
    n_seeds = max(1, int(getattr(probe, "seeds", 1)))
    alphas = parse_alphas(probe, ALPHA_SWEEP)
    missings = parse_missings(probe, MISSING_SWEEP)
    for record in records:
        for missing in missings:
            for alpha in alphas:
                args = setup_parser(record, "impute_eval").parse_args()
                cfg = RunConfig.from_args(args, alpha=alpha, p_missingness=missing)
                apply_rng_impl(cfg)
                dataset = loaders.data_loader(
                    cfg.data_path, cfg.vae_type, cfg.missing_rate,
                    cfg.batch_size, cfg.data_type,
                )
                # MIWAE-family models train with train_k importance samples and
                # evaluate with valid_k (reference: imputation.py:33-39 passes
                # train_k as num_samples to train, valid_k to eval)
                mesh = resolve_mesh(cfg)
                tag = f" mesh={dict(mesh.shape)}" if mesh is not None else ""
                seed_tag = f", seeds={n_seeds}" if n_seeds > 1 else ""
                print(f"=== train {cfg.vae_type} (missing={missing}, "
                      f"alpha={alpha}{seed_tag}){tag} ===")
                ck, rs = restart_opts(args)
                if n_seeds > 1:
                    # error bars without -ensemble: each record's N seed
                    # replicas run as one program (_train_and_eval_seeds)
                    results = _train_and_eval_seeds(
                        dataset, cfg, mesh, n_seeds, checkpoint_every=ck,
                        resume=rs,
                        early_stopping=early_stopper(args, cfg,
                                                     ensemble=True))
                    for stage, metrics in results.items():
                        print(f"  [{stage}] " + "  ".join(
                            f"{k}={mu:.5f}±{sd:.5f}"
                            for k, (mu, sd) in metrics.items()))
                    continue
                results = _train_and_eval_one(
                    dataset, cfg, mesh, checkpoint_every=ck, resume=rs,
                    early_stopping=early_stopper(args, cfg))
                for stage, metrics in results.items():
                    print(f"  [{stage}] " + "  ".join(
                        f"{k}={v:.5f}" for k, v in metrics.items()))


if __name__ == "__main__":
    main()
