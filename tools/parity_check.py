"""Statistical parity harness: run the ACTUAL reference (torch) and this
framework on identical data/config and compare headline metrics.

Bit-exact replication is impossible (different RNG streams — SURVEY.md §7
"RNG parity"); the BASELINE target is "within noise", so this harness trains
both stacks on the same artifacts with the same hyper-parameters and reports
imputation RMSE / ELBO side by side over multiple seeds.

The reference is imported read-only from /root/reference (its loaders pull in
torchvision, which is absent here, so we stub it before import).

Usage:  PYTHONPATH=. python3 tools/parity_check.py [--epochs 300] [--seeds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

if REPO not in sys.path:  # runnable without PYTHONPATH=.
    sys.path.insert(0, REPO)


import contextlib
import shutil
import tempfile


@contextlib.contextmanager
def _ref_sandbox():
    """Run the reference in a throwaway cwd with a Data symlink.

    The reference's train/eval torch.save into relative 'experiments/...'
    paths (src/experiment_main/train.py:120-131, evaluate.py:247-297) — run
    from the repo root they silently overwrite the committed full-budget
    artifacts with reduced-budget parity runs (this happened once). The
    sandbox keeps its reads/writes self-contained; the harness reads the
    artifacts back while still inside."""
    old = os.getcwd()
    d = tempfile.mkdtemp(prefix="vpc_ref_")
    os.symlink(os.path.join(old, "Data"), os.path.join(d, "Data"))
    os.chdir(d)
    try:
        yield d
    finally:
        os.chdir(old)
        shutil.rmtree(d, ignore_errors=True)


def _stub_missing_modules():
    """The reference imports torchvision/matplotlib at module scope without
    using them in the paths we drive; stub what's absent."""
    for name in ("torchvision",):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                mod = types.ModuleType(name)
                mod.datasets = types.SimpleNamespace()
                mod.transforms = types.SimpleNamespace()
                sys.modules[name] = mod
    try:
        import matplotlib  # noqa: F401

        matplotlib.use("Agg")
    except ImportError:
        mod = types.ModuleType("matplotlib")
        mod.pyplot = types.ModuleType("matplotlib.pyplot")
        sys.modules["matplotlib"] = mod
        sys.modules["matplotlib.pyplot"] = mod.pyplot


def _ensure_ref_dirs(exp_type, data_type, vae_type):
    """The reference's torch.save calls assume the experiments tree already
    exists (it never makedirs); create the family dirs it will write into."""
    from vae_posterior_consistency_tpu.engine.checkpoint import family_dir

    fam = family_dir(vae_type)
    for sub in ("checkpoints", "rest", "elbos"):
        os.makedirs(os.path.join("experiments", exp_type, data_type, sub, fam),
                    exist_ok=True)


def _patch_variant_classes(not_miwae_type="changed", reg_variant="v2"):
    """Rebind the reference factory's notMIWAE names to the DEAD variant
    classes so the reference's own train/eval loops drive them.

    The reference never instantiates `notMIWAE` (author), `REG_notMIWAE`
    ('both_s') or `REG_notMIWAE_new_version` ('sampled_mask') — its factory
    hard-codes notMIWAE_myversion / REG_notMIWAE_v2
    (reference: src/utils/loaders.py:92,222) and its train loop's
    'reg_notMIWAE' branch calls forward(data, mask, mask_p, stage=...)
    (train.py:89-90), which REG_notMIWAE (forward has no `stage`,
    VAE.py:2683) and REG_notMIWAE_new_version (forward takes no mask_p and
    loss has a different arity, VAE.py:2202,2319) cannot even accept — the
    variants are dead code that would crash if selected. The thin adapters
    below ONLY bridge those signature gaps; all math is the reference's.

    Returns a restore() callable."""
    import src.utils.loaders as ref_loaders
    from src.models import VAE as refVAE

    saved = {}
    if not_miwae_type == "author":
        saved["notMIWAE_myversion"] = ref_loaders.notMIWAE_myversion
        ref_loaders.notMIWAE_myversion = refVAE.notMIWAE
    if reg_variant == "both_s":
        class _BothS(refVAE.REG_notMIWAE):
            def forward(self, data, mask, mask_p, stage="train"):
                return refVAE.REG_notMIWAE.forward(self, data, mask, mask_p)

        saved["REG_notMIWAE_v2"] = ref_loaders.REG_notMIWAE_v2
        ref_loaders.REG_notMIWAE_v2 = _BothS
    elif reg_variant == "sampled_mask":
        class _SampledMask(refVAE.REG_notMIWAE_new_version):
            def forward(self, data, mask, mask_p=None, stage="train"):
                m, lv, xm, xlv = refVAE.REG_notMIWAE_new_version.forward(
                    self, data, mask
                )
                return m, lv, xm, xlv, m, lv, xm, xlv

            def loss(self, x, x_recon_p, x_logvar_p, mean_p, logvar_p,
                     x_recon_q, x_logvar_q, mean_q, logvar_q, mask, mask_p,
                     epoch, **kw):
                # mask_p is ignored: the real loss samples its own from the
                # learned p(s|x) (reference: VAE.py:2232-2239)
                return refVAE.REG_notMIWAE_new_version.loss(
                    self, x, x_recon_q, x_logvar_q, mean_q, logvar_q, mask,
                    epoch, **kw
                )

        saved["REG_notMIWAE_v2"] = ref_loaders.REG_notMIWAE_v2
        ref_loaders.REG_notMIWAE_v2 = _SampledMask

    def restore():
        for name, cls in saved.items():
            setattr(ref_loaders, name, cls)

    return restore


def run_reference(vae_type, data_type, epochs, missing_rate, batch_size, seed,
                  train_k=1, valid_k=1, reg_type="kl_reg"):
    """Train + evaluate with the reference's own code; returns metrics dict.

    MIWAE-family types route through the reference's per-row eval_miwae
    (reference: src/experiment_main/imputation.py:40-49) and report RMSE only.
    """
    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)
    _stub_missing_modules()
    sys.path.insert(0, REFERENCE)
    try:
        with _ref_sandbox():
            return _run_reference_inner(
                vae_type, data_type, epochs, missing_rate, batch_size,
                train_k, valid_k, reg_type)
    finally:
        sys.path.remove(REFERENCE)


def _run_reference_inner(vae_type, data_type, epochs, missing_rate,
                         batch_size, train_k, valid_k, reg_type):
    import torch

    from src.experiment_main.evaluate import eval_miwae as ref_eval_miwae
    from src.experiment_main.evaluate import eval_vae as ref_eval_vae
    from src.experiment_main.train import train as ref_train
    from src.utils.loaders import data_loader as ref_data_loader
    from src.utils.loaders import data_loader_mnist as ref_data_loader_mnist

    if data_type == "mnist":
        loader_train, loader_test, obs_dim = ref_data_loader_mnist(
            "Data", vae_type, missing_rate, batch_size, data_type
        )
    else:
        loader_train, loader_test, obs_dim = ref_data_loader(
            "Data", vae_type, missing_rate, batch_size, data_type
        )
    tp = {"batch_size": batch_size, "patience": 100}
    exp_type = "UCI_experiments_consistency_missingness"
    _ensure_ref_dirs(exp_type, data_type, vae_type)
    ref_train(
        loader_train, missing_rate, obs_dim, 500, 10, 1, 10, data_type,
        tp, exp_type, vae_type, train_k, 10, epochs,
        alpha=1.0, p_missingness=30, reg_type=reg_type,
    )
    is_miwae = "MIWAE" in vae_type
    eval_fn = ref_eval_miwae if is_miwae else ref_eval_vae
    eval_fn(
        [loader_train, loader_test], missing_rate, obs_dim, 500, 10, 2,
        10, data_type, tp, exp_type, vae_type, epochs, valid_k, 10,
        alpha=1.0, p_missingness=30, reg_type=reg_type,
    )
    # read back the artifacts the reference saved
    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.engine import artifacts as art

    cfg = RunConfig(vae_type=vae_type, data_type=data_type,
                    missing_rate=missing_rate, alpha=1.0,
                    p_missingness=30, reg_type=reg_type)
    out = {}
    for stage in ("train", "test"):
        if is_miwae:
            paths = art.eval_miwae_paths(cfg, stage, "experiments")
        else:
            paths = art.eval_vae_paths(cfg, stage, "experiments")
        out[stage] = {
            k: float(torch.load(p, weights_only=False))
            for k, p in paths.items()
        }
    return out


def run_ours(vae_type, data_type, epochs, missing_rate, batch_size, seed,
             train_k=1, valid_k=1, reg_type="kl_reg"):
    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.engine import evaluate as E
    from vae_posterior_consistency_tpu.engine import train as T

    cfg = RunConfig(
        vae_type=vae_type, data_type=data_type, epoch=epochs,
        batch_size=batch_size, missing_rate=missing_rate, M=2, alpha=1.0,
        p_missingness=30, reg_type=reg_type, seed=seed,
        train_k=train_k, valid_k=valid_k,
    )
    if data_type == "mnist":
        ds = loaders.data_loader_mnist("Data", vae_type, missing_rate,
                                       batch_size, data_type)
    else:
        ds = loaders.data_loader("Data", vae_type, missing_rate, batch_size,
                                 data_type)
    params, _ = T.train(ds, cfg, save=False)
    res = E.eval_vae(ds, cfg, params=params, save=False)
    return {
        stage: {"rmse": m["rmse"], "elbo": m["loss"], "negll": m["negl"],
                "negll_imp": m["negl_imp"]}
        for stage, m in res.items()
    }


def run_reference_mnar(vae_type, data_type, epochs, batch_size, seed,
                       train_k=20, valid_k=50, not_miwae_type="changed",
                       reg_variant="v2"):
    """MNAR pipeline through the reference's own code
    (reference: src/experiment_main/imputation_mnar.py:27-85). The dead
    variant classes are reached by rebinding the factory names — see
    _patch_variant_classes."""
    import contextlib

    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)
    _stub_missing_modules()
    sys.path.insert(0, REFERENCE)
    restore = lambda: None  # noqa: E731
    _sb = _ref_sandbox()  # reference writes relative experiments/ paths
    _sb.__enter__()
    try:
        from src.experiment_main.evaluate import eval_vae_mnar as ref_eval
        from src.experiment_main.train import train as ref_train
        from src.utils.loaders import data_loader_mnar as ref_loader

        restore = _patch_variant_classes(not_miwae_type, reg_variant)
        # the author-variant loss prints a Bernoulli sample EVERY call
        # (reference: VAE.py:2961) — drop that firehose. ExitStack scopes
        # the devnull fd (a bare open() here leaked one per seed run).
        quiet = contextlib.ExitStack()
        if not_miwae_type == "author":
            devnull = quiet.enter_context(open(os.devnull, "w"))
            quiet.enter_context(contextlib.redirect_stdout(devnull))

        loader, obs_dim = ref_loader("Data", vae_type, 50, batch_size,
                                     data_type)
        # rebuild the raw tensors exactly as the entry script does
        # (imputation_mnar.py:48-66)
        index = [c for c in vae_type if c.isdigit()][0]
        data = torch.load(f"Data/{data_type}/data.pt", weights_only=False)
        data = data[:, :-1]
        perm = torch.load(f"Data/{data_type}/rand_perm{index}.pt",
                          weights_only=False).numpy()
        data = data[perm, :]
        mask = torch.load(f"Data/{data_type}/mnar_mask_missing{index}.pt",
                          weights_only=False)[:, :-1]
        lo, hi = data.min(axis=0).values, data.max(axis=0).values
        data = (data - lo) / (hi - lo)

        tp = {"batch_size": batch_size, "patience": 100}
        exp_type = "UCI_experiments_consistency_missingness"
        _ensure_ref_dirs(exp_type, data_type, vae_type)
        with quiet:
            ref_train(loader, 50, obs_dim, 500, 20, 1, 10, data_type, tp,
                      exp_type, vae_type, train_k, 10, epochs, alpha=1.0,
                      p_missingness=50, reg_type="kl_reg")
            ref_eval(data.float(), mask.float(), 50, obs_dim, 500, 20, 2, 10,
                     data_type, tp, exp_type, vae_type, epochs, valid_k, 10,
                     alpha=1.0, p_missingness=50, reg_type="kl_reg",
                     not_miwae_type=not_miwae_type)
        from vae_posterior_consistency_tpu.config import RunConfig
        from vae_posterior_consistency_tpu.engine import artifacts as art

        cfg = RunConfig(vae_type=vae_type, data_type=data_type,
                        missing_rate=50, alpha=1.0, p_missingness=50,
                        reg_type="kl_reg", not_miwae_type=not_miwae_type)
        path = art.eval_mnar_paths(cfg, "experiments")["rmse"]
        return {"test": {"rmse": float(torch.load(path, weights_only=False))}}
    finally:
        restore()
        _sb.__exit__(None, None, None)
        sys.path.remove(REFERENCE)


def run_ours_mnar(vae_type, data_type, epochs, batch_size, seed,
                  train_k=20, valid_k=50, not_miwae_type="changed",
                  reg_variant="v2"):
    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.engine import evaluate as E
    from vae_posterior_consistency_tpu.engine import train as T

    cfg = RunConfig(vae_type=vae_type, data_type=data_type, epoch=epochs,
                    batch_size=batch_size, missing_rate=50, M=2, alpha=1.0,
                    p_missingness=50, reg_type="kl_reg", seed=seed,
                    train_k=train_k, valid_k=valid_k,
                    not_miwae_type=not_miwae_type,
                    reg_notmiwae_variant=reg_variant)
    ds = loaders.data_loader_mnar("Data", vae_type, 50, batch_size, data_type)
    params, _ = T.train(ds, cfg, save=False)
    rmse = E.eval_vae_mnar(ds.train.x, ds.train.mask, cfg, params=params,
                           save=False)
    return {"test": {"rmse": rmse}}


def run_reference_al(vae_type, data_type, epochs, missing_rate, batch_size,
                     seed, M=2):
    """Active-learning episode through the reference's own code
    (reference: src/experiment_main/active_learning.py:23-74 +
    evaluate.py:300-511). Trains its own checkpoint first (the reference AL
    expects one on disk). Returns the information curve [n_steps+1]."""
    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)
    _stub_missing_modules()
    sys.path.insert(0, REFERENCE)
    _sb = _ref_sandbox()  # reference writes relative experiments/ paths
    _sb.__enter__()
    try:
        from src.experiment_main.evaluate import (
            active_learning_func as ref_al,
        )
        from src.experiment_main.train import train as ref_train
        from src.utils.loaders import data_loader as ref_data_loader

        loader_train, loader_test, obs_dim = ref_data_loader(
            "Data", vae_type, missing_rate, batch_size, data_type
        )
        tp = {"batch_size": batch_size, "patience": 100}
        exp_type = "UCI_experiments_consistency_missingness"
        _ensure_ref_dirs(exp_type, data_type, vae_type)
        ref_train(loader_train, missing_rate, obs_dim, 500, 10, M, 10,
                  data_type, tp, exp_type, vae_type, 1, 10, epochs,
                  alpha=1.0, p_missingness=30, reg_type="kl_reg")
        # raw test tensors as the AL entry script builds them
        index = [c for c in vae_type if c.isdigit()][0]
        data = torch.load(f"Data/{data_type}/data.pt", weights_only=False)
        mask = torch.load(
            f"Data/{data_type}/mask_{missing_rate}_missing{index}.pt",
            weights_only=False,
        )
        test_idx = np.loadtxt(f"Data/{data_type}/test_index{index}.csv",
                              delimiter=",").astype(int).reshape(-1)
        lo, hi = data.min(axis=0).values, data.max(axis=0).values
        data = (data - lo) / (hi - lo)
        ref_al(loader_train, data[test_idx].float(), mask[test_idx].float(),
               missing_rate, obs_dim, 500, 10, M, 10, data_type, tp, exp_type,
               vae_type, epochs, 1, 10, alpha=1.0, p_missingness=30,
               reg_type="kl_reg", Repeat=1)
        from vae_posterior_consistency_tpu.config import RunConfig
        from vae_posterior_consistency_tpu.engine import artifacts as art

        cfg = RunConfig(vae_type=vae_type, data_type=data_type,
                        missing_rate=missing_rate, alpha=1.0,
                        p_missingness=30, reg_type="kl_reg", M=M)
        path = art.active_learning_paths(cfg, "experiments")[
            "information_curve"
        ]
        curve = torch.load(path, weights_only=False)
        return np.asarray(curve)[0, 0, :]  # scalar MSE per step
    finally:
        _sb.__exit__(None, None, None)
        sys.path.remove(REFERENCE)


def run_ours_al(vae_type, data_type, epochs, missing_rate, batch_size, seed,
                M=2):
    from vae_posterior_consistency_tpu.config import RunConfig
    from vae_posterior_consistency_tpu.data import loaders
    from vae_posterior_consistency_tpu.engine import active_learning as al
    from vae_posterior_consistency_tpu.engine import train as T

    cfg = RunConfig(vae_type=vae_type, data_type=data_type, epoch=epochs,
                    batch_size=batch_size, missing_rate=missing_rate, M=M,
                    alpha=1.0, p_missingness=30, reg_type="kl_reg", seed=seed)
    ds = loaders.data_loader("Data", vae_type, missing_rate, batch_size,
                             data_type)
    params, _ = T.train(ds, cfg, save=False)
    out = al.active_learning_func(None, ds.test.x, ds.test.mask, cfg,
                                  Repeat=1, params=params, save=False)
    return np.asarray(out["information_curve"])[0, 0, :]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vae_type", default="vanilla_vae1")
    ap.add_argument("--data_type", default="synth_small")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--missing_rate", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--al", action="store_true",
                    help="compare active-learning information curves instead")
    ap.add_argument("--reg_type", default="kl_reg",
                    choices=["kl_reg", "ml_reg"],
                    help="regularizer composite (reference VAE.py:133-143)")
    ap.add_argument("--not_miwae_type", default="changed",
                    choices=["changed", "author"],
                    help="notMIWAE base variant (reference VAE.py:2691/2850)")
    ap.add_argument("--reg_notmiwae_variant", default="v2",
                    choices=["v2", "both_s", "sampled_mask"],
                    help="reg-notMIWAE variant (reference VAE.py:2327/2508/2132)")
    ap.add_argument("--band", type=float, default=0.05,
                    help="relative tolerance band on top of the 3-sigma "
                         "combined noise (default 0.05 for the reduced-budget "
                         "screens; full-budget rows — 3000 epochs, batch 64, "
                         "wine — use 0.03, VERDICT r4 item 1)")
    ap.add_argument("--out", default="",
                    help="append the JSON report (+ per-seed values and the "
                         "verdict) as one JSONL record to this file")
    args = ap.parse_args()

    # run the jax side on CPU: parity is statistical, and this avoids fighting
    # other processes for the single-tenant TPU tunnel
    import jax

    jax.config.update("jax_platforms", "cpu")

    if args.al:
        ref_curves, our_curves = [], []
        for seed in range(args.seeds):
            print(f"--- reference AL seed {seed} ---", flush=True)
            ref_curves.append(run_reference_al(
                args.vae_type, args.data_type, args.epochs, args.missing_rate,
                args.batch_size, seed))
            print(f"--- framework AL seed {seed} ---", flush=True)
            our_curves.append(run_ours_al(
                args.vae_type, args.data_type, args.epochs, args.missing_rate,
                args.batch_size, seed))
        ref_c = np.mean(ref_curves, axis=0)
        our_c = np.mean(our_curves, axis=0)
        print("reference info curve:", np.round(ref_c, 4).tolist())
        print("ours      info curve:", np.round(our_c, 4).tolist())
        # both curves should end substantially below where they start, and the
        # endpoints should agree within combined run-to-run noise
        ref_sd = np.std([c[-1] for c in ref_curves]) + 1e-9
        our_sd = np.std([c[-1] for c in our_curves]) + 1e-9
        tol = 3 * (ref_sd + our_sd) + 0.25 * abs(ref_c[-1])
        diff = our_c[-1] - ref_c[-1]
        verdict = ("PARITY OK" if abs(diff) <= tol
                   else ("BETTER THAN REFERENCE" if diff < 0
                         else "WORSE — INVESTIGATE"))
        print(f"final target-MSE: ref={ref_c[-1]:.4f} ours={our_c[-1]:.4f} "
              f"diff={diff:+.4f} tol={tol:.4f} -> {verdict}")
        return

    is_mnar = "notMIWAE" in args.vae_type
    is_miwae = "MIWAE" in args.vae_type and not is_mnar
    train_k, valid_k = (10, 50) if (is_miwae or is_mnar) else (1, 1)
    ref_runs, our_runs = [], []
    for seed in range(args.seeds):
        print(f"--- reference (torch) seed {seed} ---", flush=True)
        if is_mnar:
            ref_runs.append(run_reference_mnar(
                args.vae_type, args.data_type, args.epochs, args.batch_size,
                seed, train_k, valid_k, args.not_miwae_type,
                args.reg_notmiwae_variant))
        else:
            ref_runs.append(run_reference(args.vae_type, args.data_type,
                                          args.epochs, args.missing_rate,
                                          args.batch_size, seed, train_k,
                                          valid_k, args.reg_type))
        print(f"--- framework (jax) seed {seed} ---", flush=True)
        if is_mnar:
            our_runs.append(run_ours_mnar(
                args.vae_type, args.data_type, args.epochs, args.batch_size,
                seed, train_k, valid_k, args.not_miwae_type,
                args.reg_notmiwae_variant))
        else:
            our_runs.append(run_ours(args.vae_type, args.data_type,
                                     args.epochs, args.missing_rate,
                                     args.batch_size, seed, train_k, valid_k,
                                     args.reg_type))

    metrics = (("rmse",) if (is_miwae or is_mnar)
               else ("rmse", "elbo", "negll", "negll_imp"))
    stages = ("test",) if is_mnar else ("train", "test")
    report = {}
    for stage in stages:
        report[stage] = {}
        for metric in metrics:
            r = [run[stage][metric] for run in ref_runs]
            o = [run[stage][metric] for run in our_runs]
            report[stage][metric] = {
                "reference_mean": float(np.mean(r)),
                "reference_std": float(np.std(r)),
                "ours_mean": float(np.mean(o)),
                "ours_std": float(np.std(o)),
            }
    print(json.dumps(report, indent=2))
    # headline verdict: test RMSE within noise (3 combined sigma + rel band)
    t = report["test"]["rmse"]
    tol = 3 * (t["reference_std"] + t["ours_std"]) + args.band * abs(
        t["reference_mean"]
    )
    diff = t["ours_mean"] - t["reference_mean"]
    if abs(diff) <= tol:
        verdict = "PARITY OK"
    elif diff < 0:
        # lower imputation RMSE than the reference — e.g. the MIWAE family,
        # where our implementation fixes the reference's importance-weight
        # axis-scrambling (PARITY.md "Documented deviations" #2)
        verdict = "BETTER THAN REFERENCE"
    else:
        verdict = "WORSE — INVESTIGATE"
    print(f"test RMSE: ref={t['reference_mean']:.4f} ours={t['ours_mean']:.4f} "
          f"diff={diff:+.4f} tol={tol:.4f} (band {args.band:g}) -> {verdict}")
    if args.out:
        rec = {
            "vae_type": args.vae_type, "data_type": args.data_type,
            "epochs": args.epochs, "batch_size": args.batch_size,
            "missing_rate": args.missing_rate, "seeds": args.seeds,
            "reg_type": args.reg_type, "band": args.band,
            "report": report,
            "per_seed": {
                "ref_test_rmse": [r["test"]["rmse"] for r in ref_runs],
                "ours_test_rmse": [o["test"]["rmse"] for o in our_runs],
            },
            "diff": diff, "tol": tol, "verdict": verdict,
        }
        with open(args.out, "a") as fh:
            fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
