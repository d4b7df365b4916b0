"""Result-artifact persistence: reference-exact paths + structured JSONL metrics.

The reference serializes every headline metric as a torch-saved scalar/tensor in
a deep, name-mangled directory tree (reference: src/experiment_main/evaluate.py:
247-297 MCAR, 58-69 MNAR, 120-133 MIWAE, 460-511 active learning). We reproduce
those paths character-for-character (so downstream analysis written against the
reference keeps working) and additionally append every metric to a structured
`metrics.jsonl` for observability the reference lacks.

Note (reference quirk kept): the configs' experiment_type is
"UCI_experiments_consistency_missingness" (plural) while the readme claims the
singular directory; we follow the config value, as the reference code does.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from vae_posterior_consistency_tpu.config import RunConfig
from vae_posterior_consistency_tpu.engine.checkpoint import family_dir


def strip_digits(s: str) -> str:
    return "".join(c for c in s if not c.isdigit())


def _base(cfg: RunConfig, root: str, sub: str) -> str:
    return os.path.join(root, cfg.experiment_type, cfg.data_type, sub)


def save_tensor(value, path: str) -> None:
    """torch.save for format parity with the reference's artifacts."""
    import torch

    os.makedirs(os.path.dirname(path), exist_ok=True)
    if not isinstance(value, torch.Tensor):
        value = torch.as_tensor(np.array(value))
    torch.save(value, path)


def log_metric(cfg: RunConfig, name: str, value, stage: str = "",
               root: str = "experiments") -> None:
    """Append one structured metric record (framework addition)."""
    path = os.path.join(root, cfg.experiment_type, cfg.data_type, "metrics.jsonl")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rec = {
        "time": time.time(),
        "vae_type": cfg.vae_type,
        "stage": stage,
        "metric": name,
        "value": float(np.asarray(value).reshape(-1)[0])
        if np.asarray(value).size == 1
        else np.asarray(value).tolist(),
        "alpha": cfg.alpha,
        "p_missingness": cfg.p_missingness,
        "missing_rate": cfg.missing_rate,
        "reg_type": cfg.reg_type,
    }
    with open(path, "a") as fh:
        fh.write(json.dumps(rec) + "\n")


# ---------------------------------------------------------------------------
# MCAR eval artifacts (reference: src/experiment_main/evaluate.py:247-297)
# ---------------------------------------------------------------------------


def eval_vae_paths(cfg: RunConfig, stage: str, root: str = "experiments") -> dict:
    fam = family_dir(cfg.vae_type)
    rest = _base(cfg, root, "rest")
    elbos = _base(cfg, root, "elbos")
    if "vanilla" in cfg.vae_type:
        tail = f"_{cfg.missing_rate}_missing_rate_test.pt"
        return {
            "rmse": os.path.join(rest, fam, f"{stage}_{cfg.vae_type}_rmse{tail}"),
            "elbo": os.path.join(elbos, fam, f"{stage}_{cfg.vae_type}_vae_elbo{tail}"),
            "negll": os.path.join(
                rest, fam, f"{stage}_{cfg.vae_type}_negative_llh{tail}"
            ),
            "negll_imp": os.path.join(
                rest, fam, f"{stage}_{cfg.vae_type}_negative_llh_imputed{tail}"
            ),
        }
    mid = f"_{cfg.alpha}_{cfg.p_missingness}_{cfg.reg_type}"
    tail = f"{mid}_{cfg.missing_rate}_missing_rate_full_reg_test.pt"
    return {
        "rmse": os.path.join(rest, fam, f"{stage}_{cfg.vae_type}_rmse{tail}"),
        "elbo": os.path.join(elbos, fam, f"{stage}_{cfg.vae_type}_vae_elbo{tail}"),
        "negll": os.path.join(
            rest, fam, f"{stage}_{cfg.vae_type}_negative_llh_q{tail}"
        ),
        "negll_imp": os.path.join(
            rest, fam, f"{stage}_{cfg.vae_type}_negative_llh_q_imputed{tail}"
        ),
    }


def eval_miwae_paths(cfg: RunConfig, stage: str, root: str = "experiments") -> dict:
    """(reference: src/experiment_main/evaluate.py:120-133 — note the hard-coded
    '50_missing_rate' in both branches)."""
    fam = family_dir(cfg.vae_type)
    rest = _base(cfg, root, "rest")
    if "vanilla" in cfg.vae_type:
        name = f"{stage}_{cfg.vae_type}_rmse_50_missing_rate_test.pt"
    else:
        name = (
            f"{stage}_{cfg.vae_type}_rmse_{cfg.alpha}_{cfg.p_missingness}_"
            f"{cfg.reg_type}_full_reg_50_missing_rate_test.pt"
        )
    return {"rmse": os.path.join(rest, fam, name)}


def eval_mnar_paths(cfg: RunConfig, root: str = "experiments") -> dict:
    """(reference: src/experiment_main/evaluate.py:58-69 — MNAR uses the
    full-string digit strip, unlike the other savers)."""
    fam = strip_digits(cfg.vae_type)
    rest = _base(cfg, root, "rest")
    if "vanilla" in cfg.vae_type:
        name = f"{cfg.vae_type}_rmse_{cfg.not_miwae_type}_large_batch_test.pt"
    else:
        name = (
            f"{cfg.vae_type}_rmse_{cfg.alpha}_{cfg.p_missingness}_"
            f"{cfg.reg_type}_full_reg_large_batch_v2_test.pt"
        )
    return {"rmse": os.path.join(rest, fam, name)}


def active_learning_paths(cfg: RunConfig, root: str = "experiments") -> dict:
    """(reference: src/experiment_main/evaluate.py:460-511)."""
    fam = family_dir(cfg.vae_type)
    rest = _base(cfg, root, "rest")
    if "vanilla" in cfg.vae_type:
        pre = f"{cfg.vae_type}_{cfg.missing_rate}_missing_rate"
        return {
            "information_curve": os.path.join(
                rest, fam, f"{pre}_UCI_information_curve_CHAI_default_test.pt"
            ),
            "action": os.path.join(
                rest, fam, f"{pre}__UCI_action_CHAI_default_test.pt"
            ),
            "R_hist": os.path.join(
                rest, fam, f"{pre}__UCI_R_hist_CHAI_default_test.pt"
            ),
            "im": os.path.join(rest, fam, f"{pre}__UCI_im_CHAI_default_test.pt"),
        }
    mid = (
        f"_{cfg.alpha}_{cfg.p_missingness}_{cfg.reg_type}_"
        f"{cfg.missing_rate}_missing_rate_default_full_reg_test.pt"
    )
    return {
        "information_curve": os.path.join(
            rest, fam, f"{cfg.vae_type}_UCI_information_curve_CHAI{mid}"
        ),
        "action": os.path.join(rest, fam, f"{cfg.vae_type}_UCI_action_CHAI{mid}"),
        "R_hist": os.path.join(rest, fam, f"{cfg.vae_type}_UCI_R_hist_CHAI{mid}"),
        "im": os.path.join(rest, fam, f"{cfg.vae_type}_UCI_im_CHAI{mid}"),
    }
