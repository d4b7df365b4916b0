"""End-to-end CLI coverage of the MNAR sweep-ensemble path:
`imputation_mnar.py -ensemble true` trains each record's full
(missing-rate x alpha x seed) product as ONE vmapped program
(experiment_main/imputation_mnar.py:_run_sweep_ensemble over
parallel/sweep.train_sweep_ensemble) and evaluates one compiled MNAR pass
per rate — the reference's serial loops are
src/experiment_main/imputation_mnar.py:30-31."""

import json
import subprocess

from tests.cli_harness import cli_env, entry, grid_record, make_sandbox


def test_mnar_sweep_ensemble_cli(tmp_path, tiny_dataset):
    common = dict(data_type="synth_small", epoch=3, batch_size=16, M=2,
                  train_k=2, valid_k=3, latent_dim=4, hid_dim=32)
    make_sandbox(tmp_path, tiny_dataset, [
        grid_record(vae_type="reg_notMIWAE1", missing_rate=30,
                    reg_type="kl_reg", alpha=1.0, **common),
    ])
    # the MNAR entry reads its own grid file (make_sandbox writes only the
    # MCAR one; write_default_configs would otherwise fabricate wine records)
    (tmp_path / "Data" / "imputation_args_mnar.json").write_text(
        grid_record(vae_type="reg_notMIWAE1", missing_rate=30,
                    reg_type="kl_reg", alpha=1.0, **common) + "\n")

    out = subprocess.run(
        ["python3", entry("imputation_mnar.py"), "-ensemble", "true",
         "-alphas", "0.5,1.0", "-missings", "30,50", "-seeds", "2"],
        cwd=tmp_path, env=cli_env(), capture_output=True, text=True,
        timeout=580)
    assert out.returncode == 0, out.stderr[-3000:]
    # all four (missing, alpha) cells report seed-ensemble error bars
    for m in (30, 50):
        for a in ("0.5", "1"):
            assert f"missing={m} alpha={a} rmse=" in out.stdout, out.stdout
    assert out.stdout.count("±") == 4

    # checkpoints: one per (alpha, rate, seed) at the reference-mangled
    # paths — 4 cells x 2 seeds, seed 0 unsuffixed
    ck = (tmp_path / "experiments"
          / "UCI_experiments_consistency_missingness" / "synth_small"
          / "checkpoints" / "reg_notMIWAE")
    names = sorted(p.name for p in ck.iterdir())
    assert len(names) == 8, names
    assert len([n for n in names if n.endswith(".seed1")]) == 4, names

    # artifacts: each cell's seed-0 RMSE at its own reference path (the
    # reg_notMIWAE artifact name embeds alpha + p_missingness)
    rest = (tmp_path / "experiments"
            / "UCI_experiments_consistency_missingness" / "synth_small"
            / "rest" / "reg_notMIWAE")
    art = sorted(p.name for p in rest.iterdir())
    assert len([n for n in art if "rmse" in n]) == 4, art
    for m in (30, 50):
        for a in ("0.5", "1.0"):
            assert any(f"_{a}_{m}_" in n for n in art), (a, m, art)

    # metrics.jsonl carries one rmse_mnar record per cell
    metrics = (tmp_path / "experiments" / "metrics.jsonl")
    if metrics.exists():
        recs = [json.loads(ln) for ln in metrics.read_text().splitlines()]
        assert len([r for r in recs if r.get("metric") == "rmse_mnar"]) == 4
