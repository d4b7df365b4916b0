"""End-to-end CLI coverage of the AL sweep-ensemble path:
`active_learning.py -ensemble true` runs the (alpha x seed) pre-trained
episode replicas as ONE vmapped program per missing rate
(experiment_main/active_learning.py:_run_sweep_ensemble), consuming the
checkpoints a prior `imputation.py -ensemble true -alphas ... -missings ...
-seeds ...` sweep wrote. Reference serial loop:
src/experiment_main/evaluate.py:300-511 driven per config."""

import subprocess

from tests.cli_harness import cli_env, entry, grid_record, make_sandbox


def test_al_sweep_ensemble_cli(tmp_path, tiny_dataset):
    common = dict(data_type="synth_small", epoch=3, batch_size=16, M=2,
                  train_k=2, valid_k=3, latent_dim=4, hid_dim=32)
    make_sandbox(tmp_path, tiny_dataset, [
        grid_record(vae_type="reg_vae1", missing_rate=30,
                    reg_type="kl_reg", alpha=1.0, **common),
    ])
    sweep_flags = ["-ensemble", "true", "-alphas", "0.5,1.0",
                   "-missings", "30,50", "-seeds", "2"]

    out = subprocess.run(
        ["python3", entry("imputation.py"), *sweep_flags],
        cwd=tmp_path, env=cli_env(), capture_output=True, text=True,
        timeout=580)
    assert out.returncode == 0, out.stderr[-3000:]

    out = subprocess.run(
        ["python3", entry("active_learning.py"), *sweep_flags],
        cwd=tmp_path, env=cli_env(), capture_output=True, text=True,
        timeout=580)
    assert out.returncode == 0, out.stderr[-3000:]
    # all four (missing, alpha) cells report seed error bars, grouped as
    # one vmapped 4-replica episode per rate
    for m in (30, 50):
        for a in ("0.5", "1"):
            assert f"missing={m} alpha={a} final target-MSE=" in out.stdout, (
                out.stdout)
    assert out.stdout.count("±") == 4
    assert out.stdout.count("4-replica episode") == 2

    # per-cell AL artifacts at the reference-mangled paths (+ .seed1)
    rest = (tmp_path / "experiments"
            / "UCI_experiments_consistency_missingness" / "synth_small"
            / "rest" / "reg_vae")
    names = sorted(p.name for p in rest.iterdir())
    curves = [n for n in names if "information_curve" in n]
    assert len([n for n in curves if not n.endswith(".seed1")]) == 4, curves
    assert len([n for n in curves if n.endswith(".seed1")]) == 4, curves
