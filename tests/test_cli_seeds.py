"""End-to-end CLI coverage of the `-seeds N` pipeline: the imputation grid
writes seed-replica checkpoints (seed 0 on the reference artifact contract,
`.seed{s}` siblings for the rest — engine/checkpoint.seed_suffix), eval
artifacts are written once (seed-0 rows only, eval_vae_ensemble's
save_rows), and ais_eval consumes the replicas through
checkpoint.load_seed_ensemble with its defaults taken from the grid record
matching `-vae_type`. (Reference serial loops:
src/experiment_main/imputation.py:21-25; src/utils/AIS.py:80-91.)"""

import os
import subprocess

from tests.cli_harness import cli_env, entry, grid_record, make_sandbox


def test_seeds_pipeline_imputation_then_ais(tmp_path, tiny_dataset):
    common = dict(data_type="synth_small", epoch=4, batch_size=16, M=2,
                  train_k=2, valid_k=3, latent_dim=4, hid_dim=64)
    # record[0] at a DIFFERENT missing rate than the vanilla_vae record:
    # ais_eval must take its checkpoint-path defaults from the matching
    # record, not record[0] (the bug the two-pass parse fixed)
    make_sandbox(tmp_path, tiny_dataset, [
        grid_record(vae_type="reg_MIWAE1", missing_rate=50, **common),
        grid_record(vae_type="vanilla_vae1", missing_rate=30, **common),
    ])

    out = subprocess.run(
        ["python3", entry("imputation.py"),
         "-ensemble", "true", "-seeds", "2"],
        cwd=tmp_path, env=cli_env(), capture_output=True, text=True,
        timeout=580)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "seeds=2" in out.stdout and "±" in out.stdout

    ck = (tmp_path / "experiments" / "UCI_experiments_consistency_missingness"
          / "synth_small" / "checkpoints" / "vanilla_vae")
    base = ck / "checkpoint_vanilla_vae1_30_missing_rate_test.pt"
    assert base.exists() and (ck / (base.name + ".seed1")).exists()
    assert not (ck / (base.name + ".seed0")).exists()  # seed 0 unsuffixed
    # eval artifacts written once, at the reference (seed-0) paths only
    rest_dir = (tmp_path / "experiments"
                / "UCI_experiments_consistency_missingness" / "synth_small"
                / "rest" / "vanilla_vae")
    names = sorted(p.name for p in rest_dir.iterdir())
    assert [n for n in names if "rmse" in n], names
    assert not [n for n in names if ".seed" in n], names

    out = subprocess.run(
        ["python3", entry("ais_eval.py"),
         "-vae_type", "vanilla_vae1", "-seeds", "2"],
        cwd=tmp_path, env=cli_env(), capture_output=True, text=True,
        timeout=580)
    assert out.returncode == 0, out.stderr[-3000:]
    # per-seed AIS estimates with error bars on both splits
    assert "[train] AIS log p(x)" in out.stdout and "s1=" in out.stdout
    elbos = (tmp_path / "experiments" / "vanilla_vae1" / "synth_small"
             / "elbos" / "30_missing" / "4_epochs")
    assert (elbos / "train_ais.pt").exists()
    assert (elbos / "train_ais.pt.seed1").exists()


def test_cli_early_stop_smoke(tmp_path, tiny_dataset):
    """`-early_stop true` wires utils.early_stopping into the serial grid
    (config.early_stopper, thresholded by the record's `patience` field —
    the knob the reference ships in every JSONL record but never consumes,
    src/experiment_main/train.py:4). A 4-epoch run performs its end-of-run
    validation check (the verbose improvement line proves the tracker ran)
    and still writes the reference-contract artifacts."""
    common = dict(data_type="synth_small", epoch=4, batch_size=16, M=2,
                  train_k=2, valid_k=3, latent_dim=4, hid_dim=64, patience=2)
    make_sandbox(tmp_path, tiny_dataset, [
        grid_record(vae_type="vanilla_vae1", missing_rate=30, **common),
    ])

    out = subprocess.run(
        ["python3", entry("imputation.py"), "-early_stop", "true"],
        cwd=tmp_path, env=cli_env(), capture_output=True, text=True,
        timeout=580)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "Validation loss decreased" in out.stdout
    ck = (tmp_path / "experiments" / "UCI_experiments_consistency_missingness"
          / "synth_small" / "checkpoints" / "vanilla_vae")
    assert (ck / "checkpoint_vanilla_vae1_30_missing_rate_test.pt").exists()


def test_ensemble_vae_type_restricts_grid(tmp_path, tiny_dataset):
    """`-ensemble true -vae_type X` trains ONLY record X's config
    (config.restrict_grid_records, shared by all entry points): the other
    record's checkpoints must NOT appear, the restriction banner prints,
    and X trains under its OWN record defaults (missing_rate 50 here —
    record[0]'s is 30, so a leaked override would write a
    `..._30_missing_rate_...` checkpoint instead)."""
    common = dict(data_type="synth_small", epoch=4, batch_size=16, M=2,
                  train_k=2, valid_k=3, latent_dim=4, hid_dim=64)
    make_sandbox(tmp_path, tiny_dataset, [
        grid_record(vae_type="reg_MIWAE1", missing_rate=30, **common),
        grid_record(vae_type="vanilla_vae1", missing_rate=50, **common),
    ])

    out = subprocess.run(
        ["python3", entry("imputation.py"),
         "-ensemble", "true", "-seeds", "2", "-vae_type", "vanilla_vae1"],
        cwd=tmp_path, env=cli_env(), capture_output=True, text=True,
        timeout=580)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "grid restricted" in out.stdout, out.stdout[-2000:]

    ck_root = (tmp_path / "experiments"
               / "UCI_experiments_consistency_missingness" / "synth_small"
               / "checkpoints")
    vae_ck = (ck_root / "vanilla_vae"
              / "checkpoint_vanilla_vae1_50_missing_rate_test.pt")
    assert vae_ck.exists(), sorted(ck_root.rglob("*"))
    miwae_hits = [p for p in ck_root.rglob("*.pt*") if "MIWAE" in p.name]
    assert not miwae_hits, miwae_hits
