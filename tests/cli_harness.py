"""Shared scaffolding for tests that drive the experiment_main CLIs as
subprocesses: the JSONL grid-record format (`setup_parser`'s contract), the
sandbox Data dir with a synth_small symlink, and the CPU-forced env. One
definition — a change to the record schema or entry-point env lands here,
not in every CLI test."""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def grid_record(**kw) -> str:
    """One JSONL config record: {name: {default, help}} per field."""
    return json.dumps({k: {"default": v, "help": ""} for k, v in kw.items()})


def make_sandbox(tmp_path, tiny_dataset, records) -> None:
    """Populate tmp_path with Data/{synth_small -> fixture, grid JSONL}."""
    data_dir = tmp_path / "Data"
    data_dir.mkdir()
    (data_dir / "synth_small").symlink_to(
        os.path.join(tiny_dataset, "synth_small"))
    (data_dir / "imputation_args.json").write_text(
        "\n".join(records) + "\n")


def cli_env(**extra) -> dict:
    """Subprocess env: CPU-forced (VPC_PLATFORM beats the pinned TPU
    plugin), repo importable. Extra vars (e.g. XLA_FLAGS) override."""
    env = dict(os.environ)
    env.update(
        VPC_PLATFORM="cpu",
        PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""),
    )
    env.update(extra)
    return env


def entry(name: str) -> str:
    """Absolute path of an experiment_main entry script."""
    return os.path.join(REPO, "experiment_main", name)
