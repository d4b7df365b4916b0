"""Experiment entry points (the reference's src/experiment_main/ scripts).

In a repo checkout these run as plain scripts (`python3
experiment_main/imputation.py ...`). In an installed distribution the same
modules ship as `vae_posterior_consistency_tpu.experiment_main` (package-dir
mapping in pyproject.toml) behind the `vpc-impute` / `vpc-impute-mnar` /
`vpc-active-learning` / `vpc-ais` console scripts; each script's sys.path
preamble detects which layout it is in.
"""
