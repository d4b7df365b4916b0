#!/usr/bin/env bash
# Run all three experiment pipelines (reference: run.sh:1-3).
set -e
export PYTHONPATH=.
python3 experiment_main/imputation.py "$@"
python3 experiment_main/imputation_mnar.py "$@"
python3 experiment_main/active_learning.py "$@"
