#!/usr/bin/env bash
# Run all three experiment pipelines (reference: run.sh:1-3).
set -e
# entry points sys.path-insert the repo root themselves; appending (not
# replacing) keeps plugin paths like the TPU runtime's intact
export PYTHONPATH=".${PYTHONPATH:+:$PYTHONPATH}"
python3 experiment_main/imputation.py "$@"
python3 experiment_main/imputation_mnar.py "$@"
python3 experiment_main/active_learning.py "$@"
