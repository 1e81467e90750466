#!/usr/bin/env bash
# Canonical eval recipe (parity: EE/full_test.sh:10-13): dump logits, then
# threshold sweep 0.05..1 step 0.05 for both policies, calibrated and not.
set -euo pipefail
CHECKPOINT=${1:?usage: full_test.sh <checkpoint-dir> [dataset]}
DATASET=${2:-rvl_cdip}

for POLICY in max_confidence_global_thresholding_policy accuracy_calibration_heuristic; do
  for CALIBRATE in false true; do
    python -m multi_modal_early_exit_tpu.cli.evaluate \
        -c "${CHECKPOINT}" -d "${DATASET}" \
        --exit_threshold 0.05 --step 0.05 --full_test true \
        --calibrate "${CALIBRATE}" --exit_policy "${POLICY}"
  done
done
