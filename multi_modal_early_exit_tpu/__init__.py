"""multi_modal_early_exit_tpu — a TPU-native framework for multimodal adaptive
inference with anytime early exiting on document image classification.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the same
capabilities as the reference PyTorch codebase ``Jordy-VL/multi-modal-early-exit``:

- LayoutLMv3 encoder with early-exit heads (ramps, binary gates, learning-to-exit)
  at embedding level (text_avg / vision_avg / text_visual_concat) and after chosen
  encoder layers 1..12  (reference: EE/models/LayoutLMv3.py)
- Multi-loss training strategies (joint, joint_weighted_avg, one_stage_subgraphs
  family with per-exit subgraph weighting and entropy regularisation)
  (reference: EE/models/EE_modules.py:71-113, 301-377)
- Anytime-inference evaluation: per-exit logit harvesting, per-exit temperature
  calibration, offline confidence-threshold exit policies, accuracy-vs-compute
  Pareto analysis  (reference: EE/eval.py, EE/policy.py, EE/thresh.py)
- Metrics suite: accuracy, brier, nll, f1, equal-mass ECE, AURC
  (reference: EE/metrics.py)

TPU-first design notes
----------------------
The reference implements early exit as a Python ``EarlyExitException`` unwinding
the module stack per sample at batch size 1.  Here the encoder is a single
``lax.scan`` over stacked layer parameters; per-layer CLS states are collected
and all exit heads evaluated batched after the scan, and exit decisions are
computed as masked on-device reductions — no host round-trips, no dynamic
shapes, everything jit-compiled once.
"""

__version__ = "0.1.0"

from multi_modal_early_exit_tpu.config.exit_config import (  # noqa: F401
    EarlyExitHead,
    EarlyExitInference,
    EarlyExitStrategy,
    ExitConfig,
)

from multi_modal_early_exit_tpu.serving import Pipeline  # noqa: F401,E402
