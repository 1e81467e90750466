"""Extended benchmark: the anytime accuracy-vs-compute curve on device.

Produces the headline artifact of the reference (accuracy vs average exit /
GFLOPs, EE/thresh.py Pareto scatter + EE/eval.py efficiency logs) measured
live with the staged AnytimeEngine instead of analytically:

    python benchmarks/anytime_bench.py [--n 256] [--thresholds 0.5 0.7 0.9]

For each threshold: run the engine over a synthetic evaluation set, record
(docs/sec, average exit, accuracy, analytic GFLOPs) and print a JSON report.
bench.py remains the driver's one-line contract; this script is the deep
dive.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=256)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--thresholds", type=float, nargs="+",
                        default=[0.3, 0.5, 0.7, 0.9, 1.1])
    parser.add_argument("--tiny", action="store_true",
                        help="tiny config (CPU-friendly smoke run)")
    args = parser.parse_args()

    import os

    import jax

    # the session environment force-registers the TPU backend from
    # sitecustomize; honor an explicit JAX_PLATFORMS=cpu request anyway
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
    from multi_modal_early_exit_tpu.data.datasets import build_synthetic
    from multi_modal_early_exit_tpu.evaluation.analysis import Analysis
    from multi_modal_early_exit_tpu.models.ee.engine import AnytimeEngine
    from multi_modal_early_exit_tpu.models.ee.model import init_ee_params
    from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
        EEModelConfig,
        LayoutLMv3Config,
    )

    if args.tiny:
        backbone = LayoutLMv3Config.tiny(num_labels=4)
        ds = build_synthetic("test", n_eval=args.n, num_labels=4,
                             seq_len=64, image_size=32)
        exits = ("text_avg", "vision_avg", 1)
    else:
        backbone = LayoutLMv3Config.base(num_labels=16)
        ds = build_synthetic("test", n_eval=args.n, num_labels=16)
        exits = ("text_avg", "vision_avg", 7)

    cfg = EEModelConfig(backbone=backbone, exit=ExitConfig(exits=exits))
    params = init_ee_params(jax.random.key(0), cfg)
    analysis = Analysis(params, cfg)

    labels = ds.arrays["labels"]
    results = []
    for threshold in args.thresholds:
        engine = AnytimeEngine(params, cfg, threshold=threshold,
                               max_batch=args.batch)
        # warm all stage/bucket compilations with one pass
        for start in range(0, len(ds), args.batch):
            rows = ds[np.arange(start, min(start + args.batch, len(ds)))]
            engine.infer(rows["input_ids"], rows["bbox"],
                         rows["pixel_values"], rows["attention_mask"])
        t0 = time.perf_counter()
        all_logits, all_exits = [], []
        for start in range(0, len(ds), args.batch):
            rows = ds[np.arange(start, min(start + args.batch, len(ds)))]
            logits, exit_ids, _ = engine.infer(
                rows["input_ids"], rows["bbox"], rows["pixel_values"],
                rows["attention_mask"],
            )
            all_logits.append(logits)
            all_exits.append(exit_ids)
        dt = time.perf_counter() - t0
        logits = np.concatenate(all_logits)
        exit_ids = np.concatenate(all_exits)
        dist = {
            int(e): float(np.mean(exit_ids == e))
            for e in range(cfg.num_exits + 1)
        }
        _, _, full_f, used_f, _, _ = analysis.exit_to_params_and_flops(dist)
        results.append({
            "threshold": threshold,
            "docs_per_sec": round(len(ds) / dt, 2),
            "accuracy": float(np.mean(logits.argmax(-1) == labels)),
            "average_exit": float(np.mean(exit_ids)),
            "gflops_per_doc": round(used_f / 1e9, 3),
            "gflops_reduction": round(1 - used_f / full_f, 4),
            "exit_distribution": dist,
        })
        print(json.dumps(results[-1]))

    print(json.dumps({"anytime_curve": results}))


if __name__ == "__main__":
    main()
