"""Extended benchmark: the anytime accuracy-vs-compute curve on device.

Produces the headline artifact of the reference (accuracy vs average exit /
GFLOPs, EE/thresh.py Pareto scatter + EE/eval.py efficiency logs) measured
live on the serving path:

    python benchmarks/anytime_bench.py [--n 256] [--thresholds 0.5 0.7 0.9]

For each threshold: run the single-program cascade (the recommended
serving path) over a synthetic evaluation set with capacities sized from
the batch, and record (docs/sec, average exit, accuracy, analytic GFLOPs).
``--engine`` switches to the staged host-orchestrated ``AnytimeEngine``
instead — kept for comparison; it pays a host sync per stage, which on a
remote-attached accelerator loses badly to the cascade (measured — see
README serving notes).  bench.py remains the driver's one-line contract;
this script is the deep dive.
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
    parser.add_argument("--engine", action="store_true",
                        help="use the staged AnytimeEngine instead of the "
                             "single-program cascade (comparison mode)")
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
    from multi_modal_early_exit_tpu.models.ee.cascade import (
        make_cascade_forward,
    )
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
    batch = args.batch

    labels = ds.arrays["labels"]
    results = []
    for threshold in args.thresholds:
        if args.engine:
            runner = AnytimeEngine(params, cfg, threshold=threshold,
                                   max_batch=batch)

            def infer(rows):
                logits, exit_ids, _ = runner.infer(
                    rows["input_ids"], rows["bbox"], rows["pixel_values"],
                    rows["attention_mask"],
                )
                return logits, exit_ids
        else:
            # capacities halve per stage — generous mid-curve defaults;
            # bench.py's anytime mode derives them from validation instead
            caps = tuple(
                max(batch // (2 ** (i + 1)), 8)
                for i in range(len(cfg.exit.encoder_exits) + 1)
            )
            cascade = jax.jit(
                make_cascade_forward(cfg, capacities=caps, threshold=threshold)
            )

            def infer(rows):
                r = cascade(
                    params,
                    rows["input_ids"], rows["bbox"], rows["pixel_values"],
                    rows["attention_mask"],
                )
                return np.asarray(r.logits), np.asarray(r.exit_ids)

        # warm all compilations with one pass
        for start in range(0, len(ds), batch):
            rows = ds[np.arange(start, min(start + batch, len(ds)))]
            infer(rows)
        t0 = time.perf_counter()
        all_logits, all_exits = [], []
        for start in range(0, len(ds), batch):
            rows = ds[np.arange(start, min(start + batch, len(ds)))]
            logits, exit_ids = infer(rows)
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
            "path": "engine" if args.engine else "cascade",
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
