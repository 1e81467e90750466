"""Profile the serving cascade on the real TPU and print the op ranking.

Usage (TPU must be free — one process per chip):
    python scripts/profile_cascade.py [--batch 64] [--iters 4]

Traces `iters` cascade forwards (the exact BENCH_MODE=cascade program:
capacities (B/2, B/4), threshold 0.085, per-iteration id variation so XLA
cannot CSE) and parses the xplane protobuf with profile_train.parse_xplane.
Drives docs/PROFILE_CASCADE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from profile_train import parse_xplane  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--trace-dir", default="/tmp/cascade_trace")
    args = ap.parse_args()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from multi_modal_early_exit_tpu.models.ee.cascade import (
        make_cascade_forward,
    )
    from multi_modal_early_exit_tpu.models.ee.model import init_ee_params

    cfg = bench._flagship_cfg()
    bb = cfg.backbone
    params = bench._bf16(init_ee_params(jax.random.key(0), cfg))
    input_ids, bbox, pixel_values, mask = bench._random_inputs(bb, args.batch)
    caps = (max(args.batch // 2, 8), max(args.batch // 4, 8))
    cascade = make_cascade_forward(cfg, capacities=caps, threshold=0.085)

    @jax.jit
    def run_k(params, ids, bbox, pv, mask):
        def body(carry, k):
            shifted = jnp.where(mask > 0, (ids + k) % bb.vocab_size, ids)
            r = cascade(params, shifted, bbox, pv, mask)
            return carry + r.logits.sum() + r.exit_ids.sum(), None

        total, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(args.iters)
        )
        return total

    _ = float(run_k(params, input_ids, bbox, pixel_values, mask))  # warm
    jax.profiler.start_trace(args.trace_dir)
    _ = float(run_k(params, input_ids, bbox, pixel_values, mask))
    jax.profiler.stop_trace()

    ranked, total = parse_xplane(args.trace_dir)
    print(json.dumps({
        "total_device_seconds": round(total, 4),
        "batch": args.batch, "iters": args.iters, "capacities": list(caps),
        "per_batch_ms": round(total / args.iters * 1e3, 2),
    }))
    for name, dur in ranked:
        share = dur / max(total, 1e-12)
        print(f"    {dur:.4f}s  {share*100:5.1f}%  {name[:220]}")


if __name__ == "__main__":
    main()
