"""Profile the training step on the real TPU and print the op-time ranking.

Usage (TPU must be free — one process per chip):
    python scripts/profile_train.py [--batch 16] [--steps 3] [--remat]

Traces `steps` chained optimizer steps (distinct per-step batches, same as
bench.py's train mode), parses the xplane protobuf directly (the
tensorboard profile plugin is broken against the installed TF — see
.claude/skills/verify), and prints per-op-name total device time, sorted.
The output drives VERDICT r2 item 2 (training throughput): it names the
kernels/fusions worth attacking.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def parse_xplane(trace_dir: str, top: int = 30):
    """Sum device-plane event durations per event-metadata name."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    ))
    assert paths, f"no xplane.pb under {trace_dir}"
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    totals = {}
    total_all = 0
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e12
                totals[name] = totals.get(name, 0.0) + dur
                total_all += dur
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    return ranked, total_all


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/jax-train-trace")
    args = ap.parse_args()

    os.environ["BENCH_REMAT"] = "1" if args.remat else "0"
    import bench

    from multi_modal_early_exit_tpu.models.ee.model import init_ee_params
    from multi_modal_early_exit_tpu.training.trainer import (
        EETrainer,
        TrainingArguments,
    )

    # match bench.py's train mode: full-unroll encoder (per-layer scan
    # under remat, same reasoning as bench_train; MMEE_LAYERS_PER_STEP,
    # read inside encoder_apply, still overrides either)
    cfg = bench._flagship_cfg(
        training_strategy="one_stage_subgraphs_weighted",
        gradient_checkpointing=args.remat,
        scan_fold=1 if args.remat else 12,
    )
    bb = cfg.backbone
    params32 = init_ee_params(jax.random.key(0), cfg)
    targs = TrainingArguments(
        train_batch_size=args.batch, bf16=True, learning_rate=2e-5
    )
    trainer = EETrainer(cfg, params32, targs, total_steps=1000)
    input_ids, bbox, pixel_values, mask = bench._random_inputs(bb, args.batch)
    labels = jnp.asarray(
        np.random.default_rng(0).integers(0, bb.num_labels, (args.batch,)),
        jnp.int32,
    )
    batch = {
        "input_ids": input_ids[None], "bbox": bbox[None],
        "pixel_values": pixel_values.astype(jnp.float32)[None],
        "attention_mask": mask[None], "labels": labels[None],
    }
    step_fn = trainer._step_fn

    @jax.jit
    def run_n(params, opt_state, batch, key):
        def body(carry, i):
            p, o = carry
            stepped = dict(
                batch,
                input_ids=(batch["input_ids"] + i) % bb.vocab_size,
                bbox=jnp.minimum(batch["bbox"] + i, 1023),
            )
            p, o, loss, _ = step_fn(p, o, stepped, jax.random.fold_in(key, i))
            return (p, o), loss

        (p, o), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(args.steps)
        )
        return p, o, losses.sum()

    key = jax.random.key(1)
    p, o, s = run_n(trainer.params, trainer.opt_state, batch, key)
    print("warm loss sum:", float(s))

    jax.profiler.start_trace(args.trace_dir)
    p, o, s = run_n(p, o, batch, key)
    _ = float(s)
    jax.profiler.stop_trace()

    ranked, total = parse_xplane(args.trace_dir)
    print(json.dumps({"total_device_seconds": round(total, 4),
                      "batch": args.batch, "steps": args.steps,
                      "remat": args.remat}))
    for name, dur in ranked:
        print(f"{dur:10.4f}s  {100 * dur / max(total, 1e-12):5.1f}%  {name}")


if __name__ == "__main__":
    main()
