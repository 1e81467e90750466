"""Benchmark harness: anytime-inference throughput of the flagship model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric: docs/sec of the single-program capacity-constrained cascade
(models/ee/cascade.py) on LayoutLMv3-base at the reference compute budget
(512 text + 197 visual tokens), with per-stage capacities (B/2, B/4) — a
mid-curve anytime operating point (~50% of documents exit at the embedding
exits, ~25% at encoder exit 7, ~25% run the full depth, matching the
shape of the reference's Pareto operating points). BENCH_MODE=harvest
benches the all-exits logit-harvesting forward instead (the workload of
EE/utils.py:get_logits, everything at full depth).

vs_baseline: the reference publishes no numbers (BASELINE.md); its eval loop
runs PyTorch at batch size 1 on a single CUDA GPU (EE/configs.py:36,44).
We use 32 docs/sec as the reference-GPU estimate for that workload
(~120 GFLOPs/doc dense forward, typical single-GPU bs=1 HF throughput);
the north-star target is vs_baseline >= 5.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np

# Persistent compilation cache: the Pallas attention kernel takes minutes to
# compile through the remote-TPU tunnel; cache it across processes.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_GPU_DOCS_PER_SEC = 32.0


def main() -> None:
    from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
    from multi_modal_early_exit_tpu.models.ee.model import ee_forward, init_ee_params
    from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
        EEModelConfig,
        LayoutLMv3Config,
    )

    cfg = EEModelConfig(
        backbone=LayoutLMv3Config.base(num_labels=16),
        exit=ExitConfig(exits=("text_avg", "vision_avg", 7)),
    )
    import jax.numpy as jnp

    params = init_ee_params(jax.random.key(0), cfg)
    # bf16 params + activations: MXU-native, halves HBM traffic.
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )

    mode = os.environ.get("BENCH_MODE", "cascade")
    # measured sweet spots on v5e: cascade peaks at batch 64, harvest at 32
    default_batch = {"cascade": 64, "harvest": 32, "train": 16}.get(mode, 32)
    batch = int(os.environ.get("BENCH_BATCH", default_batch))
    seq = 512
    rng = np.random.default_rng(0)
    bb = cfg.backbone
    input_ids = jnp.asarray(rng.integers(10, bb.vocab_size, (batch, seq)), jnp.int32)
    x0 = rng.integers(0, 900, (batch, seq, 1))
    y0 = rng.integers(0, 900, (batch, seq, 1))
    bbox = jnp.asarray(
        np.concatenate(
            [x0, y0, x0 + rng.integers(1, 100, (batch, seq, 1)),
             y0 + rng.integers(1, 100, (batch, seq, 1))], axis=-1
        ),
        jnp.int32,
    )
    pixel_values = jnp.asarray(
        rng.standard_normal((batch, 3, bb.input_size, bb.input_size)), jnp.bfloat16
    )
    mask = jnp.ones((batch, seq), jnp.int32)

    # The session TPU is reached through a tunnel where dispatch is
    # fire-and-forget (block_until_ready returns before execution) and
    # device->host bandwidth is tiny. Honest timing therefore runs K
    # forwards *inside one jit* via lax.scan and fetches a single scalar:
    # one dispatch round-trip, negligible transfer, full on-chip execution.
    K = int(os.environ.get("BENCH_K", 16))

    if mode == "train":
        # training-step throughput: the reference's hot loop
        # (EE/models/EE_modules.py:344-377). bf16 compute, remat over the
        # encoder scan, one_stage_subgraphs_weighted strategy.
        import dataclasses as _dc

        from multi_modal_early_exit_tpu.training.trainer import (
            EETrainer,
            TrainingArguments,
        )

        remat = os.environ.get("BENCH_REMAT", "0") == "1"
        cfg = EEModelConfig(
            backbone=_dc.replace(
                cfg.backbone, gradient_checkpointing=remat
            ),
            exit=ExitConfig(
                exits=("text_avg", "vision_avg", 7),
                training_strategy="one_stage_subgraphs_weighted",
            ),
        )
        params32 = init_ee_params(jax.random.key(0), cfg)
        args = TrainingArguments(
            train_batch_size=batch, bf16=True, learning_rate=2e-5
        )
        trainer = EETrainer(cfg, params32, args, total_steps=1000)
        labels = jnp.asarray(rng.integers(0, bb.num_labels, (batch,)), jnp.int32)
        step_batch = {
            "input_ids": input_ids[None], "bbox": bbox[None],
            "pixel_values": jnp.asarray(
                np.asarray(pixel_values), jnp.float32
            )[None],
            "attention_mask": mask[None], "labels": labels[None],
        }
        rng_key = jax.random.key(1)

        # Honest tunnel timing (same reasoning as the inference modes): a
        # per-step host sync pays the dispatch round-trip 20 times, which at
        # this latency is a large fraction of a step. Chain n_inner real
        # optimizer steps inside ONE jit via lax.scan and fetch one scalar.
        step_fn = trainer._step_fn
        n_inner = 5

        @jax.jit
        def run_n(params, opt_state, batch, key):
            def body(carry, i):
                p, o = carry
                p, o, loss, _ = step_fn(p, o, batch, jax.random.fold_in(key, i))
                return (p, o), loss
            (p, o), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(n_inner)
            )
            return p, o, losses.sum()

        params_t, opt_t, s = run_n(
            trainer.params, trainer.opt_state, step_batch, rng_key
        )
        _ = float(s)  # compile + warm

        n_calls = 4
        t0 = time.perf_counter()
        for i in range(n_calls):
            params_t, opt_t, s = run_n(
                params_t, opt_t, step_batch, jax.random.fold_in(rng_key, i)
            )
            _ = float(s)
        dt = time.perf_counter() - t0
        docs_per_sec = batch * n_inner * n_calls / dt
        print(
            json.dumps(
                {
                    "metric": "train_step_docs_per_sec_per_chip",
                    "value": round(docs_per_sec, 2),
                    "unit": "docs/sec",
                    "vs_baseline": round(
                        docs_per_sec / REFERENCE_GPU_DOCS_PER_SEC, 2
                    ),
                }
            )
        )
        return

    if mode == "cascade":
        from multi_modal_early_exit_tpu.models.ee.cascade import (
            make_cascade_forward,
        )

        caps = (max(batch // 2, 8), max(batch // 4, 8))
        cascade = make_cascade_forward(cfg, capacities=caps, threshold=0.085)

        @jax.jit
        def fwd_k(params, input_ids, bbox, pixel_values, mask):
            def body(carry, k):
                ids = jnp.where(
                    mask > 0, (input_ids + k) % bb.vocab_size, input_ids
                )
                r = cascade(params, ids, bbox, pixel_values, mask)
                return carry + r.logits.sum() + r.exit_ids.sum(), None

            total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return total

        metric = "anytime_cascade_docs_per_sec_per_chip"
    else:

        @jax.jit
        def fwd_k(params, input_ids, bbox, pixel_values, mask):
            def body(carry, k):
                # fold the step index into the inputs so XLA cannot CSE the
                # K iterations into one
                ids = jnp.where(
                    mask > 0, (input_ids + k) % bb.vocab_size, input_ids
                )
                out = ee_forward(
                    params, cfg, ids, bbox, pixel_values, mask,
                    seq_pad_multiple=128,
                )
                store = out.policy_logits()
                return carry + store.astype(jnp.float32).sum(), None

            total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return total

        metric = "ee_harvest_docs_per_sec_per_chip"

    _ = float(fwd_k(params, input_ids, bbox, pixel_values, mask))  # compile+warm

    n_calls = 3
    t0 = time.perf_counter()
    for _ in range(n_calls):
        _ = float(fwd_k(params, input_ids, bbox, pixel_values, mask))
    dt = time.perf_counter() - t0

    docs_per_sec = batch * K * n_calls / dt
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(docs_per_sec, 2),
                "unit": "docs/sec",
                "vs_baseline": round(docs_per_sec / REFERENCE_GPU_DOCS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
