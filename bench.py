"""Benchmark harness. Prints one JSON line per mode, ending with THE
headline line {"metric", "value", "unit", "vs_baseline", ...}.

Modes (BENCH_MODE env; default "all" runs every mode and ends with the
headline):

- ``anytime``  the north-star artifact: train LayoutLMv3-base on the
  synthetic dataset ON DEVICE, calibrate per-exit temperatures on
  validation, derive thresholds + static cascade capacities from the
  *validation* exit distribution (no hand-picked numbers), then measure
  docs/sec AND accuracy AND average exit depth of the serving cascade at
  each operating point.  Reference anchors: EE/eval.py:62-84 (efficiency
  log), EE/thresh.py:228-302 (accuracy-vs-average-exit curve).
- ``cascade``  fixed-mix cascade throughput (LayoutLMv3-base, random
  weights, (B/2, B/4) capacities — the r01/r02 headline, kept for
  continuity).
- ``harvest``  all-exits logit-harvesting forward (EE/utils.py:get_logits
  workload, full depth).
- ``train``    training-step throughput (the reference hot loop,
  EE/models/EE_modules.py:344-377).

vs_baseline: the reference publishes no numbers (BASELINE.md); its eval
loop runs PyTorch at batch size 1 on a single CUDA GPU (EE/configs.py:36,44).
We use an estimated 32 docs/sec for that workload (~120 GFLOPs/doc dense
forward, typical single-GPU bs=1 HF throughput); the JSON labels the
estimate explicitly and carries the *measured* torch-CPU anchor from
scripts/measure_torch_baseline.py (BASELINE_TORCH_CPU.json) alongside it.

Timing through the session's remote-TPU tunnel: dispatch is
fire-and-forget (block_until_ready returns before execution) and
device<->host bandwidth is ~0.4 MB/s both ways.  Honest numbers therefore
(a) run K iterations *inside one jit* via lax.scan and time the fetch of a
single scalar, and (b) never ship bulk data: the anytime mode regenerates
the synthetic page images on device from the label vector
(data/datasets.py:synthetic_band_images_device) and transfers only the
few-MB token arrays.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

# BENCH_TINY is a CPU-sized functional smoke: force the CPU backend (must
# happen before any jax.devices() call — the axon TPU backend is
# force-registered from sitecustomize) so smokes never collide with a TPU
# job holding the chip.
if os.environ.get("BENCH_TINY", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the Pallas attention kernel takes minutes to
# compile through the remote-TPU tunnel; cache it across processes.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_GPU_DOCS_PER_SEC = 32.0
BASELINE_LABEL = "estimated-32-docs/sec-reference-gpu-bs1"
SEQ = 512  # reference budget: 512 text tokens (+197 visual)


def _measured_cpu_anchor():
    """The measured torch-CPU bs=1 datapoint, if the artifact exists."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_TORCH_CPU.json"
    )
    try:
        with open(path) as f:
            return json.load(f)["value"]
    except Exception:
        return None


def _flagship_cfg(training_strategy=None, gradient_checkpointing=False,
                  gamma=None, scan_fold=None):
    from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
    from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
        EEModelConfig,
        LayoutLMv3Config,
    )

    exit_kwargs = {"exits": ("text_avg", "vision_avg", 7)}
    if training_strategy:
        exit_kwargs["training_strategy"] = training_strategy
    if gamma is not None:
        exit_kwargs["gamma"] = gamma
    bb = LayoutLMv3Config.base(num_labels=16)
    if gradient_checkpointing or scan_fold:
        import dataclasses

        bb = dataclasses.replace(
            bb,
            gradient_checkpointing=gradient_checkpointing,
            scan_fold=scan_fold or 1,
        )
    return EEModelConfig(backbone=bb, exit=ExitConfig(**exit_kwargs))


def _random_inputs(bb, batch: int, seq: int = SEQ, seed: int = 0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
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
    return input_ids, bbox, pixel_values, mask


def _bf16(params):
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )


def _result(metric: str, docs_per_sec: float, **extra) -> dict:
    out = {
        "metric": metric,
        "value": round(docs_per_sec, 2),
        "unit": "docs/sec",
        "vs_baseline": round(docs_per_sec / REFERENCE_GPU_DOCS_PER_SEC, 2),
        "baseline": BASELINE_LABEL,
    }
    out.update(extra)
    return out


# ---------------------------------------------------------------------------
# fixed-input modes (random weights): cascade / harvest / train
# ---------------------------------------------------------------------------

def bench_cascade(batch: int, K: int) -> dict:
    import jax.numpy as jnp

    from multi_modal_early_exit_tpu.models.ee.cascade import make_cascade_forward
    from multi_modal_early_exit_tpu.models.ee.model import init_ee_params

    cfg = _flagship_cfg()
    bb = cfg.backbone
    params = _bf16(init_ee_params(jax.random.key(0), cfg))
    input_ids, bbox, pixel_values, mask = _random_inputs(bb, batch)

    caps = (max(batch // 2, 8), max(batch // 4, 8))
    cascade = make_cascade_forward(cfg, capacities=caps, threshold=0.085)

    @jax.jit
    def fwd_k(params, input_ids, bbox, pixel_values, mask):
        def body(carry, k):
            # fold the step index into the inputs so XLA cannot CSE the
            # K iterations into one
            ids = jnp.where(mask > 0, (input_ids + k) % bb.vocab_size, input_ids)
            r = cascade(params, ids, bbox, pixel_values, mask)
            return carry + r.logits.sum() + r.exit_ids.sum(), None

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return total

    _ = float(fwd_k(params, input_ids, bbox, pixel_values, mask))  # compile+warm
    n_calls = 3
    t0 = time.perf_counter()
    for _ in range(n_calls):
        _ = float(fwd_k(params, input_ids, bbox, pixel_values, mask))
    dt = time.perf_counter() - t0
    return _result(
        "anytime_cascade_docs_per_sec_per_chip", batch * K * n_calls / dt,
        batch=batch, capacities=list(caps),
    )


def bench_harvest(batch: int, K: int) -> dict:
    import jax.numpy as jnp

    from multi_modal_early_exit_tpu.models.ee.model import (
        ee_forward,
        init_ee_params,
    )

    cfg = _flagship_cfg()
    bb = cfg.backbone
    params = _bf16(init_ee_params(jax.random.key(0), cfg))
    input_ids, bbox, pixel_values, mask = _random_inputs(bb, batch)

    @jax.jit
    def fwd_k(params, input_ids, bbox, pixel_values, mask):
        def body(carry, k):
            ids = jnp.where(mask > 0, (input_ids + k) % bb.vocab_size, input_ids)
            out = ee_forward(
                params, cfg, ids, bbox, pixel_values, mask, seq_pad_multiple=128
            )
            store = out.policy_logits()
            return carry + store.astype(jnp.float32).sum(), None

        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return total

    _ = float(fwd_k(params, input_ids, bbox, pixel_values, mask))
    n_calls = 3
    t0 = time.perf_counter()
    for _ in range(n_calls):
        _ = float(fwd_k(params, input_ids, bbox, pixel_values, mask))
    dt = time.perf_counter() - t0
    return _result(
        "ee_harvest_docs_per_sec_per_chip", batch * K * n_calls / dt, batch=batch
    )


def bench_train(batch: int) -> dict:
    import jax.numpy as jnp

    from multi_modal_early_exit_tpu.models.ee.model import init_ee_params
    from multi_modal_early_exit_tpu.training.trainer import (
        EETrainer,
        TrainingArguments,
    )

    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    # full-unroll encoder for the train step: the bias cotangent never
    # round-trips the HBM accumulator (146.9 -> 162.2 docs/sec measured,
    # docs/PROFILE_TRAIN.md; scan_fold 4/6 OOM, 2/3 are intermediate).
    # Under remat keep the per-layer scan: jax.checkpoint wraps the scan
    # BODY, so folding all layers into one step would checkpoint the whole
    # encoder at once and nullify the per-layer remat being measured.
    # (MMEE_LAYERS_PER_STEP, read inside encoder_apply, still overrides.)
    cfg = _flagship_cfg(
        training_strategy="one_stage_subgraphs_weighted",
        gradient_checkpointing=remat,
        scan_fold=1 if remat else 12,
    )
    bb = cfg.backbone
    params32 = init_ee_params(jax.random.key(0), cfg)
    args = TrainingArguments(
        train_batch_size=batch, bf16=True, learning_rate=2e-5,
        bf16_momentum=os.environ.get("MMEE_BF16_MOMENTUM", "0") == "1",
    )
    trainer = EETrainer(cfg, params32, args, total_steps=1000)

    rng = np.random.default_rng(0)
    input_ids, bbox, pixel_values, mask = _random_inputs(bb, batch)
    labels = jnp.asarray(rng.integers(0, bb.num_labels, (batch,)), jnp.int32)
    step_batch = {
        "input_ids": input_ids[None], "bbox": bbox[None],
        "pixel_values": pixel_values.astype(jnp.float32)[None],
        "attention_mask": mask[None], "labels": labels[None],
    }
    rng_key = jax.random.key(1)

    # Honest tunnel timing: chain n_inner real optimizer steps inside ONE
    # jit via lax.scan and fetch one scalar.
    step_fn = trainer._step_fn
    n_inner = 5

    @jax.jit
    def run_n(params, opt_state, batch, key):
        def body(carry, i):
            p, o = carry
            # vary ids AND bbox per step: real training sees a fresh batch
            # every step, so the attention-bias build must not be hoisted
            # (CSE'd) out of the scan
            stepped = dict(
                batch,
                input_ids=(batch["input_ids"] + i) % bb.vocab_size,
                bbox=jnp.minimum(batch["bbox"] + i, 1023),
            )
            p, o, loss, _ = step_fn(p, o, stepped, jax.random.fold_in(key, i))
            return (p, o), loss

        (p, o), losses = jax.lax.scan(body, (params, opt_state), jnp.arange(n_inner))
        return p, o, losses.sum()

    params_t, opt_t, s = run_n(trainer.params, trainer.opt_state, step_batch, rng_key)
    _ = float(s)  # compile + warm

    n_calls = 4
    t0 = time.perf_counter()
    for i in range(n_calls):
        params_t, opt_t, s = run_n(
            params_t, opt_t, step_batch, jax.random.fold_in(rng_key, i)
        )
        _ = float(s)
    dt = time.perf_counter() - t0
    return _result(
        "train_step_docs_per_sec_per_chip", batch * n_inner * n_calls / dt,
        batch=batch, remat=remat,
    )


# ---------------------------------------------------------------------------
# anytime mode: the joint throughput <-> accuracy artifact
# ---------------------------------------------------------------------------

def _device_split(
    split: str, n: int, bb, seed_offset: int, seq: int = SEQ,
    difficulty: float = 0.0, base_seed: int = 42,
):
    """Synthetic split fully materialized on device: token arrays shipped
    (a few MB), page images regenerated on device from the per-example
    visual-id vector (equals the label on easy examples; the vision pair's
    shared id on visually-ambiguous ones — data/datasets.synthetic_tokens)."""
    import jax.numpy as jnp

    from multi_modal_early_exit_tpu.data.datasets import (
        synthetic_band_images_device,
        synthetic_tokens,
    )
    from multi_modal_early_exit_tpu.data.images import preprocess_images

    toks = synthetic_tokens(
        n, num_labels=bb.num_labels, seq_len=seq,
        seed=base_seed + 1000 * seed_offset, difficulty=difficulty,
    )
    labels = jax.device_put(toks["labels"])
    data = {
        "input_ids": jax.device_put(toks["input_ids"].astype(np.int32)),
        # bbox values < 1024: ship int16 (halves transfer), widen on device
        "bbox": jax.device_put(toks["bbox"].astype(np.int16)).astype(jnp.int32),
        "attention_mask": jax.device_put(
            toks["attention_mask"].astype(np.int8)
        ).astype(jnp.int32),
        "labels": labels,
    }
    visual_ids = jax.device_put(toks["visual_ids"].astype(np.int8)).astype(
        jnp.int32
    )
    images = synthetic_band_images_device(visual_ids, bb.input_size)
    # store pages bf16: the whole pipeline runs bf16 anyway, and f32 pages
    # for a several-thousand-doc train split are GBs of HBM (OOMs alongside
    # the training state at n_train=4096)
    data["pixel_values"] = preprocess_images(images, size=bb.input_size).astype(
        jnp.bfloat16
    )
    return data, toks["labels"]


def bench_anytime(serve_batch: int, K: int) -> dict:
    import jax.numpy as jnp

    from multi_modal_early_exit_tpu.evaluation.calibration import (
        calibrate_exit_logits,
    )
    from multi_modal_early_exit_tpu.evaluation.operating_points import (
        select_operating_points,
    )
    from multi_modal_early_exit_tpu.models.ee.cascade import make_cascade_forward
    from multi_modal_early_exit_tpu.models.ee.model import (
        ee_forward,
        init_ee_params,
    )
    from multi_modal_early_exit_tpu.training.trainer import (
        EETrainer,
        TrainingArguments,
        make_train_step,
    )

    tiny = os.environ.get("BENCH_TINY", "0") == "1"
    n_train = int(os.environ.get("BENCH_ANYTIME_TRAIN", 96 if tiny else 4096))
    # 512 eval docs (r5): at 256 one document is 0.39pt of accuracy — too
    # coarse to distinguish threshold-transfer regret from noise
    n_eval = int(os.environ.get("BENCH_ANYTIME_EVAL", 64 if tiny else 512))
    epochs = int(os.environ.get("BENCH_ANYTIME_EPOCHS", 4 if tiny else 16))
    train_batch = int(os.environ.get("BENCH_ANYTIME_BATCH", 8 if tiny else 16))
    # from-scratch base-size recipe for the difficulty>0 task (probed per
    # exit, see BENCH_ANYTIME_EVAL_EVERY): gamma=0.7 (the reference's
    # canonical split, EE/train_full_dataset.sh) is the load-bearing part —
    # without it the inverse-param-weighted exit losses swamp the shared
    # embedding gradients and the deep path stays at chance on TRAIN data
    # (measured: full-depth 0.09 after 2048 steps at gamma=0 vs 0.98 after
    # 1024 steps at gamma=0.7); lr above ~3e-4 destabilizes the post-LN
    # stack
    lr = float(os.environ.get("BENCH_ANYTIME_LR", 1e-3 if tiny else 1e-4))
    warmup = float(os.environ.get("BENCH_ANYTIME_WARMUP", 0.1))
    # non-saturating task by default: token/visual ambiguity + label noise
    # (data/datasets.synthetic_tokens) so iso-accuracy operating points are
    # non-degenerate — full-depth accuracy < 1 and early exits genuinely
    # cost accuracy (VERDICT r3 #1)
    difficulty = float(os.environ.get("BENCH_DIFFICULTY", 1.0))
    seq = 32 if tiny else SEQ

    if tiny:
        # CPU-runnable smoke configuration for validating the flow
        from multi_modal_early_exit_tpu.config.exit_config import ExitConfig
        from multi_modal_early_exit_tpu.models.layoutlmv3.config import (
            EEModelConfig,
            LayoutLMv3Config,
        )

        cfg = EEModelConfig(
            backbone=LayoutLMv3Config.tiny(num_labels=4),
            exit=ExitConfig(
                exits=("text_avg", "vision_avg", 1),
                training_strategy="one_stage_subgraphs_weighted",
                gamma=float(os.environ.get("BENCH_GAMMA", 0.7)),
            ),
        )
        serve_batch = min(serve_batch, 32)
    else:
        # gamma=0.7: the reference's canonical recipe
        # (EE/train_full_dataset.sh:3-9) — exit losses x gamma/E, final CE
        # x (1-gamma); without it the heavily-weighted tiny-subgraph exit
        # losses dominate the shared-embedding gradients on the hard task
        cfg = _flagship_cfg(
            training_strategy="one_stage_subgraphs_weighted",
            gamma=float(os.environ.get("BENCH_GAMMA", 0.7)),
        )
    bb = cfg.backbone
    n_emb, n_stages = 2, 2

    # BENCH_SEED varies data splits + init + training keys together, for
    # multi-seed validation of the operating-point transfer (VERDICT r4 #6)
    bench_seed = int(os.environ.get("BENCH_SEED", "0"))
    base = 42 + 7919 * bench_seed
    train_data, _ = _device_split(
        "train", n_train, bb, 0, seq, difficulty, base
    )
    val_data, val_labels = _device_split(
        "validation", n_eval, bb, 1, seq, difficulty, base
    )
    test_data, test_labels = _device_split(
        "test", n_eval, bb, 2, seq, difficulty, base
    )

    # ---- train: epochs chained on device, one scalar fetch per epoch ----
    steps = n_train // train_batch
    args = TrainingArguments(
        learning_rate=lr, train_batch_size=train_batch, bf16=True,
        num_epochs=epochs, seed=0, warmup_ratio=warmup,
    )
    params = init_ee_params(jax.random.key(bench_seed), cfg)
    # train with the full-unroll encoder (scan_fold; see bench_train) —
    # eval/harvest/cascade keep the scanned form (fold only pays off in the
    # backward's bias-cotangent accumulation)
    import dataclasses as _dc

    train_cfg = cfg if tiny else _dc.replace(
        cfg, backbone=_dc.replace(cfg.backbone, scan_fold=12)
    )
    trainer = EETrainer(train_cfg, params, args, total_steps=epochs * steps)
    step_raw = make_train_step(
        train_cfg, trainer.tx, trainer.exit_weights, accum_steps=1,
        compute_dtype=jnp.bfloat16,
    )

    # Chunked stepping: a whole-epoch scan compiles a program whose
    # per-step attention-bias buffers the remote AOT compiler materializes
    # together (HBM OOM at compile); small chunks keep the program bounded
    # while still amortizing dispatch over several real optimizer steps.
    chunk = int(os.environ.get("BENCH_ANYTIME_CHUNK", 4 if tiny else 8))

    @jax.jit
    def arrange_epoch(data, idx):
        return {
            k: jnp.take(v, idx, axis=0).reshape(
                (steps, 1, train_batch) + v.shape[1:]
            )
            for k, v in data.items()
        }

    def run_chunk(params, opt_state, chunk_data, key):
        def body(carry, xs):
            p, o = carry
            micro, i = xs
            p, o, loss, _ = step_raw(p, o, micro, jax.random.fold_in(key, i))
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            (chunk_data, jnp.arange(chunk)),
        )
        return params, opt_state, losses.mean()

    run_chunk_j = jax.jit(run_chunk, donate_argnums=(0, 1))

    # per-exit train/val accuracy probe (few-batch, bf16): the train<->val
    # gap per exit is the dead-giveaway signal for deep-path memorization
    # on the ambiguous task vs the linear heads' rule learning
    eval_every = int(os.environ.get("BENCH_ANYTIME_EVAL_EVERY", 4))
    probe_n = min(n_eval, 128)

    @jax.jit
    def probe_acc(p, ids, bbox, pv, mask, labels):
        out = ee_forward(p, cfg, ids, bbox, pv, mask, seq_pad_multiple=128)
        store = out.policy_logits()  # (E+1, B, K)
        return (store.argmax(-1) == labels[None]).mean(axis=1)

    def probe(p, data, n):
        p16 = _bf16(p)  # cast once outside the jit (no in-program duplicate)
        accs = []
        for s in range(0, n, 32):
            sl = slice(s, min(s + 32, n))
            accs.append(np.asarray(probe_acc(
                p16, data["input_ids"][sl], data["bbox"][sl],
                data["pixel_values"][sl], data["attention_mask"][sl],
                data["labels"][sl],
            )))
        return np.mean(accs, axis=0)

    params, opt_state = trainer.params, trainer.opt_state
    key = jax.random.key(7 + bench_seed)
    perm_rng = np.random.default_rng(bench_seed)
    losses = []
    t_train0 = time.perf_counter()
    for e in range(epochs):
        idx = jnp.asarray(
            perm_rng.permutation(n_train)[: steps * train_batch]
        )
        epoch_data = arrange_epoch(train_data, idx)
        for c0 in range(0, steps - chunk + 1, chunk):
            chunk_data = jax.tree.map(
                lambda x: x[c0 : c0 + chunk], epoch_data
            )
            params, opt_state, loss = run_chunk_j(
                params, opt_state, chunk_data,
                jax.random.fold_in(key, e * steps + c0),
            )
        losses.append(float(loss))
        print(f"anytime: epoch {e + 1}/{epochs} loss {losses[-1]:.4f}",
              file=sys.stderr, flush=True)
        if eval_every and ((e + 1) % eval_every == 0 or e + 1 == epochs):
            tr_acc = probe(params, train_data, probe_n)
            va_acc = probe(params, val_data, probe_n)
            fmt = lambda a: "[" + " ".join(f"{x:.2f}" for x in a) + "]"
            print(
                f"anytime: epoch {e + 1} per-exit acc train {fmt(tr_acc)} "
                f"val {fmt(va_acc)} (exits..., final)",
                file=sys.stderr, flush=True,
            )
    train_secs = time.perf_counter() - t_train0

    params = _bf16(params)  # serving precision from here on

    # ---- harvest full-depth logit stores (val for calibration+derivation,
    # test for reporting) ----
    @jax.jit
    def harvest_fwd(p, ids, bbox, pv, mask):
        return ee_forward(
            p, cfg, ids, bbox, pv, mask, seq_pad_multiple=128
        ).policy_logits().astype(jnp.float32)

    # the all-exits harvest keeps the full (B,H,S,S) bias live; 48 is the
    # measured standalone sweet spot (531 @ 32, 579 @ 40-48, 565 @ 64) but
    # here the batch must DIVIDE n_eval — a remainder batch would compile a
    # second harvest program through the tunnel for a one-off few-ms win.
    # Largest divisor <= serve_batch (NOT repeated halving, which collapses
    # to single-digit batches when serve_batch shares no power-of-two
    # factor with n_eval, e.g. 48 vs 512)
    harvest_batch = max(
        d for d in range(1, serve_batch + 1) if n_eval % d == 0
    )

    def harvest(data):
        stores = []
        n = int(data["labels"].shape[0])
        for s in range(0, n, harvest_batch):
            sl = slice(s, s + harvest_batch)
            stores.append(
                np.asarray(
                    harvest_fwd(
                        params, data["input_ids"][sl], data["bbox"][sl],
                        data["pixel_values"][sl], data["attention_mask"][sl],
                    )
                )
            )
        return np.concatenate(stores, axis=1)  # (E+1, N, K)

    val_store = harvest(val_data)
    test_store = harvest(test_data)
    val_refs = np.asarray(val_labels)
    test_refs = np.asarray(test_labels)

    # ---- calibrate on validation; derive operating points from the
    # validation exit distribution (no hand-picked thresholds/capacities) --
    # calibrate_exit_logits covers every store row incl. the final
    # classifier (as the reference's eval.calibrate does)
    _, cal_metrics = calibrate_exit_logits(val_store, val_refs, val_store)
    # clamp: on (near-)separable validation data NLL drives T -> 0, which
    # would overflow logits/T in the criterion without changing decisions.
    # Raw fits + clamp hits are REPORTED (VERDICT r4 #9), not hidden: a
    # clamped fit means the validation NLL objective was degenerate for
    # that exit and its calibrated confidences are not trustworthy.
    raw_temps = [float(t) for t in cal_metrics["temperature"]]
    temps = [min(max(t, 0.05), 100.0) for t in raw_temps]
    temp_clamped = [i for i, (r, c) in enumerate(zip(raw_temps, temps))
                    if r != c]
    if temp_clamped:
        print(
            f"anytime: WARNING degenerate temperature fit(s) at exit row(s) "
            f"{temp_clamped}: raw {[round(raw_temps[i], 4) for i in temp_clamped]} "
            f"clamped into [0.05, 100]",
            file=sys.stderr, flush=True,
        )
    cal_val = val_store / np.asarray(temps)[:, None, None]
    # three budgets -> >= 3 measured points on the accuracy-vs-depth curve
    # (the reference's headline artifact, EE/thresh.py:288-302)
    points = select_operating_points(
        cal_val, val_refs, n_emb=n_emb, n_stages=n_stages, batch=serve_batch,
        accuracy_drops=(("iso", 0.0), ("fast", 0.03), ("faster", 0.15)),
    )
    # the 2D per-exit-threshold point at the iso budget: the reference's
    # offline mixture research (EE/thresh.py:245-262) driven LIVE through
    # the cascade's per-exit thresholds. The sampled grid usually matches
    # or beats the single global threshold but carries no guarantee (the
    # global winner is refined off-grid; the mixture search holds out half
    # the validation split to confirm its winner) — the headline picks the
    # fastest zero-budget point either way
    from multi_modal_early_exit_tpu.evaluation.operating_points import (
        select_mixture_operating_point,
    )

    mixture_pt = select_mixture_operating_point(
        cal_val, val_refs, n_emb=n_emb, n_stages=n_stages, batch=serve_batch,
        accuracy_drop=0.0,
        num_mixtures=int(os.environ.get("BENCH_MIXTURES",
                                        5000 if tiny else 200_000)),
    )
    if mixture_pt is not None:
        points.append(mixture_pt)

    full_acc_test = float(np.mean(test_store[-1].argmax(-1) == test_refs))

    # the full validation accuracy-vs-depth sweep (the reference's Pareto
    # artifact, EE/thresh.py:288-302) alongside the measured points
    from multi_modal_early_exit_tpu.evaluation.operating_points import (
        sweep_thresholds,
    )

    val_sweep = [
        {"threshold": t, "val_accuracy": round(a, 4),
         "val_average_exit": round(x, 4)}
        for t, a, x, _ in sweep_thresholds(
            cal_val, val_refs, [0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95]
        )
    ]

    # ---- measure each operating point: accuracy (whole test set through
    # the cascade) and throughput (K reps inside one jit) ----
    def measure_cascade(mcfg, mparams, capacities, threshold, mtemps):
        """(test accuracy, avg exit, forced rate, docs/sec) of one cascade
        configuration — shared by the derived points and their pruned
        variants."""
        cascade = make_cascade_forward(
            mcfg, capacities=capacities, threshold=threshold,
            temperatures=mtemps,
        )

        @jax.jit
        def eval_all(p, data):
            n = data["labels"].shape[0]
            nb = n // serve_batch

            def body(_, i):
                sl = jax.lax.dynamic_slice_in_dim
                r = cascade(
                    p,
                    sl(data["input_ids"], i * serve_batch, serve_batch, 0),
                    sl(data["bbox"], i * serve_batch, serve_batch, 0),
                    sl(data["pixel_values"], i * serve_batch, serve_batch, 0),
                    sl(data["attention_mask"], i * serve_batch, serve_batch, 0),
                )
                return None, (r.logits, r.exit_ids, r.capacity_exited)

            _, (logits, exit_ids, forced) = jax.lax.scan(
                body, None, jnp.arange(nb)
            )
            return (
                logits.reshape(-1, bb.num_labels),
                exit_ids.reshape(-1),
                forced.reshape(-1),
            )

        logits, exit_ids, forced = jax.tree.map(
            np.asarray, eval_all(mparams, test_data)
        )
        n_used = len(exit_ids)
        acc = float(np.mean(logits.argmax(-1) == test_refs[:n_used]))
        avg_exit = float(np.mean(exit_ids))
        forced_rate = float(np.mean(forced))

        ids_b = test_data["input_ids"][:serve_batch]
        bbox_b = test_data["bbox"][:serve_batch]
        pv_b = test_data["pixel_values"][:serve_batch]
        mask_b = test_data["attention_mask"][:serve_batch]

        @jax.jit
        def fwd_k(p, ids, bbox, pv, mask):
            def body(carry, k):
                shifted = jnp.where(mask > 0, (ids + k) % bb.vocab_size, ids)
                r = cascade(p, shifted, bbox, pv, mask)
                return carry + r.logits.sum() + r.exit_ids.sum(), None

            total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return total

        _ = float(fwd_k(mparams, ids_b, bbox_b, pv_b, mask_b))  # compile+warm
        n_calls = 3
        t0 = time.perf_counter()
        for _ in range(n_calls):
            _ = float(fwd_k(mparams, ids_b, bbox_b, pv_b, mask_b))
        dt = time.perf_counter() - t0
        return acc, avg_exit, forced_rate, serve_batch * K * n_calls / dt

    from multi_modal_early_exit_tpu.evaluation.operating_points import (
        dead_exits_of,
        prune_dead_exits,
    )
    from multi_modal_early_exit_tpu.models.ee.cascade import (
        capacities_from_distribution,
    )
    from multi_modal_early_exit_tpu.models.ee.model import (
        canonical_exit_order,
        prune_ee_params,
    )

    # near-dead threshold for the pruning measurement (VERDICT r4 #4): an
    # exit below this share costs its head forward on every sample but
    # almost never fires; measure the pruned cascade alongside
    prune_share = float(os.environ.get("BENCH_PRUNE_MIN_SHARE", 0.02))
    point_reports = []
    for pt in points:
        acc, avg_exit, forced_rate, docs_per_sec = measure_cascade(
            cfg, params, pt.capacities, pt.threshold, temps
        )

        n_exits = val_store.shape[0] - 1
        # dead_exits keeps its historical <1% meaning (cross-round
        # comparability of the headline field); the pruning measurement
        # uses the separate prune_share threshold, reported in "pruned"
        dead = dead_exits_of(pt.exit_distribution, n_exits)
        report = {
            **pt.to_dict(),
            "docs_per_sec": round(docs_per_sec, 2),
            "test_accuracy": round(acc, 4),
            "test_full_depth_accuracy": round(full_acc_test, 4),
            "test_average_exit": round(avg_exit, 4),
            "capacity_exit_rate": round(forced_rate, 4),
            "dead_exits": dead,
        }
        force_prune = os.environ.get("BENCH_FORCE_PRUNE", "0") == "1"
        if not tiny or force_prune:
            # close the loop: actually build + measure the pruned cascade
            pruned_exit, pruned_dead = prune_dead_exits(
                cfg.exit, pt.exit_distribution, prune_share
            )
            # gate on the dead list, not an exits-tuple comparison:
            # prune_dead_exits returns CANONICAL ordering, which differs
            # from the user-entered tuple even with nothing pruned. The
            # all-dead case (e.g. the full-depth fallback operating point,
            # dist = {final: 1.0}) is prune_dead_exits' degenerate branch —
            # the config comes back unchanged, so there is nothing to
            # measure
            order_len = len(canonical_exit_order(cfg.exit))
            if pruned_dead and len(pruned_dead) < order_len:
                import dataclasses

                pruned_cfg = dataclasses.replace(cfg, exit=pruned_exit)
                pruned_params = prune_ee_params(params, cfg, pruned_cfg)
                order = canonical_exit_order(cfg.exit)
                kept = [
                    i for i in range(len(order))
                    if i not in set(pruned_dead)
                ]
                temps_p = [temps[i] for i in kept] + [temps[-1]]
                # dropping the pruned exits' (tiny) shares is the CORRECT
                # mass accounting for capacity sizing: survival into each
                # stage is computed as 1 minus the KEPT exits' shares
                # (capacities_from_distribution), so traffic that used to
                # leave at a pruned head automatically counts as surviving
                # into the deeper stages it now flows through
                dist_p = {
                    ni: pt.exit_distribution.get(oi, 0.0)
                    for ni, oi in enumerate(kept)
                }
                dist_p[len(kept)] = pt.exit_distribution.get(len(order), 0.0)
                p_order = canonical_exit_order(pruned_exit)
                n_emb_p = sum(1 for e in p_order if isinstance(e, str))
                n_stages_p = len(p_order) - n_emb_p + 1
                caps_p = capacities_from_distribution(
                    dist_p, serve_batch, n_emb_p, n_stages_p, tail=0.995
                )
                thr_p = pt.threshold
                if np.ndim(thr_p) != 0:  # per-exit vector: keep kept exits'
                    thr_p = [pt.threshold[i] for i in kept]
                p_acc, p_avg, p_forced, p_dps = measure_cascade(
                    pruned_cfg, pruned_params, caps_p, thr_p, temps_p
                )
                report["pruned"] = {
                    "exits": [str(e) for e in pruned_exit.exits],
                    "pruned_exit_indices": pruned_dead,
                    "min_share": prune_share,
                    "capacities": list(caps_p),
                    "docs_per_sec": round(p_dps, 2),
                    "test_accuracy": round(p_acc, 4),
                    "test_average_exit": round(p_avg, 4),
                    "capacity_exit_rate": round(p_forced, 4),
                }
                print(
                    f"anytime: point {pt.name!r} pruned dead exit(s) "
                    f"{pruned_dead} (<{prune_share:.0%} val traffic): "
                    f"{docs_per_sec:.1f} -> {p_dps:.1f} docs/sec, "
                    f"acc {acc:.4f} -> {p_acc:.4f}",
                    file=sys.stderr, flush=True,
                )
        point_reports.append(report)

    # headline = the global-threshold iso point unless the 2D mixture point
    # is MATERIALLY faster (>2% measured). Throughput is capacity-quantized,
    # so noise-level dps differences must not hand the headline to the
    # higher-variance many-candidate configuration: on one bench seed the
    # mixture squeaked past its holdout yet carried real test regret while
    # "winning" by <1% dps — a pure argmax over ~equal numbers selects for
    # exactly that failure. A real mixture win shifts a capacity tier.
    iso = point_reports[0]
    mix = next(
        (r for r in point_reports if r["name"] == "mixture"), None
    )
    if mix is not None and mix["docs_per_sec"] > iso["docs_per_sec"] * 1.02:
        iso = mix
    # the measured accuracy-vs-depth curve (iso, fast, faster, mixture):
    # compact view of the reference's headline artifact (EE/thresh.py:288-302)
    curve = [
        {"name": r["name"], "test_accuracy": r["test_accuracy"],
         "test_average_exit": r["test_average_exit"],
         "docs_per_sec": r["docs_per_sec"]}
        for r in point_reports
    ]
    # headline stays COMPACT (VERDICT r4 #1: the r04 line outgrew the
    # driver's tail capture and parsed as null); curves + per-point detail
    # go to the BENCH_DETAIL.json sidecar via the "_detail" key that main()
    # strips before printing
    result = _result(
        "anytime_iso_accuracy_docs_per_sec_per_chip", iso["docs_per_sec"],
        headline_point=iso["name"],
        test_accuracy=iso["test_accuracy"],
        test_full_depth_accuracy=iso["test_full_depth_accuracy"],
        test_average_exit=iso["test_average_exit"],
        threshold=iso["threshold"],
        capacities=iso["capacities"],
        difficulty=difficulty,
        dead_exits=iso["dead_exits"],
        temp_clamp_hits=len(temp_clamped),
        serve_batch=serve_batch,
        bench_seed=bench_seed,
    )
    if "pruned" in iso:
        result["pruned_docs_per_sec"] = iso["pruned"]["docs_per_sec"]
        result["pruned_test_accuracy"] = iso["pruned"]["test_accuracy"]
    result["_detail"] = {
        "anytime_curve": curve,
        "val_sweep_curve": val_sweep,
        "operating_points": point_reports,
        "temperatures": [round(t, 4) for t in temps],
        "temperatures_raw": [round(t, 6) for t in raw_temps],
        "temperatures_clamped_rows": temp_clamped,
        "train": {"epochs": epochs, "n_train": n_train, "lr": lr,
                  "first_loss": round(losses[0], 4),
                  "final_loss": round(losses[-1], 4),
                  "seconds": round(train_secs, 1)},
    }
    return result


# ---------------------------------------------------------------------------

def _pretrained_parity_record() -> dict:
    """Ready-to-fire pretrained parity gate (VERDICT r4 next #5).

    Probes the local HF cache cheaply; when microsoft/layoutlmv3-base is
    present, runs scripts/check_pretrained_parity.py (CPU subprocess) so
    the logit bit-match target (BASELINE.md) is checked automatically the
    moment weights appear. Zero-egress environments record
    ``status: skipped``."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        from huggingface_hub import try_to_load_from_cache

        hit = try_to_load_from_cache(
            "microsoft/layoutlmv3-base", "config.json"
        )
    except Exception:
        hit = None
    if not isinstance(hit, str):
        return {"status": "skipped", "reason": "no local HF cache"}
    import subprocess

    artifact = os.path.join(here, "PRETRAINED_PARITY.json")
    # a stale artifact from an earlier run must not masquerade as this
    # run's numbers (e.g. crash-before-write paired with an old pass)
    if os.path.exists(artifact):
        os.remove(artifact)
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "scripts",
                                      "check_pretrained_parity.py")],
        capture_output=True, text=True, timeout=1800,
    )
    record = {"status": {0: "passed", 2: "skipped"}.get(proc.returncode,
                                                        "FAILED")}
    try:
        with open(artifact) as f:
            data = json.load(f)
        record["max_abs_err"] = data.get("max_abs_diff_last_hidden")
    except Exception:
        pass
    return record


def _strip_detail(result: dict, detail: dict, name: str) -> dict:
    """Pop a mode's ``_detail`` into the sidecar dict; return the compact
    result (VERDICT r4 #1: keep every printed JSON line small)."""
    result = dict(result)
    d = result.pop("_detail", None)
    if d:
        detail[name] = d
    return result


def main() -> None:
    mode = os.environ.get("BENCH_MODE", "all")
    K = int(os.environ.get("BENCH_K", 16))
    # measured sweet spots on v5e: cascade batch 64, harvest 48 (r4:
    # 531 @ 32 -> 579 @ 48; 64 compiles but rolls off to 565), train 44
    # with the full-unroll + chained-dbias encoder (r5: 171.0 @ 40 plain,
    # 174.4 @ 40 chained, 176.3 @ 44 plain, 181.4 @ 44 chained,
    # 171.8 @ 48 chained)
    batch_env = os.environ.get("BENCH_BATCH")

    def batch_for(m, default):
        return int(batch_env) if batch_env else default

    runners = {
        "cascade": lambda: bench_cascade(batch_for("cascade", 64), K),
        "harvest": lambda: bench_harvest(batch_for("harvest", 48), K),
        "train": lambda: bench_train(batch_for("train", 44)),
        "anytime": lambda: bench_anytime(batch_for("anytime", 64), K),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    detail: dict = {}

    def flush_detail():
        if detail:
            with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
                json.dump(detail, f, indent=1)

    if mode != "all":
        out = _strip_detail(runners[mode](), detail, mode)
        flush_detail()
        print(json.dumps(out))
        return

    results, errors = {}, {}
    for name in ("harvest", "train", "cascade", "anytime"):
        try:
            results[name] = _strip_detail(runners[name](), detail, name)
            print(json.dumps(results[name]))
        except Exception as e:  # failure isolation: one mode, not the bench
            errors[name] = f"{type(e).__name__}: {e}"
            print(json.dumps({"mode": name, "error": errors[name]}))

    # headline: the policy-derived iso-accuracy operating point; fall back
    # to the fixed-mix cascade if the anytime stage failed
    head = results.get("anytime") or results.get("cascade")
    if head is None:
        raise SystemExit(f"all headline modes failed: {errors}")
    final = dict(head)
    final["submetrics"] = {
        name: {"metric": r["metric"], "value": r["value"],
               "vs_baseline": r["vs_baseline"]}
        for name, r in results.items()
    }
    anchor = _measured_cpu_anchor()
    if anchor is not None:
        final["measured_torch_cpu_bs1_docs_per_sec"] = anchor
    try:
        detail["pretrained_parity"] = _pretrained_parity_record()
        final["pretrained_parity_status"] = detail["pretrained_parity"][
            "status"
        ]
    except Exception as e:
        detail["pretrained_parity"] = {"status": "error", "reason": str(e)}
    if errors:
        final["errors"] = errors
    final["detail_file"] = "BENCH_DETAIL.json"
    flush_detail()
    print(json.dumps(final))


if __name__ == "__main__":
    main()
