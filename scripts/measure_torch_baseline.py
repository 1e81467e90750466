"""Measure a *real* lower anchor for the bench baseline: the reference
architecture (HF LayoutLMv3-base, 16 labels) run the way the reference's
eval loop runs it — torch, batch size 1, full depth — on this host's CPU.

The reference itself publishes no numbers (BASELINE.md) and its default
device is a CUDA GPU we don't have (EE/configs.py:44); bench.py therefore
compares against an *estimated* 32 docs/sec GPU figure.  This script pins a
measured torch-CPU datapoint next to that estimate so at least one ratio in
the bench JSON is grounded in a real measurement on identical hardware
conditions (same host, same synthetic inputs).

Writes BASELINE_TORCH_CPU.json at the repo root:
  {"metric": "reference_arch_torch_cpu_bs1_docs_per_sec", "value": ...}

Offline-safe: the model is constructed from a local LayoutLMv3Config with
the base dimensions (weights random — throughput does not depend on weight
values) so no hub access is needed.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import torch
from transformers import LayoutLMv3Config, LayoutLMv3ForSequenceClassification


def main() -> None:
    torch.manual_seed(0)
    # base dims as published for microsoft/layoutlmv3-base: 12 layers,
    # hidden 768, max_position_embeddings 514 (512 tokens + RoBERTa-style
    # padding offset; the HF class default of 512 underflows at seq 512)
    cfg = LayoutLMv3Config(num_labels=16, max_position_embeddings=514)
    model = LayoutLMv3ForSequenceClassification(cfg).eval()

    rng = np.random.default_rng(0)
    seq = 512  # reference budget: 512 text tokens (EE/data/RVL_CDIP.py:98)
    input_ids = torch.as_tensor(
        rng.integers(10, cfg.vocab_size, (1, seq)), dtype=torch.long
    )
    x0 = rng.integers(0, 900, (1, seq, 1))
    y0 = rng.integers(0, 900, (1, seq, 1))
    bbox = torch.as_tensor(
        np.concatenate(
            [x0, y0, x0 + rng.integers(1, 100, (1, seq, 1)),
             y0 + rng.integers(1, 100, (1, seq, 1))], axis=-1
        ),
        dtype=torch.long,
    )
    pixel_values = torch.as_tensor(
        rng.standard_normal((1, 3, cfg.input_size, cfg.input_size)),
        dtype=torch.float32,
    )
    attention_mask = torch.ones((1, seq), dtype=torch.long)

    with torch.no_grad():
        for _ in range(2):  # warmup
            model(input_ids=input_ids, bbox=bbox, pixel_values=pixel_values,
                  attention_mask=attention_mask)
        n = int(os.environ.get("BASELINE_ITERS", 10))
        t0 = time.perf_counter()
        for _ in range(n):
            model(input_ids=input_ids, bbox=bbox, pixel_values=pixel_values,
                  attention_mask=attention_mask)
        dt = time.perf_counter() - t0

    docs_per_sec = n / dt
    out = {
        "metric": "reference_arch_torch_cpu_bs1_docs_per_sec",
        "value": round(docs_per_sec, 3),
        "unit": "docs/sec",
        "note": (
            "HF LayoutLMv3-base forward, batch 1, 512 text + 197 visual "
            "tokens, torch CPU on this host; measured anchor next to the "
            "estimated-32-docs/sec single-GPU figure used as vs_baseline"
        ),
        "threads": torch.get_num_threads(),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_TORCH_CPU.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
