"""Microbenchmark: MXU fill penalty of the head_dim-64 matmul shapes.

Backs the PROFILE_TRAIN.md note on why a "d=128 head packing" of the flash
backward cannot work: every per-head backward matmul either contracts over
K = head_dim = 64 (s recompute, dp) or produces N = head_dim = 64 outputs
(dq, dk, dv). Packing two heads to d=128 would need a block-diagonal
operand — 2x the FLOPs at full fill, i.e. no faster than 1x at half fill —
because the heads' (S, S) score/probability matrices are independent.

Measurement design (honest under the remote-TPU tunnel, see bench.py):
one jit chains reps of  y = x @ b  (N = d output)  and  x = y @ c  (K = d
contraction) with a true serial data dependency (each matmul consumes the
previous one's output), so nothing can be hoisted or overlapped away and
no elementwise anti-CSE passes pollute the timing. Per-FLOP throughput at
d=64 vs d=128 is exactly the backward kernel's shape question.

Run:  python scripts/mxu_fill_microbench.py    (writes MXU_FILL.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"),
)


def time_chain(d: int, s: int = 768, bh: int = 192, reps: int = 48) -> float:
    """TFLOP/s of the alternating (s,s)@(s,d) / (s,d)@(d,s) chain."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((bh, s, s)) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((bh, s, d)) * 0.05, jnp.bfloat16)
    c = jnp.asarray(rng.standard_normal((bh, d, s)) * 0.05, jnp.bfloat16)
    alpha = jnp.bfloat16(1.0 / s)  # keeps magnitudes bounded; fuses into the matmul

    @jax.jit
    def run(x, b, c):
        def body(carry, _):
            y = jnp.einsum(
                "bij,bjd->bid", carry, b, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16) * alpha          # N = d matmul
            x2 = jnp.einsum(
                "bid,bdj->bij", y, c, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16) * alpha          # K = d matmul
            return x2, None

        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out.astype(jnp.float32).sum()

    _ = float(run(x0, b, c))  # compile + warm
    n_calls = 3
    t0 = time.perf_counter()
    for _ in range(n_calls):
        _ = float(run(x0, b, c))
    dt = time.perf_counter() - t0
    flops = 2.0 * 2.0 * s * s * d * bh * reps * n_calls
    return flops / dt / 1e12


def main() -> None:
    out = {}
    for d in (64, 128, 256):
        tf = time_chain(d)
        out[f"d{d}_tflops"] = round(tf, 1)
        print(f"d={d}: {tf:.1f} TFLOP/s", file=sys.stderr)
    out["d128_over_d64"] = round(out["d128_tflops"] / out["d64_tflops"], 2)
    path = os.path.join(os.path.dirname(__file__), "..", "MXU_FILL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
