"""Vectorized threshold research: global sweeps and per-exit mixture search.

Capability parity with EE/thresh.py + EE/large_scale.py:

- CSF zoo (msp / negative entropy / top-1−2 margin), thresh.py:55-61
- global-threshold sweep:   naive O(T·N·E) python scan (kept for
  cross-checking, thresh.py:69-95) vs the vectorized
  ``(CSF >= t).argmax(0)`` form (opt0, thresh.py:106-131)
- per-exit 2D threshold mixtures: percentile threshold grids + random
  mixtures (thresh.py:245-262) evaluated at scale.

TPU-first: where the reference shards the mixture loop over joblib /
multiprocessing ×8 (thresh.py:218-225, large_scale.py:206-215), the sweep is
expressed as a jit+vmap over the mixture axis and dispatched to the
accelerator in chunks — the (E,N) CSF matrix is tiny, so a million mixtures
is a single fused kernel per chunk.  A C++/OpenMP host fallback lives in
``native/`` for CPU-only environments.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Tuple

import numpy as np
import scipy.special


def entropy_np(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    exp_x = np.exp(x)
    a = np.sum(exp_x, axis=-1)
    b = np.sum(x * exp_x, axis=-1)
    return np.log(a) - b / a


def top12_margin_np(x: np.ndarray) -> np.ndarray:
    values = np.sort(x, axis=-1)
    if x.ndim == 1:
        return values[0] - values[1]
    return values[..., 0] - values[..., 1]


CSF_DICT = OrderedDict(
    {
        "msp": lambda x: np.max(scipy.special.softmax(x, axis=-1), -1),
        "entropy": lambda x: -entropy_np(x),
        "margin": lambda x: top12_margin_np(x),
    }
)


def csf_matrix(logits: np.ndarray, csf: str = "msp") -> np.ndarray:
    """(E, N) confidence scores from a (E, N, K) logit store."""
    return CSF_DICT[csf](logits)


# --------------------------------------------------------------------------
# global-threshold sweeps
# --------------------------------------------------------------------------

def naive_global_sweep(logits: np.ndarray, thresholds, csf: str = "msp"):
    """Reference 'naieve' scan (thresh.py:69-95); for equivalence tests."""
    fn = CSF_DICT[csf]
    num_exits, num_samples, _ = logits.shape
    thresholds = sorted(thresholds, reverse=True)
    exits = np.full((len(thresholds), num_samples), num_exits, dtype=np.int32)
    preds = np.tile(logits[-1], (len(thresholds), 1, 1))
    for t, threshold in enumerate(thresholds):
        for s in range(num_samples):
            for e in range(num_exits):
                if fn(logits[e][s]) >= threshold:
                    exits[t][s] = e
                    preds[t][s] = logits[e][s]
                    break
    return preds, exits


def vectorized_global_sweep(logits: np.ndarray, thresholds, csf: str = "msp"):
    """opt0 (thresh.py:106-131): precompute CSF, argmax the pass matrix.

    NOTE: like the reference's opt0/naieve, samples where *no* exit passes
    keep exit id ``num_exits`` (out of range) and fall back to last-exit
    logits.
    """
    num_exits, num_samples, _ = logits.shape
    thresholds = np.asarray(sorted(thresholds, reverse=True))
    scores = csf_matrix(logits, csf)  # (E, N)
    passed = scores[None] >= thresholds[:, None, None]  # (T, E, N)
    any_passed = passed.any(axis=1)
    exits = np.where(passed.any(axis=1), passed.argmax(axis=1), num_exits).astype(np.int32)
    clamped = np.minimum(exits, num_exits - 1)
    preds = logits[clamped, np.arange(num_samples)[None]]
    preds = np.where(any_passed[..., None], preds, logits[-1][None])
    return preds, exits


def incremental_global_sweep(logits: np.ndarray, thresholds, csf: str = "msp"):
    """opt1 (thresh.py:134-177): incremental sweep over descending thresholds.

    The reference's incremental insight: as the threshold decreases, the set
    of (exit, sample) pairs that pass only GROWS, so each pair's work can be
    done once — at the first (highest) threshold it passes — instead of per
    threshold. Here each pair's first-passing threshold index comes from one
    ``searchsorted`` over the descending threshold vector, and a single pass
    over thresholds maintains the running first-passing exit per sample.

    NOTE on parity: the reference's opt1 as written has two defects that
    make it INEQUIVALENT to its naieve/opt0 — (a) ``tmp_not`` is computed
    once per threshold but exits update ``tmp_above`` inside the exit loop,
    so a sample passing several exits records the LAST one (thresh.py:
    160-171), and (b) samples above a previous higher threshold are skipped
    entirely, freezing their assignment even though a lower threshold can
    move them to a SHALLOWER exit. The reference's own equality check never
    runs (dead code behind ``sys.exit(1)``, thresh.py:309-318). This
    implementation realizes the *intended* incremental algorithm, which is
    exactly equivalent (asserted against naive/opt0/native in
    tests/test_native_sweep.py).
    """
    num_exits, num_samples, _ = logits.shape
    thresholds = np.asarray(sorted(thresholds, reverse=True), dtype=np.float64)
    num_thresholds = len(thresholds)
    scores = csf_matrix(logits, csf)  # (E, N)

    # first_t[e, n]: index of the highest threshold that (e, n) passes
    # (thresholds descend, so passing is monotone in t); num_thresholds if
    # it never passes. searchsorted on the ascending-negated vector.
    first_t = np.searchsorted(-thresholds, -scores.ravel(), side="left")
    first_t = first_t.reshape(num_exits, num_samples)

    exits = np.full((num_thresholds, num_samples), num_exits, dtype=np.int32)
    cur = np.full(num_samples, num_exits, dtype=np.int32)
    # bucket the pairs by first-passing threshold so each is touched once
    order = np.argsort(first_t, axis=None, kind="stable")
    flat_e, flat_n = np.unravel_index(order, first_t.shape)
    flat_t = first_t[flat_e, flat_n]
    starts = np.searchsorted(flat_t, np.arange(num_thresholds + 1))
    for t in range(num_thresholds):
        lo, hi = starts[t], starts[t + 1]
        if hi > lo:
            np.minimum.at(cur, flat_n[lo:hi], flat_e[lo:hi])
        exits[t] = cur
    clamped = np.minimum(exits, num_exits - 1)
    preds = logits[clamped, np.arange(num_samples)[None]]
    preds = np.where((exits < num_exits)[..., None], preds, logits[-1][None])
    return preds, exits


def time_global_sweeps(
    logits: np.ndarray, thresholds, csf: str = "msp", include_naive: bool = True
) -> dict:
    """Wall-clock the sweep implementations on one store (the reference's
    __main__ timing harness, thresh.py:313-315: runtime_wrapper around
    naieve/opt0/opt1). Returns {impl: seconds}; cli/research.py records the
    artifact."""
    import time

    out = {}
    impls = [
        ("opt0", vectorized_global_sweep),
        ("opt1", incremental_global_sweep),
    ]
    if include_naive:
        impls.insert(0, ("naive", naive_global_sweep))
    for name, fn in impls:
        t0 = time.perf_counter()
        fn(logits, thresholds, csf)
        out[name] = time.perf_counter() - t0
    return out


# --------------------------------------------------------------------------
# 2D (per-exit) threshold mixtures
# --------------------------------------------------------------------------

def percentile_thresholds(
    logits: np.ndarray, num_per_exit: int = 10, csf: str = "msp"
) -> np.ndarray:
    """Data-driven per-exit threshold grid at CSF percentiles
    (thresh.py:245-256). Last exit row stays 0 (always exits)."""
    num_exits = logits.shape[0]
    grid = np.zeros((num_exits, num_per_exit))
    percentiles = np.linspace(0, 100, num_per_exit)
    fn = CSF_DICT[csf]
    for e in range(num_exits - 1):
        scores = fn(logits[e])
        for p, perc in enumerate(percentiles):
            grid[e, p] = np.percentile(scores, perc)
    return grid


def random_mixtures(
    grid: np.ndarray, num_mixtures: int, seed: int = 42
) -> np.ndarray:
    """(M, E) random per-exit threshold vectors drawn from the grid
    (thresh.py:258-262)."""
    num_exits, num_per_exit = grid.shape
    rng = np.random.RandomState(seed)
    selection = rng.randint(0, num_per_exit, size=(num_mixtures, num_exits))
    return grid[np.arange(num_exits)[None], selection]


def assign_exits_2d(scores: np.ndarray, thresholds_2d: np.ndarray) -> np.ndarray:
    """(M, N) exit assignment for per-exit thresholds (opt0_2D,
    thresh.py:184-215), vectorized over mixtures."""
    # scores (E, N); thresholds (M, E)
    passed = scores[None] >= thresholds_2d[:, :, None]  # (M, E, N)
    return passed.argmax(axis=1).astype(np.int32)


def evaluate_exit_logits(
    logits: np.ndarray, references: np.ndarray, exit_assignment: np.ndarray
) -> Tuple[float, float]:
    """(accuracy, average_exit) for one assignment (thresh.py:228-234)."""
    preds = np.argmax(
        logits[exit_assignment, np.arange(len(references))], axis=-1
    )
    return float(np.mean(preds == references)), float(np.mean(exit_assignment))


def mixture_pareto_sweep(
    logits: np.ndarray,
    references: np.ndarray,
    num_mixtures: int = 1_000_000,
    num_per_exit: int = 10,
    csf: str = "msp",
    seed: int = 42,
    backend: str = "auto",
    chunk: int = 8192,
) -> dict:
    """Full mixture search → (accuracy, average_exit) per mixture.

    backend: "jax" (vmap on the default device), "native" (C++/OpenMP),
    "numpy", or "auto" (jax → native → numpy).
    """
    scores = csf_matrix(logits, csf)  # (E, N)
    grid = percentile_thresholds(logits, num_per_exit, csf)
    mixtures = random_mixtures(grid, num_mixtures, seed)
    correct = (np.argmax(logits, axis=-1) == references[None]).astype(np.float32)

    result = None
    if backend in ("auto", "native"):
        try:
            from multi_modal_early_exit_tpu.native import sweep as native_sweep

            acc, avg = native_sweep.mixture_sweep(scores, correct, mixtures)
            result = (acc, avg)
        except Exception:
            if backend == "native":
                raise
    if result is None and backend in ("auto", "jax"):
        try:
            acc, avg = _jax_mixture_sweep(scores, correct, mixtures, chunk)
            result = (acc, avg)
        except Exception:
            if backend == "jax":
                raise
    if result is None:
        assignment = assign_exits_2d(scores, mixtures)
        acc = correct[assignment, np.arange(scores.shape[1])[None]].mean(-1)
        avg = assignment.mean(-1)
        result = (acc, avg)

    acc, avg = result
    return {
        "thresholds": mixtures,
        "accuracy": np.asarray(acc),
        "average_exit": np.asarray(avg),
    }


def _jax_mixture_sweep(scores, correct, mixtures, chunk):
    import jax
    import jax.numpy as jnp

    scores_d = jnp.asarray(scores)
    correct_d = jnp.asarray(correct)
    n = scores.shape[1]

    @jax.jit
    def eval_chunk(thresh_chunk):
        passed = scores_d[None] >= thresh_chunk[:, :, None]  # (C, E, N)
        assignment = jnp.argmax(passed, axis=1)  # (C, N)
        corr = jnp.take_along_axis(correct_d[None], assignment[:, None, :], axis=1)[:, 0]
        return jnp.mean(corr, axis=-1), jnp.mean(assignment.astype(jnp.float32), -1)

    del n
    accs, avgs = [], []
    m = mixtures.shape[0]
    pad = (-m) % chunk
    padded = np.concatenate([mixtures, np.zeros((pad, mixtures.shape[1]))], 0)
    for i in range(0, len(padded), chunk):
        a, v = eval_chunk(jnp.asarray(padded[i : i + chunk]))
        accs.append(np.asarray(a))
        avgs.append(np.asarray(v))
    acc = np.concatenate(accs)[:m]
    avg = np.concatenate(avgs)[:m]
    return acc, avg
