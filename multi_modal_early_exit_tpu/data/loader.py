"""Batch iteration with static shapes and device prefetch.

Replaces the reference's torch DataLoader + collate_fn + CustomTrainer
dataloaders (EE/data/__init__.py:6-60) with a TPU-friendly loader:

- every batch has the same static shape (last partial batch is padded and a
  ``sample_mask`` marks real rows) so jit compiles exactly once;
- optional gradient-accumulation layout (accum, micro_bs, ...) matching the
  trainer's scan (training/trainer.py);
- double-buffered device prefetch: the next batch's host->HBM transfer
  overlaps with the current step's compute.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

from multi_modal_early_exit_tpu.data.datasets import DocClassificationDataset


def iterate_batches(
    dataset: DocClassificationDataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 42,
    drop_last: bool = False,
    pad_final: bool = True,
    epoch: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield dicts of (batch_size, ...) arrays; final short batch is padded
    (rows repeated) with ``sample_mask`` zero on padding."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        order = np.random.default_rng(seed + epoch).permutation(n)
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        short = len(idx) < batch_size
        if short and drop_last:
            return
        mask = np.ones(batch_size, np.float32)
        if short:
            if not pad_final:
                mask = np.ones(len(idx), np.float32)
            else:
                mask[len(idx):] = 0.0
                idx = np.concatenate(
                    [idx, np.resize(idx, batch_size - len(idx))]
                )
        batch = dataset[idx]
        batch["sample_mask"] = mask
        yield batch


def accumulation_layout(
    batch: Dict[str, np.ndarray], accum_steps: int
) -> Dict[str, np.ndarray]:
    """(accum*micro, ...) -> (accum, micro, ...) for the trainer's scan."""
    def reshape(x):
        micro = x.shape[0] // accum_steps
        return x.reshape((accum_steps, micro) + x.shape[1:])

    return {k: reshape(v) for k, v in batch.items()}


def prefetch_to_device(
    iterator: Iterator[Dict[str, np.ndarray]],
    sharding=None,
    buffer_size: int = 2,
) -> Iterator[Dict[str, np.ndarray]]:
    """Async double-buffering: device_put batches ahead of consumption.

    ``jax.device_put`` is asynchronous — enqueueing the next transfer before
    the consumer needs it overlaps H2D DMA with device compute (the TPU
    analogue of torch pin_memory+non_blocking).
    """
    import collections

    import jax

    def put(b):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), b)
        return jax.tree.map(jax.device_put, b)

    queue = collections.deque()
    for item in iterator:
        queue.append(put(item))
        if len(queue) >= buffer_size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
