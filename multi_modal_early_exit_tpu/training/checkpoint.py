"""Checkpoint save/restore via orbax + config round-trip.

Capability parity with the reference's HF-Trainer checkpointing
(EE/IC_only.py:149-166: save per epoch, keep best, limit 3) and the config
round-trip through the saved ``config.json`` whose embedded EE_config becomes
the config on reload (EE/configs.py:389-395).

Layout:
    <dir>/
      state/...         # orbax: params (+ optional opt_state, step)
      config.json       # ExperimentConfig / EEModelConfig dump
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _ckpt_path(directory: str) -> str:
    return os.path.join(os.path.abspath(directory), "state")


def save_checkpoint(
    directory: str,
    params,
    config: Optional[Dict[str, Any]] = None,
    opt_state=None,
    step: Optional[int] = None,
) -> str:
    """Write params (+ optional optimizer state) and the run config."""
    import orbax.checkpoint as ocp

    os.makedirs(directory, exist_ok=True)
    payload: Dict[str, Any] = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if step is not None:
        payload["step"] = np.asarray(step)

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(_ckpt_path(directory), payload, force=True)

    if config is not None:
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)
    return directory


def load_checkpoint(
    directory: str, with_opt_state: bool = False
) -> Tuple[Any, Optional[Dict[str, Any]], Optional[Any], Optional[int]]:
    """Restore (params, config, opt_state, step); config round-trips the run
    hyperparameters like the reference's EE_config reload."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(_ckpt_path(directory))
    params = payload["params"]
    opt_state = payload.get("opt_state") if with_opt_state else None
    step = payload.get("step")
    if step is not None:
        step = int(np.asarray(step))

    config = None
    cfg_file = os.path.join(directory, "config.json")
    if os.path.exists(cfg_file):
        with open(cfg_file) as f:
            config = json.load(f)
    return params, config, opt_state, step


class CheckpointManager:
    """Epoch-style rolling checkpoints with best-model tracking
    (save_total_limit=3 + load_best_model_at_end semantics)."""

    def __init__(self, root: str, keep: int = 3, higher_is_better: bool = True):
        self.root = os.path.abspath(root)
        self.keep = keep
        self.higher_is_better = higher_is_better
        self.saved: list = []
        self.best_metric: Optional[float] = None
        self.best_dir: Optional[str] = None
        os.makedirs(self.root, exist_ok=True)

    def save(self, epoch: int, params, config=None, opt_state=None,
             metric: Optional[float] = None) -> str:
        directory = os.path.join(self.root, f"checkpoint-{epoch}")
        save_checkpoint(directory, params, config, opt_state, step=epoch)
        self.saved.append(directory)
        if metric is not None and (
            self.best_metric is None
            or (metric > self.best_metric) == self.higher_is_better
        ):
            self.best_metric = metric
            self.best_dir = directory
        # rolling deletion, never deleting the best
        while len(self.saved) > self.keep:
            victim = None
            for d in self.saved:
                if d != self.best_dir:
                    victim = d
                    break
            if victim is None:
                break
            self.saved.remove(victim)
            import shutil

            shutil.rmtree(victim, ignore_errors=True)
        return directory

    def load_best(self):
        if self.best_dir is None:
            raise RuntimeError("no best checkpoint recorded")
        return load_checkpoint(self.best_dir)
