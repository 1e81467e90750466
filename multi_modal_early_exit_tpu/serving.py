"""End-to-end serving pipeline: raw document -> label + confidence + exit.

The reference stops at research scripts; this is the production-facing
surface: one object that owns preprocessing (tokenization + fused image
pipeline), the capacity-constrained cascade, and postprocessing.

    pipe = Pipeline.from_checkpoint("save/<run>/checkpoint-3")
    results = pipe.predict(images=[pil_image], words=[["inv", "total"]],
                           boxes=[[[10, 10, 40, 30], [50, 10, 90, 30]]])
    results[0] -> {"label": "invoice", "confidence": 0.93, "exit": 2,
                   "exit_name": "7", "capacity_exited": False}

Batches are padded to the pipeline's static batch size so the cascade
compiles exactly once; OCR (pytesseract) is applied automatically when
words/boxes are omitted and the dependency is available.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from multi_modal_early_exit_tpu.data.features import (
    MAX_SEQ_LENGTH,
    convert_words_to_features,
    load_tokenizer,
)
from multi_modal_early_exit_tpu.data.images import preprocess_pil_batch
from multi_modal_early_exit_tpu.data.labels import RVL_CDIP_ID2LABEL
from multi_modal_early_exit_tpu.models.ee.cascade import (
    capacities_from_distribution,
    make_cascade_forward,
)
from multi_modal_early_exit_tpu.models.ee.model import canonical_exit_order
from multi_modal_early_exit_tpu.models.layoutlmv3.config import EEModelConfig


class Pipeline:
    """Anytime document classification with a fixed serving batch size."""

    def __init__(
        self,
        params,
        cfg: EEModelConfig,
        id2label: Optional[Dict[int, str]] = None,
        # one global confidence threshold, or a per-exit vector (length =
        # num exits) from evaluation.select_mixture_operating_point — the
        # cascade supports both (models/ee/cascade.make_cascade_forward)
        threshold=None,
        batch_size: int = 16,
        exit_distribution: Optional[Dict[int, float]] = None,
        tokenizer=None,
        seq_len: Optional[int] = None,
        capacity_tail: float = 0.995,
    ):
        import jax

        self.params = params
        self.cfg = cfg
        self.id2label = id2label or dict(RVL_CDIP_ID2LABEL)
        self.batch_size = batch_size
        self.tokenizer = tokenizer or load_tokenizer(
            vocab_size=cfg.backbone.vocab_size
        )
        self.seq_len = seq_len or min(
            MAX_SEQ_LENGTH, cfg.backbone.max_position_embeddings - 2
        )
        self.order = canonical_exit_order(cfg.exit)

        n_emb = sum(1 for e in self.order if isinstance(e, str))
        n_stages = len([e for e in self.order if isinstance(e, int)]) + 1
        if exit_distribution:
            # binomial-tail sizing (no-overflow probability = capacity_tail
            # per batch, assuming i.i.d. exit decisions); real traffic is
            # correlated (bursts of hard documents), so watch
            # ``metrics()['capacity_exit_rate']`` for drift from the design
            # point and raise capacity_tail if it exceeds 1 - tail
            caps = capacities_from_distribution(
                exit_distribution, batch_size, n_emb, n_stages,
                tail=capacity_tail,
            )
        else:
            caps = tuple([batch_size] * n_stages)  # conservative: exact policy
        self.capacities = caps
        self.capacity_tail = capacity_tail
        self._n_served = 0
        self._n_capacity_exited = 0
        self._cascade = jax.jit(
            make_cascade_forward(cfg, capacities=caps, threshold=threshold)
        )

    @classmethod
    def from_checkpoint(cls, directory: str, **kwargs) -> "Pipeline":
        """Restore params + run config (ExitConfig round-trip) from a
        training checkpoint (training/checkpoint.py layout)."""
        from multi_modal_early_exit_tpu.config.experiment import (
            ExperimentConfig,
        )
        from multi_modal_early_exit_tpu.models.registry import (
            infer_backbone_config,
        )
        from multi_modal_early_exit_tpu.training.checkpoint import (
            load_checkpoint,
        )

        params, saved, _, _ = load_checkpoint(directory)
        exp = ExperimentConfig.from_dict(saved or {})
        # the ExitConfig round-trips through the saved run config; all
        # shape-bearing backbone fields come from the arrays themselves
        backbone = infer_backbone_config(params)
        cfg = EEModelConfig(backbone=backbone, exit=exp.exit_config())
        return cls(params, cfg, **kwargs)

    def preprocess(
        self,
        images: Sequence,
        words: Optional[Sequence[Sequence[str]]] = None,
        boxes: Optional[Sequence[Sequence[Sequence[int]]]] = None,
    ) -> Dict[str, np.ndarray]:
        if words is None or boxes is None:
            from multi_modal_early_exit_tpu.data.ocr import apply_tesseract

            pairs = [apply_tesseract(im.convert("RGB")) for im in images]
            words = [p[0] for p in pairs]
            boxes = [p[1] for p in pairs]
        feats = [
            convert_words_to_features(w, b, self.tokenizer, self.seq_len)
            for w, b in zip(words, boxes)
        ]
        return {
            "input_ids": np.stack([f["input_ids"] for f in feats]),
            "bbox": np.stack([f["bbox"] for f in feats]),
            "attention_mask": np.stack([f["attention_mask"] for f in feats]),
            "pixel_values": preprocess_pil_batch(
                images, size=self.cfg.backbone.input_size
            ),
        }

    def predict(
        self,
        images: Sequence,
        words: Optional[Sequence[Sequence[str]]] = None,
        boxes: Optional[Sequence[Sequence[Sequence[int]]]] = None,
    ) -> List[Dict]:
        batch = self.preprocess(images, words, boxes)
        return self.predict_features(batch)

    def predict_features(self, batch: Dict[str, np.ndarray]) -> List[Dict]:
        """Run preprocessed features through the cascade; handles padding to
        the static serving batch size and chunking larger inputs."""
        import scipy.special

        n = len(batch["input_ids"])
        results: List[Dict] = []
        for start in range(0, n, self.batch_size):
            idx = np.arange(start, min(start + self.batch_size, n))
            real = len(idx)
            pad_idx = np.concatenate(
                [idx, np.resize(idx, self.batch_size - real)]
            ) if real < self.batch_size else idx
            chunk = {k: v[pad_idx] for k, v in batch.items()}
            res = self._cascade(
                self.params, chunk["input_ids"], chunk["bbox"],
                chunk["pixel_values"], chunk["attention_mask"],
            )
            logits = np.asarray(res.logits)[:real]
            exits = np.asarray(res.exit_ids)[:real]
            forced = np.asarray(res.capacity_exited)[:real]
            self._n_served += real
            self._n_capacity_exited += int(forced.sum())
            probs = scipy.special.softmax(logits, axis=-1)
            for i in range(real):
                pred = int(probs[i].argmax())
                e = int(exits[i])
                results.append({
                    "label": self.id2label.get(pred, str(pred)),
                    "label_id": pred,
                    "confidence": float(probs[i, pred]),
                    "exit": e,
                    "exit_name": str(self.order[e]) if e < len(self.order)
                    else "final",
                    "capacity_exited": bool(forced[i]),
                })
        return results

    def metrics(self) -> Dict[str, float]:
        """Serving-health counters. ``capacity_exit_rate`` is the fraction of
        documents forced onto shallower best-so-far logits because a stage's
        capacity overflowed; the sizing rule designs for <= 1 - capacity_tail
        under i.i.d. traffic, so a sustained higher rate means correlated
        (bursty) difficulty — resize with a larger capacity_tail."""
        return {
            "documents_served": float(self._n_served),
            "capacity_exit_rate": (
                self._n_capacity_exited / self._n_served
                if self._n_served else 0.0
            ),
            "capacity_tail": self.capacity_tail,
        }
