"""Dataset registry and builders.

Capability parity with ``build_dataset`` (reference: EE/configs.py:233-358)
and the dataset classes (EE/data/RVL_CDIP.py:172-446):

- ``rvl_cdip``            full RVL-CDIP via HF datasets (corrupt test sample
                          33669 excluded, EE/configs.py:243-244)
- ``rvl_cdip_easyocr``    precomputed EasyOCR words+boxes columns
                          (jordyvl/rvl_cdip_easyocr; OCR disabled)
- ``rvl_cdip_n``          out-of-distribution RVL-CDIP-N with label remapping
- ``tobacco3482``         fixed 800/200/2482 splits (EE/configs.py:296-326)
- ``rvl_cdip_100_examples_per_class`` / ``rvl-cdip_single_10`` small subsets
- ``synthetic_rvl_cdip``  NEW: deterministic in-memory synthetic documents so
                          the full pipeline (OCR-free) runs hermetically in
                          CI and on zero-egress TPU pods.

Hub-backed datasets require a local HF cache (this environment is
zero-egress); they raise a clear error when absent rather than hanging on
network.  All builders produce ``DocClassificationDataset``: fixed-shape
numpy features per example, ready for the static-shape jit pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from multi_modal_early_exit_tpu.data.features import (
    MAX_SEQ_LENGTH,
    convert_words_to_features,
    load_tokenizer,
)
from multi_modal_early_exit_tpu.data.images import preprocess_pil_batch
from multi_modal_early_exit_tpu.data.labels import (
    RVL_CDIP_ID2LABEL,
    RVL_CDIP_N_NAME_FIX,
    TOBACCO_ID2LABEL,
)
from multi_modal_early_exit_tpu.data.ocr import apply_tesseract, have_tesseract


@dataclasses.dataclass
class DocClassificationDataset:
    """Materialized split: dict of fixed-shape numpy arrays.

    Columns: input_ids (N,S) int32, bbox (N,S,4) int32, attention_mask (N,S)
    int32, pixel_values (N,3,H,W) float32, labels (N,) int32.
    """

    name: str
    split: str
    arrays: Dict[str, np.ndarray]
    id2label: Dict[int, str]

    def __len__(self) -> int:
        return len(self.arrays["labels"])

    @property
    def num_labels(self) -> int:
        return len(self.id2label)

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        return {k: v[idx] for k, v in self.arrays.items()}

    def select(self, indices: Sequence[int]) -> "DocClassificationDataset":
        idx = np.asarray(indices)
        return dataclasses.replace(
            self, arrays={k: v[idx] for k, v in self.arrays.items()}
        )

    def downsample(self, n: int, seed: int = 42) -> "DocClassificationDataset":
        """First-n downsampling (reference --downsampling, EE/utils.py:139-140
        slices the dataloader head, i.e. order-preserving)."""
        if n <= 0 or n >= len(self):
            return self
        return self.select(np.arange(n))


# --------------------------------------------------------------------------
# synthetic dataset (hermetic)
# --------------------------------------------------------------------------

_WORDS = (
    "invoice total amount due date account memo report budget form email "
    "dear sincerely enclosed please review attached summary fiscal quarter "
    "tobacco research laboratory subject committee analysis specification"
).split()


def _text_partner(labels: np.ndarray, num_labels: int) -> np.ndarray:
    """Shifted class pairing used for token ambiguity: (K-1,0), (1,2),
    (3,4), … — deliberately DIFFERENT from the visual pairing (0,1), (2,3), …
    so that a hard example's two single-modality ambiguity sets intersect in
    exactly its true class (text narrows to {l, partner_text(l)}, vision to
    {l, partner_vision(l)}): the task stays solvable at full depth via
    multimodal fusion while capping every single-modality exit."""
    return np.where(
        labels % 2 == 1, (labels + 1) % num_labels, (labels - 1) % num_labels
    ).astype(np.int32)


def synthetic_tokens(
    n: int,
    num_labels: int = 16,
    seq_len: int = MAX_SEQ_LENGTH,
    seed: int = 42,
    tokenizer=None,
    difficulty: float = 0.0,
) -> Dict[str, np.ndarray]:
    """Host-side half of the synthetic generator: labels + tokenized
    class-dependent word mixtures (input_ids/bbox/attention_mask) + the
    ``visual_ids`` vector the page-image renderers consume.

    These arrays are small (a few MB per thousand docs) — cheap to ship to a
    remote device — while the matching page images are a pure function of
    ``visual_ids`` and can be regenerated on device
    (``synthetic_band_images_device``).

    ``difficulty`` in [0, 1] makes the accuracy axis real (VERDICT r3 #1 —
    the reference's whole eval stack trades accuracy against depth,
    EE/thresh.py:228-302; a saturated task makes that axis vacuous):

    - token ambiguity: a ``0.4·difficulty`` fraction of examples draw each
      word from the UNION of their class's and their text partner's
      vocabulary windows — text alone narrows those to a 2-class set;
    - visual ambiguity (class-overlapping bands): an independent
      ``0.4·difficulty`` fraction render their VISION pair's shared band
      pattern (``visual_ids = label & ~1``) — vision alone narrows those to
      the pair;
    - label noise: a ``0.08·difficulty`` fraction of observed labels are
      flipped to a random other class, capping ceiling accuracy below 1.

    The two ambiguity pairings differ (``_text_partner``), so hard-in-both
    examples remain solvable by fusing modalities (deep layers) while each
    single-modality embedding exit is capped — giving a genuine, monotone
    accuracy-vs-exit-depth tradeoff. ``difficulty=0`` reproduces the legacy
    easy task bit-for-bit (same rng stream)."""
    if not 0.0 <= difficulty <= 1.0:
        raise ValueError(f"difficulty must be in [0, 1], got {difficulty}")
    rng = np.random.default_rng(seed)
    tokenizer = tokenizer or load_tokenizer()
    feats: List[Dict[str, np.ndarray]] = []
    true_labels = rng.integers(0, num_labels, n).astype(np.int32)
    if difficulty > 0.0:
        # extra draws only when difficulty > 0: keeps the legacy stream
        p_hard = 0.4 * difficulty
        hard_text = rng.random(n) < p_hard
        hard_vision = rng.random(n) < p_hard
        flip = rng.random(n) < 0.08 * difficulty
        flipped = (true_labels + rng.integers(1, num_labels, n)) % num_labels
        labels = np.where(flip, flipped, true_labels).astype(np.int32)
        partners = _text_partner(true_labels, num_labels)
        visual_ids = np.where(
            hard_vision, true_labels & ~np.int32(1), true_labels
        ).astype(np.int32)
    else:
        hard_text = np.zeros(n, bool)
        labels = true_labels
        partners = true_labels
        visual_ids = true_labels
    for i in range(n):
        label = int(true_labels[i])
        n_words = int(rng.integers(8, 60))
        if hard_text[i]:
            # token-ambiguous: each word from the class's or its text
            # partner's window with equal probability
            srcs = np.where(
                rng.random(n_words) < 0.5, label, int(partners[i])
            )
            words = [
                _WORDS[(int(s) * 3 + int(rng.integers(0, 6))) % len(_WORDS)]
                for s in srcs
            ]
        else:
            # class-conditional vocabulary slice makes text informative
            lo = (label * 3) % len(_WORDS)
            words = [
                _WORDS[(lo + int(rng.integers(0, 6))) % len(_WORDS)]
                for _ in range(n_words)
            ]
        xs = rng.integers(0, 900, n_words)
        ys = np.sort(rng.integers(0, 950, n_words))
        boxes = [
            [int(x), int(y), int(x) + int(rng.integers(20, 90)),
             int(y) + int(rng.integers(10, 40))]
            for x, y in zip(xs, ys)
        ]
        feats.append(convert_words_to_features(words, boxes, tokenizer, seq_len))
    return {
        "input_ids": np.stack([f["input_ids"] for f in feats]),
        "bbox": np.stack([f["bbox"] for f in feats]),
        "attention_mask": np.stack([f["attention_mask"] for f in feats]),
        "labels": labels,
        "visual_ids": visual_ids,
    }


def synthetic_band_images(visual_ids: np.ndarray, image_size: int) -> np.ndarray:
    """Class-dependent horizontal band pattern (vision signal): white page,
    rows ``0, stride, 2*stride, ...`` (stride = 8 + id) filled with an
    id-dependent gray value. ``visual_ids`` is the rendering class — equal
    to the label on easy examples; on visually-hard examples it is the
    vision pair's shared representative (``label & ~1``), so both pair
    members render identically (class-overlapping bands)."""
    n = len(visual_ids)
    images = np.full((n, image_size, image_size, 3), 255, np.uint8)
    for i in range(n):
        vid = int(visual_ids[i])
        images[i, :: 8 + vid, :, :] = 40 + 10 * (vid % 8)
    return images


def synthetic_band_images_device(visual_ids, image_size: int):
    """Device-side twin of ``synthetic_band_images`` as jnp ops: generates
    the page images directly on the accelerator from the (tiny) visual-id
    vector, so benchmarks never push megabytes of pixels through a slow
    host->device link.  Bit-identical to the host version (tested)."""
    import jax.numpy as jnp

    vids = jnp.asarray(visual_ids, jnp.int32)
    rows = jnp.arange(image_size, dtype=jnp.int32)
    band = (rows[None, :] % (8 + vids)[:, None]) == 0  # (N, H)
    val = (40 + 10 * (vids % 8)).astype(jnp.uint8)  # (N,)
    img = jnp.where(
        band[:, :, None, None], val[:, None, None, None], jnp.uint8(255)
    )
    return jnp.broadcast_to(
        img, (vids.shape[0], image_size, image_size, 3)
    )


def synthetic_documents(
    n: int,
    num_labels: int = 16,
    seq_len: int = MAX_SEQ_LENGTH,
    image_size: int = 224,
    seed: int = 42,
    tokenizer=None,
    difficulty: float = 0.0,
) -> Dict[str, np.ndarray]:
    """Deterministic synthetic document batch: class-dependent word mixtures
    and banded page images so models can actually overfit/learn signal.
    ``difficulty`` > 0 adds token/visual ambiguity + label noise (see
    ``synthetic_tokens``)."""
    toks = synthetic_tokens(
        n, num_labels=num_labels, seq_len=seq_len, seed=seed,
        tokenizer=tokenizer, difficulty=difficulty,
    )
    images = synthetic_band_images(toks.pop("visual_ids"), image_size)

    from multi_modal_early_exit_tpu.data.images import preprocess_images

    pixel_values = np.asarray(preprocess_images(images, size=image_size))
    return {**toks, "pixel_values": pixel_values}


def build_synthetic(
    split: str,
    n_train: int = 64,
    n_eval: int = 32,
    num_labels: int = 16,
    seq_len: int = MAX_SEQ_LENGTH,
    image_size: int = 224,
    seed: int = 42,
    difficulty: float = 0.0,
) -> DocClassificationDataset:
    sizes = {"train": n_train, "validation": n_eval, "test": n_eval}
    offsets = {"train": 0, "validation": 1, "test": 2}
    arrays = synthetic_documents(
        sizes[split], num_labels=num_labels, seq_len=seq_len,
        image_size=image_size, seed=seed + 1000 * offsets[split],
        difficulty=difficulty,
    )
    id2label = {
        k: v for k, v in RVL_CDIP_ID2LABEL.items() if k < num_labels
    }
    return DocClassificationDataset("synthetic_rvl_cdip", split, arrays, id2label)


# --------------------------------------------------------------------------
# HuggingFace-hub-backed datasets (require local cache; zero egress)
# --------------------------------------------------------------------------

def _load_hub(name: str, **kwargs):
    import datasets as hfds

    try:
        return hfds.load_dataset(name, download_mode="reuse_dataset_if_exists",
                                 **kwargs)
    except Exception as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            f"dataset {name!r} is not in the local HF cache and this "
            f"environment has no network; pre-populate the cache or use "
            f"'synthetic_rvl_cdip' ({type(e).__name__}: {e})"
        ) from e


def _encode_hub_split(
    data, split: str, name: str, id2label, tokenizer, seq_len: int,
    image_size: int, batch: int = 64,
) -> DocClassificationDataset:
    """Encode an image(+words/boxes) HF split into fixed arrays.

    OCR path: pytesseract per page when words/boxes columns are absent
    (parity: processor apply_ocr=True, EE/data/RVL_CDIP.py:259-262).
    """
    has_ocr_cols = "words" in data.column_names and "boxes" in data.column_names
    if not has_ocr_cols and not have_tesseract():
        raise RuntimeError(
            f"{name}: no words/boxes columns and pytesseract unavailable"
        )
    from multi_modal_early_exit_tpu.data.ocr import normalize_box

    out = {k: [] for k in ("input_ids", "bbox", "attention_mask")}
    pixel_chunks = []
    labels = []
    for start in range(0, len(data), batch):
        rows = data[start : start + batch]
        images = rows["image"]
        label_col = "label" if "label" in rows else "labels"
        labels.extend(int(l) for l in rows[label_col])
        for j, im in enumerate(images):
            if has_ocr_cols:
                words = rows["words"][j]
                w, h = im.size
                boxes = [normalize_box(b, w, h) for b in rows["boxes"][j]]
            else:
                words, boxes = apply_tesseract(im.convert("RGB"))
            f = convert_words_to_features(words, boxes, tokenizer, seq_len)
            for k in out:
                out[k].append(f[k])
        pixel_chunks.append(preprocess_pil_batch(images, size=image_size))
    arrays = {k: np.stack(v) for k, v in out.items()}
    arrays["pixel_values"] = np.concatenate(pixel_chunks)
    arrays["labels"] = np.asarray(labels, np.int32)
    return DocClassificationDataset(name, split, arrays, dict(id2label))


def build_rvl_cdip(split: str, tokenizer=None, seq_len: int = MAX_SEQ_LENGTH,
                   image_size: int = 224) -> DocClassificationDataset:
    ds = _load_hub("aharley/rvl_cdip")[split]
    if split == "test":
        # corrupt TIFF at index 33669 (reference: EE/configs.py:243-244)
        keep = [i for i in range(len(ds)) if i != 33669]
        ds = ds.select(keep)
    return _encode_hub_split(
        ds, split, "rvl_cdip", RVL_CDIP_ID2LABEL,
        tokenizer or load_tokenizer(), seq_len, image_size,
    )


def build_rvl_cdip_easyocr(split: str, tokenizer=None,
                           seq_len: int = MAX_SEQ_LENGTH,
                           image_size: int = 224) -> DocClassificationDataset:
    ds = _load_hub("jordyvl/rvl_cdip_easyocr")[split]
    return _encode_hub_split(
        ds, split, "rvl_cdip_easyocr", RVL_CDIP_ID2LABEL,
        tokenizer or load_tokenizer(), seq_len, image_size,
    )


def build_rvl_cdip_100(split: str, tokenizer=None,
                       seq_len: int = MAX_SEQ_LENGTH,
                       image_size: int = 224) -> DocClassificationDataset:
    ds = _load_hub("jordyvl/rvl_cdip_100_examples_per_class")[split]
    return _encode_hub_split(
        ds, split, "rvl_cdip_100_examples_per_class", RVL_CDIP_ID2LABEL,
        tokenizer or load_tokenizer(), seq_len, image_size,
    )


def build_rvl_cdip_n(split: str, tokenizer=None, seq_len: int = MAX_SEQ_LENGTH,
                     image_size: int = 224) -> DocClassificationDataset:
    """RVL-CDIP-N (OOD test set) remapped onto the RVL-CDIP labelset
    (reference: EE/configs.py:257-292)."""
    import datasets as hfds

    dsd = _load_hub("jordyvl/RVL-CDIP-N")
    ds = dsd[split if split in dsd else "test"]
    names = ds.features["label"].names
    remap = {}
    for i, raw in enumerate(names):
        fixed = RVL_CDIP_N_NAME_FIX.get(raw, raw).replace(" ", "_")
        remap[i] = {v: k for k, v in RVL_CDIP_ID2LABEL.items()}[fixed]
    # cast the label feature to the FULL model labelset before remapping —
    # remapped ids exceed the OOD set's own num_classes (the reference does
    # the same cast via new Features, EE/configs.py:277-292)
    new_features = hfds.Features(
        {
            **{k: v for k, v in ds.features.items() if k != "label"},
            "label": hfds.ClassLabel(names=list(RVL_CDIP_ID2LABEL.values())),
        }
    )
    ds = ds.map(
        lambda ex: {"label": remap[ex["label"]]}, features=new_features
    )
    return _encode_hub_split(
        ds, split, "rvl_cdip_n", RVL_CDIP_ID2LABEL,
        tokenizer or load_tokenizer(), seq_len, image_size,
    )


def tobacco_split_indices(n: int, split: str, seed: int = 42) -> np.ndarray:
    """Row indices of a Tobacco-3482 split: the reference draws 800/200/2482
    contiguous ranges from ONE seed-42 shuffle of the single 'train' split
    (EE/configs.py:302-326). HF ``Dataset.shuffle(seed)`` permutes with
    ``np.random.default_rng(seed).permutation(n)``, so this reproduces the
    reference's row selection exactly (pinned in tests/test_datasets_hub.py
    against an actual ``datasets.Dataset.shuffle``)."""
    perm = np.random.default_rng(seed).permutation(n)
    bounds = {"train": (0, 800), "validation": (800, 1000), "test": (1000, n)}
    lo, hi = bounds[split]
    return perm[lo:hi]


def build_tobacco3482(split: str, tokenizer=None, seq_len: int = MAX_SEQ_LENGTH,
                      image_size: int = 224, seed: int = 42) -> DocClassificationDataset:
    """Tobacco-3482 with the reference's fixed 800/200/2482 splits drawn from
    a seeded shuffle of the single 'train' split (EE/configs.py:296-326)."""
    ds = _load_hub("maveriq/tobacco3482")["train"]
    ds = ds.select(tobacco_split_indices(len(ds), split, seed).tolist())
    return _encode_hub_split(
        ds, split, "tobacco3482", TOBACCO_ID2LABEL,
        tokenizer or load_tokenizer(), seq_len, image_size,
    )


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

DATASET_BUILDERS: Dict[str, Callable[..., DocClassificationDataset]] = {
    "synthetic_rvl_cdip": build_synthetic,
    "rvl_cdip": build_rvl_cdip,
    "rvl_cdip_easyocr": build_rvl_cdip_easyocr,
    "jordyvl/rvl_cdip_easyocr": build_rvl_cdip_easyocr,
    "rvl_cdip_100_examples_per_class": build_rvl_cdip_100,
    "jordyvl/rvl_cdip_100_examples_per_class": build_rvl_cdip_100,
    "rvl-cdip_single_10": build_rvl_cdip_100,  # small-subset alias
    "rvl_cdip_n": build_rvl_cdip_n,
    "jordyvl/RVL-CDIP-N": build_rvl_cdip_n,
    "tobacco3482": build_tobacco3482,
    "maveriq/tobacco3482": build_tobacco3482,
}


def create_subset(
    dataset: DocClassificationDataset, per_class: int, seed: int = 42
) -> DocClassificationDataset:
    """N-examples-per-class subset (parity: ``create_new_rvl``,
    EE/data/RVL_CDIP.py:449-483 — seeded shuffle, first N of each class).
    Works on any materialized split; the reference's hub push is replaced by
    saving arrays locally if desired."""
    rng = np.random.default_rng(seed)
    labels = dataset.arrays["labels"]
    perm = rng.permutation(len(dataset))
    picked: Dict[int, list] = {int(c): [] for c in np.unique(labels)}
    for i in perm:
        c = int(labels[i])
        if len(picked[c]) < per_class:
            picked[c].append(int(i))
        if all(len(v) >= per_class for v in picked.values()):
            break
    indices = [i for v in picked.values() for i in v]
    return dataset.select(indices)


def dataset_spec(name: str) -> "tuple[str, dict]":
    """Resolve a user-facing dataset name to (registry key, builder kwargs).

    ``synthetic_rvl_cdip_tiny`` is the debugEE-style small config (tiny
    shapes, 4 labels) used by tests and smoke runs.
    """
    if name == "synthetic_rvl_cdip_tiny":
        return "synthetic_rvl_cdip", dict(
            n_train=16, n_eval=8, num_labels=4, seq_len=64, image_size=32
        )
    if name == "synthetic_rvl_cdip_hard":
        # non-saturating task: accuracy genuinely trades against exit depth
        return "synthetic_rvl_cdip", dict(difficulty=1.0)
    if name.startswith("synthetic"):
        return "synthetic_rvl_cdip", {}
    return name, {}


def build_dataset(name: str, split: str, **kwargs) -> DocClassificationDataset:
    """Registry dispatch (parity: EE/configs.py:233-358)."""
    key, base_kwargs = dataset_spec(name)
    if key not in DATASET_BUILDERS:
        raise ValueError(
            f"unknown dataset {name!r}; available: {sorted(DATASET_BUILDERS)}"
        )
    return DATASET_BUILDERS[key](split, **{**base_kwargs, **kwargs})
