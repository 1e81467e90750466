"""Offline tests for the hub-backed dataset builders.

The real hub datasets (rvl_cdip, jordyvl/rvl_cdip_easyocr, jordyvl/RVL-CDIP-N,
maveriq/tobacco3482) cannot be downloaded in this zero-egress environment, so
these tests monkeypatch ``_load_hub`` with in-memory ``datasets.Dataset``
fakes and pin the fiddly logic the builders mirror from the reference:
name fixes + label remapping (EE/configs.py:257-292), the seeded Tobacco
800/200/2482 splits (EE/configs.py:296-326), and the words/boxes (EasyOCR)
encode branch (EE/data/RVL_CDIP.py:328-408).
"""

import numpy as np
import pytest

datasets = pytest.importorskip("datasets")
from PIL import Image as PILImage

from multi_modal_early_exit_tpu.data import datasets as ds_mod
from multi_modal_early_exit_tpu.data.datasets import (
    build_dataset,
    build_rvl_cdip_n,
    build_tobacco3482,
    tobacco_split_indices,
)
from multi_modal_early_exit_tpu.data.features import HashWordTokenizer
from multi_modal_early_exit_tpu.data.labels import (
    RVL_CDIP_ID2LABEL,
    RVL_CDIP_LABEL2ID,
    TOBACCO_ID2LABEL,
)

TOK = HashWordTokenizer()


def _fake_image(seed: int, size: int = 24) -> PILImage.Image:
    rng = np.random.default_rng(seed)
    return PILImage.fromarray(
        rng.integers(0, 255, (size, size, 3), np.uint8), "RGB"
    )


def _fake_ocr_dataset(n: int, names=None, image_size: int = 24):
    """In-memory stand-in for jordyvl/rvl_cdip_easyocr-style rows:
    image + precomputed words/boxes (pixel coords) + ClassLabel."""
    names = names or list(RVL_CDIP_ID2LABEL.values())
    rng = np.random.default_rng(0)
    rows = {
        "image": [_fake_image(i, image_size) for i in range(n)],
        "words": [
            ["invoice", "total", f"w{i}"][: 1 + i % 3] for i in range(n)
        ],
        "boxes": [
            [[1, 2, 10, 12]] * (1 + i % 3) for i in range(n)
        ],
        "label": [int(rng.integers(0, len(names))) for _ in range(n)],
    }
    feats = datasets.Features(
        {
            "image": datasets.Image(),
            "words": datasets.Sequence(datasets.Value("string")),
            "boxes": datasets.Sequence(
                datasets.Sequence(datasets.Value("int64"))
            ),
            "label": datasets.ClassLabel(names=names),
        }
    )
    return datasets.Dataset.from_dict(rows, features=feats)


def test_encode_hub_split_easyocr_branch(monkeypatch):
    """words/boxes columns present -> EasyOCR branch: no tesseract needed,
    pixel-coordinate boxes normalized to the 0-1000 grid."""
    fake = _fake_ocr_dataset(6)
    monkeypatch.setattr(
        ds_mod, "_load_hub", lambda name, **kw: {"test": fake}
    )
    out = build_dataset(
        "rvl_cdip_easyocr", "test", tokenizer=TOK, seq_len=16, image_size=16
    )
    assert len(out) == 6
    assert out.arrays["input_ids"].shape == (6, 16)
    assert out.arrays["bbox"].shape == (6, 16, 4)
    assert out.arrays["pixel_values"].shape == (6, 3, 16, 16)
    assert out.num_labels == 16
    # box [1,2,10,12] on a 24x24 page -> floor-scaled 0-1000 grid
    # (reference normalize_box, EE/data/RVL_CDIP.py:20-30)
    row0 = out.arrays["bbox"][0]
    word_boxes = row0[(row0[:, 2] > 0) & (row0[:, 2] < 1000)]
    np.testing.assert_array_equal(
        word_boxes[0], [int(1000 * 1 / 24), int(1000 * 2 / 24),
                        int(1000 * 10 / 24), int(1000 * 12 / 24)]
    )
    # labels flow through unchanged
    np.testing.assert_array_equal(
        out.arrays["labels"], np.asarray(fake["label"], np.int32)
    )


def test_encode_hub_split_requires_ocr_when_no_word_columns(monkeypatch):
    """No words/boxes and no tesseract -> clear error, not a silent hang
    (the rvl_cdip branch would OCR via pytesseract on a real machine)."""
    fake = _fake_ocr_dataset(3).remove_columns(["words", "boxes"])
    monkeypatch.setattr(
        ds_mod, "_load_hub", lambda name, **kw: {"train": fake}
    )
    monkeypatch.setattr(ds_mod, "have_tesseract", lambda: False)
    with pytest.raises(RuntimeError, match="pytesseract"):
        build_dataset("rvl_cdip", "train", tokenizer=TOK, seq_len=16,
                      image_size=16)


def test_tobacco_split_indices_match_hf_shuffle():
    """The pure split function must select exactly the rows that the
    reference's ``data['train'].shuffle(seed=42).select(range(lo, hi))``
    selects (EE/configs.py:302-326) — pinned against the real HF shuffle."""
    n = 1100
    base = datasets.Dataset.from_dict({"row": list(range(n))})
    shuffled = base.shuffle(seed=42)
    ref = {
        "train": shuffled.select(range(0, 800))["row"],
        "validation": shuffled.select(range(800, 1000))["row"],
        "test": shuffled.select(range(1000, n))["row"],
    }
    for split, want in ref.items():
        got = tobacco_split_indices(n, split, seed=42)
        np.testing.assert_array_equal(got, np.asarray(want))
    # disjoint and exhaustive
    all_rows = np.concatenate(
        [tobacco_split_indices(n, s) for s in ("train", "validation", "test")]
    )
    assert len(np.unique(all_rows)) == n


def test_build_tobacco_splits_end_to_end(monkeypatch):
    """Seeded split + encode: right sizes, right labelset, row-identity
    verified via the label column."""
    names = list(TOBACCO_ID2LABEL.values())
    n = 1010
    fake = _fake_ocr_dataset(n, names=names, image_size=12)
    monkeypatch.setattr(
        ds_mod, "_load_hub", lambda name, **kw: {"train": fake}
    )
    val = build_tobacco3482("validation", tokenizer=TOK, seq_len=8,
                            image_size=8)
    assert len(val) == 200
    assert val.num_labels == 10
    want_rows = tobacco_split_indices(n, "validation")
    np.testing.assert_array_equal(
        val.arrays["labels"], np.asarray(fake["label"])[want_rows]
    )


def test_rvl_cdip_n_label_remap(monkeypatch):
    """RVL-CDIP-N ships space-separated class names in its own order; the
    builder must remap every row onto RVL-CDIP ids by fixed name
    (EE/configs.py:257-292 builds the same correspondence dynamically)."""
    # a name order deliberately misaligned with RVL-CDIP ids, with both
    # space-separated multiword names and exact-match names
    n_names = ["budget", "email", "file folder", "news article",
               "scientific report", "letter"]
    fake = _fake_ocr_dataset(12, names=n_names, image_size=12)
    monkeypatch.setattr(
        ds_mod, "_load_hub", lambda name, **kw: {"test": fake}
    )
    out = build_rvl_cdip_n("test", tokenizer=TOK, seq_len=8, image_size=8)
    fixed = [name.replace(" ", "_") for name in n_names]
    want = np.asarray(
        [RVL_CDIP_LABEL2ID[fixed[l]] for l in fake["label"]], np.int32
    )
    np.testing.assert_array_equal(out.arrays["labels"], want)
    assert out.num_labels == 16  # model labelset, not the 6 OOD classes


def test_rvl_cdip_n_split_fallback(monkeypatch):
    """RVL-CDIP-N is test-only; asking for validation falls back to test
    (the reference only ever evaluates on it)."""
    fake = _fake_ocr_dataset(4, names=["letter", "form"], image_size=12)
    calls = []

    def fake_load(name, **kw):
        calls.append(name)
        return {"test": fake}

    monkeypatch.setattr(ds_mod, "_load_hub", fake_load)
    out = build_rvl_cdip_n("validation", tokenizer=TOK, seq_len=8,
                           image_size=8)
    assert len(out) == 4
    assert calls == ["jordyvl/RVL-CDIP-N"]
