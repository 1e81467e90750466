"""Data layer tests: feature conversion parity, synthetic dataset, loader."""

import numpy as np
import pytest

from multi_modal_early_exit_tpu.data.features import (
    HashWordTokenizer,
    convert_words_to_features,
)
from multi_modal_early_exit_tpu.data.datasets import build_synthetic
from multi_modal_early_exit_tpu.data.images import preprocess_images
from multi_modal_early_exit_tpu.data.loader import (
    accumulation_layout,
    iterate_batches,
)
from multi_modal_early_exit_tpu.data.ocr import normalize_box


def test_normalize_box_clips_to_grid():
    # parity: EE/data/RVL_CDIP.py:20-30 incl. the negative/overflow fixes
    assert normalize_box([0, 0, 100, 200], 100, 200) == [0, 0, 1000, 1000]
    assert normalize_box([-5, 0, 150, 100], 100, 100) == [0, 0, 1000, 1000]
    assert normalize_box([10, 20, 30, 40], 100, 100) == [100, 200, 300, 400]


def test_convert_words_to_features_shapes_and_special_boxes():
    tok = HashWordTokenizer()
    words = ["hello", "world"]
    boxes = [[1, 2, 3, 4], [5, 6, 7, 8]]
    f = convert_words_to_features(words, boxes, tok, max_seq_length=16)
    assert f["input_ids"].shape == (16,)
    assert f["bbox"].shape == (16, 4)
    assert f["attention_mask"].shape == (16,)
    # CLS first with zero box; SEP box 1000s; padding zero boxes + mask 0
    assert f["input_ids"][0] == tok.cls_token_id
    assert list(f["bbox"][0]) == [0, 0, 0, 0]
    n_real = int(f["attention_mask"].sum())
    assert f["input_ids"][n_real - 1] == tok.sep_token_id
    assert list(f["bbox"][n_real - 1]) == [1000, 1000, 1000, 1000]
    assert (f["input_ids"][n_real:] == tok.pad_token_id).all()
    assert (f["bbox"][n_real:] == 0).all()
    # token-per-word box replication
    assert list(f["bbox"][1]) == [1, 2, 3, 4]


def test_convert_words_truncation():
    tok = HashWordTokenizer()
    words = ["w"] * 100
    boxes = [[0, 0, 10, 10]] * 100
    f = convert_words_to_features(words, boxes, tok, max_seq_length=32)
    assert f["input_ids"].shape == (32,)
    assert int(f["attention_mask"].sum()) == 32  # truncated to 30 + CLS + SEP


def test_hash_tokenizer_deterministic():
    a = HashWordTokenizer().convert_tokens_to_ids(["invoice", "budget"])
    b = HashWordTokenizer().convert_tokens_to_ids(["invoice", "budget"])
    assert a == b
    assert all(4 <= i < 50265 for i in a)


def test_preprocess_images_normalization():
    imgs = np.full((2, 64, 64, 3), 255, np.uint8)
    out = np.asarray(preprocess_images(imgs, size=32))
    assert out.shape == (2, 3, 32, 32)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)  # (255/255 - .5)/.5 = 1
    imgs0 = np.zeros((1, 16, 16, 3), np.uint8)
    np.testing.assert_allclose(
        np.asarray(preprocess_images(imgs0, size=16)), -1.0, atol=1e-6
    )


def test_synthetic_dataset_deterministic_and_shaped():
    ds1 = build_synthetic("train", n_train=8, num_labels=4, seq_len=32,
                          image_size=32)
    ds2 = build_synthetic("train", n_train=8, num_labels=4, seq_len=32,
                          image_size=32)
    assert len(ds1) == 8
    assert ds1.arrays["pixel_values"].shape == (8, 3, 32, 32)
    assert ds1.arrays["input_ids"].shape == (8, 32)
    for k in ds1.arrays:
        np.testing.assert_array_equal(ds1.arrays[k], ds2.arrays[k])
    # splits differ
    ds3 = build_synthetic("test", n_eval=8, num_labels=4, seq_len=32,
                          image_size=32)
    assert not np.array_equal(ds1.arrays["labels"], ds3.arrays["labels"])


def test_iterate_batches_padding_and_mask():
    ds = build_synthetic("train", n_train=10, num_labels=4, seq_len=16,
                         image_size=32)
    batches = list(iterate_batches(ds, batch_size=4))
    assert len(batches) == 3
    assert batches[-1]["input_ids"].shape == (4, 16)
    np.testing.assert_array_equal(batches[-1]["sample_mask"], [1, 1, 0, 0])
    # drop_last drops the short batch
    assert len(list(iterate_batches(ds, batch_size=4, drop_last=True))) == 2


def test_accumulation_layout():
    batch = {"x": np.arange(24).reshape(6, 4)}
    out = accumulation_layout(batch, accum_steps=3)
    assert out["x"].shape == (3, 2, 4)
    np.testing.assert_array_equal(out["x"][0], [[0, 1, 2, 3], [4, 5, 6, 7]])


def test_create_subset_balanced():
    from multi_modal_early_exit_tpu.data.datasets import create_subset

    ds = build_synthetic("train", n_train=60, num_labels=4, seq_len=16,
                         image_size=32)
    sub = create_subset(ds, per_class=3)
    labels = sub.arrays["labels"]
    counts = np.bincount(labels, minlength=4)
    assert (counts <= 3).all()
    assert len(sub) == counts.sum()


def test_synthetic_band_images_device_matches_host():
    """The device-side image twin (used by bench to avoid shipping pixels
    over a slow host->device link) must be bit-identical to the host
    generator."""
    from multi_modal_early_exit_tpu.data.datasets import (
        synthetic_band_images,
        synthetic_band_images_device,
    )

    labels = np.arange(16, dtype=np.int32)
    host = synthetic_band_images(labels, 64)
    dev = np.asarray(synthetic_band_images_device(labels, 64))
    np.testing.assert_array_equal(host, dev)


def test_synthetic_difficulty_zero_is_legacy_stream():
    """difficulty=0 must reproduce the legacy generator bit-for-bit (same
    rng stream) so golden/regression artifacts stay valid."""
    from multi_modal_early_exit_tpu.data.datasets import synthetic_tokens

    a = synthetic_tokens(10, num_labels=4, seq_len=24, seed=11)
    b = synthetic_tokens(10, num_labels=4, seq_len=24, seed=11, difficulty=0.0)
    for k in ("input_ids", "bbox", "attention_mask", "labels"):
        np.testing.assert_array_equal(a[k], b[k])
    np.testing.assert_array_equal(a["visual_ids"], a["labels"])


def test_synthetic_difficulty_adds_ambiguity_and_noise():
    """difficulty=1: visual ids collapse a fraction of examples onto the
    vision pair representative, some observed labels are flipped, and the
    text/vision pairings differ so fusion can still resolve every hard
    example (the accuracy axis becomes real — VERDICT r3 #1)."""
    from multi_modal_early_exit_tpu.data.datasets import (
        _text_partner,
        synthetic_tokens,
    )

    t = synthetic_tokens(600, num_labels=16, seq_len=32, seed=5, difficulty=1.0)
    lab, vid = t["labels"], t["visual_ids"]
    # visually-hard examples render the pair representative (label & ~1);
    # expect roughly 0.4 * P(odd label) = ~20% strictly-changed ids
    changed = np.mean(vid != lab)
    assert 0.05 < changed < 0.5
    # visual ids derive from the TRUE label (the first rng draw, identical
    # across difficulty settings): own class or its vision pair rep
    true = synthetic_tokens(600, num_labels=16, seq_len=32, seed=5,
                            difficulty=0.0)["labels"]
    assert np.all((vid == true) | (vid == (true & ~1)))
    # pairings differ for every class: text partner != vision partner
    k = 16
    tp = _text_partner(np.arange(k), k)
    assert all(int(tp[l]) != (l ^ 1) for l in range(k))
    # label noise: the true labels are the FIRST rng draw (identical across
    # difficulty settings), so comparing against difficulty=0 isolates the
    # flipped fraction — expect ~8%
    clean = synthetic_tokens(600, num_labels=16, seq_len=32, seed=5,
                             difficulty=0.0)
    flipped = np.mean(t["labels"] != clean["labels"])
    assert 0.02 < flipped < 0.2


def test_synthetic_tokens_compose_to_documents():
    """synthetic_documents == synthetic_tokens + band images + preprocessing
    (the refactor must not change the dataset)."""
    from multi_modal_early_exit_tpu.data.datasets import (
        synthetic_documents,
        synthetic_tokens,
    )

    docs = synthetic_documents(6, num_labels=4, seq_len=16, image_size=32,
                               seed=7)
    toks = synthetic_tokens(6, num_labels=4, seq_len=16, seed=7)
    for k in ("input_ids", "bbox", "attention_mask", "labels"):
        np.testing.assert_array_equal(docs[k], toks[k])
    assert docs["pixel_values"].shape == (6, 3, 32, 32)
