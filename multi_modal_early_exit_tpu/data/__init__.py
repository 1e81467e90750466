"""Data layer: datasets, OCR ingestion, feature conversion, fused image
preprocessing, and TPU-friendly batch loading.

Capability parity with the reference data stack (EE/data/RVL_CDIP.py,
EE/data/__init__.py, EE/configs.py:233-358) — see individual modules.
"""

from multi_modal_early_exit_tpu.data.datasets import (  # noqa: F401
    DATASET_BUILDERS,
    DocClassificationDataset,
    build_dataset,
    build_synthetic,
    synthetic_documents,
)
from multi_modal_early_exit_tpu.data.features import (  # noqa: F401
    HashWordTokenizer,
    batch_features,
    convert_words_to_features,
    load_tokenizer,
)
from multi_modal_early_exit_tpu.data.images import (  # noqa: F401
    preprocess_images,
    preprocess_pil_batch,
)
from multi_modal_early_exit_tpu.data.labels import (  # noqa: F401
    RVL_CDIP_ID2LABEL,
    TOBACCO_ID2LABEL,
)
from multi_modal_early_exit_tpu.data.loader import (  # noqa: F401
    accumulation_layout,
    iterate_batches,
    prefetch_to_device,
)
from multi_modal_early_exit_tpu.data.ocr import (  # noqa: F401
    apply_tesseract,
    have_tesseract,
    normalize_box,
)
