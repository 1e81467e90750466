"""Fused, jit-compiled image preprocessing for document pages.

Parity target: the HF ``LayoutLMv3ImageProcessor`` pipeline the reference
drives through ``AutoProcessor`` (EE/data/RVL_CDIP.py:259, 355): resize to
224x224 bilinear, rescale 1/255, normalize with mean=std=0.5 per channel,
channels-first output.

TPU-first: the whole pipeline is one jitted function over a *batch* of
uint8 images — resize, rescale, normalize, and transpose fuse into a single
XLA program on device, replacing the reference's per-image PIL work on host
CPU (BASELINE.json north star: "image resize/normalize/patch-embed becomes
one fused jit-compiled preprocessing stage"). PIL decoding (JPEG/TIFF)
stays on host; everything after raw RGB bytes runs on device.
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGE_MEAN = 0.5
IMAGE_STD = 0.5


@partial(jax.jit, static_argnames=("size",))
def preprocess_images(images_u8: jax.Array, size: int = 224) -> jax.Array:
    """(B, H, W, 3) uint8 -> (B, 3, size, size) float32, normalized.

    Bilinear resize matches PIL's default resample for the HF processor;
    tiny boundary differences vs PIL antialiasing are below the logit-parity
    tolerance for 224-target document pages.
    """
    x = images_u8.astype(jnp.float32)
    b = x.shape[0]
    x = jax.image.resize(x, (b, size, size, 3), method="bilinear")
    x = x / 255.0
    x = (x - IMAGE_MEAN) / IMAGE_STD
    return x.transpose(0, 3, 1, 2)


def decode_to_array(image, target: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """PIL image -> RGB uint8 (H, W, 3) host array (optionally pre-resized on
    host when source pages are huge, to bound host->device transfer)."""
    image = image.convert("RGB")
    if target is not None and image.size != target:
        image = image.resize(target)
    return np.asarray(image, dtype=np.uint8)


def preprocess_pil_batch(images: Iterable, size: int = 224) -> np.ndarray:
    """Convenience host path: list of PIL images -> normalized (B,3,S,S).

    Decodes on host, resizes each page to a common shape (device resize needs
    uniform input), then runs the fused jit pipeline.
    """
    arrs = [decode_to_array(im, target=(size, size)) for im in images]
    batch = np.stack(arrs)
    return np.asarray(preprocess_images(batch, size=size))
