"""Host frame transforms: exact ports of the reference's torchvision
pipelines (cremad/get_data.py:94-109).

train: RandomResizedCrop(224) + RandomHorizontalFlip + ImageNet normalize
eval:  Resize((224, 224)) + ImageNet normalize

The crop-box sampler reproduces torchvision's RandomResizedCrop parameter
search (scale (0.08, 1.0), log-uniform ratio (3/4, 4/3), 10 attempts, then
the clamped center-crop fallback) against a caller-owned numpy Generator so
a loader's frame stream is deterministic per seed.  Decoding prefers the
native libjpeg path (utils/native.py) where it applies and falls back to
PIL.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

_SCALE = (0.08, 1.0)
_RATIO = (3.0 / 4.0, 4.0 / 3.0)


def random_resized_crop_box(rng: np.random.Generator, width: int,
                            height: int,
                            scale: Tuple[float, float] = _SCALE,
                            ratio: Tuple[float, float] = _RATIO
                            ) -> Tuple[int, int, int, int]:
    """(left, top, right, bottom) pixel box, torchvision semantics."""
    area = width * height
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            top = int(rng.integers(0, height - h + 1))
            left = int(rng.integers(0, width - w + 1))
            return left, top, left + w, top + h
    # fallback: center crop at the nearest in-range aspect
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w, h = width, int(round(width / ratio[0]))
    elif in_ratio > ratio[1]:
        w, h = int(round(height * ratio[1])), height
    else:
        w, h = width, height
    left = (width - w) // 2
    top = (height - h) // 2
    return left, top, left + w, top + h


def _normalize(img01: np.ndarray) -> np.ndarray:
    return ((img01 - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)


def _quantize_u8(img01: np.ndarray) -> np.ndarray:
    """Float [0,1] -> uint8, PIL-faithful: the reference's torchvision
    pipeline reads a uint8 PIL image into ToTensor, so post-resize data IS
    8-bit.  The native decoder's antialiased resample keeps float precision
    internally; rounding here makes the native and PIL paths agree on the
    wire format."""
    return np.clip(np.rint(img01 * 255.0), 0, 255).astype(np.uint8)


def normalize_frames_device(frames):
    """On-device ToTensor+Normalize for uint8-shipped frames (jnp in/out):
    uint8 (..., 3) -> float32 ImageNet-normalized.  Shipping uint8 is 2x
    fewer H2D bytes than bf16 and 4x fewer than fp32 — on this image's
    ~50 MB/s TPU tunnel that is the e2e bottleneck.  A float input passes
    through unchanged (synthetic twins / legacy float adapters)."""
    import jax.numpy as jnp

    if frames.dtype != jnp.uint8:
        return frames
    x = frames.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def to_unit_floats_device(x):
    """On-device ToTensor for uint8-shipped images WITHOUT ImageNet
    normalization (jnp in/out): uint8 -> float32 in [0, 1].  Float inputs
    pass through unchanged (synthetic twins)."""
    import jax.numpy as jnp

    if x.dtype != jnp.uint8:
        return x
    return x.astype(jnp.float32) / 255.0


def _pil_open(path: str):
    from PIL import Image

    return Image.open(path).convert("RGB")


def load_frame_eval_u8(path: str, size: int = 224) -> np.ndarray:
    """Resize((size, size)) -> uint8 RGB — deterministic eval transform,
    pre-normalization (ship this; normalize on device).

    Uses the native libjpeg decode-with-resize (DCT-domain downscale) when
    built; PIL bilinear otherwise.
    """
    try:
        from ..utils import native

        decoded = native.decode_jpeg(path, size, size)
    except Exception:
        decoded = None
    if decoded is not None:
        return _quantize_u8(decoded)
    from PIL import Image

    img = _pil_open(path).resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.uint8)


def load_frame_eval(path: str, size: int = 224) -> np.ndarray:
    """load_frame_eval_u8 + host-side ToTensor/Normalize (float output)."""
    return _normalize(load_frame_eval_u8(path, size).astype(np.float32)
                      / 255.0)


def load_frame_train_u8(path: str, rng: np.random.Generator,
                        size: int = 224) -> np.ndarray:
    """RandomResizedCrop(size) + horizontal flip (p=0.5) -> uint8 RGB,
    pre-normalization.

    Decode prefers the native crop-path (one file read shared between the
    header dims probe and libjpeg decode_jpeg_crop_resize — GIL-free, so
    loader workers scale); PIL box-resize otherwise.  The rng draw order
    (crop box, then flip) is identical on both paths.
    """
    data = None
    dims = None
    try:
        from ..utils import native

        with open(path, "rb") as f:
            data = f.read()
        dims = native.jpeg_dims(data)
    except Exception:
        dims = None
    out = None
    box = None
    if dims is not None:
        height, width = dims
        box = random_resized_crop_box(rng, width, height)
        out = native.decode_jpeg_crop(data, box, size, size)
    if out is not None:
        out = _quantize_u8(out)
    else:
        from PIL import Image

        img = _pil_open(path)
        if box is None:  # dims probe failed: draw against PIL's dims
            box = random_resized_crop_box(rng, img.width, img.height)
        img = img.resize((size, size), Image.BILINEAR, box=box)
        out = np.asarray(img, np.uint8)
    if rng.random() < 0.5:
        out = out[:, ::-1]
    return out


def load_frame_train(path: str, rng: np.random.Generator,
                     size: int = 224) -> np.ndarray:
    """load_frame_train_u8 + host-side ToTensor/Normalize (float output)."""
    return _normalize(load_frame_train_u8(path, rng, size)
                      .astype(np.float32) / 255.0)


def transform_frame_train_u8(img: np.ndarray, rng: np.random.Generator,
                             size: int = 224) -> np.ndarray:
    """RandomResizedCrop(size) + horizontal flip on an ALREADY-DECODED
    uint8 RGB array (the mp4-direct frame-streaming path, where libav
    hands us pixels instead of a JPEG file).  Same transform semantics
    and rng draw order (crop box, then flip) as load_frame_train_u8."""
    from PIL import Image

    pil = Image.fromarray(img)
    box = random_resized_crop_box(rng, pil.width, pil.height)
    out = np.asarray(pil.resize((size, size), Image.BILINEAR, box=box),
                     np.uint8)
    if rng.random() < 0.5:
        out = out[:, ::-1]
    return out


def transform_frame_eval_u8(img: np.ndarray, size: int = 224) -> np.ndarray:
    """Resize((size, size)) on an already-decoded uint8 RGB array —
    deterministic eval twin of transform_frame_train_u8."""
    from PIL import Image

    return np.asarray(Image.fromarray(img).resize((size, size),
                                                  Image.BILINEAR), np.uint8)
