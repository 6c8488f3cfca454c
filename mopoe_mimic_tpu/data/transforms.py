"""Image transforms (parity: get_transform_img at
mimic/dataio/utils.py:27-69).

Default path: bicubic resize to img_size (the array store is already
img_size so this is a no-op there). DenseNet path: grayscale→RGB + ImageNet
normalization + Five/TenCrop(224). Implemented in numpy on the host (these
run in the input pipeline, not on device)."""

from __future__ import annotations

from typing import Callable, List

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], dtype=np.float32)


def resize_bicubic(img: np.ndarray, size: int) -> np.ndarray:
    """[H, W, C] → [size, size, C] (PIL bicubic, matching the reference)."""
    if img.shape[0] == size and img.shape[1] == size:
        return img
    from PIL import Image

    chans = [
        np.asarray(
            Image.fromarray((np.clip(img[..., c], 0, 1) * 255).astype(np.uint8)).resize(
                (size, size), Image.BICUBIC
            ),
            dtype=np.float32,
        )
        / 255.0
        for c in range(img.shape[-1])
    ]
    return np.stack(chans, axis=-1)


def to_rgb_normalized(img: np.ndarray) -> np.ndarray:
    """Grayscale [H, W, 1] → ImageNet-normalized RGB [H, W, 3]
    (dataio/utils.py:42-55)."""
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def five_crop(img: np.ndarray, size: int = 224) -> np.ndarray:
    """[H, W, C] → [5, size, size, C]: four corners + center."""
    h, w = img.shape[:2]
    tl = img[:size, :size]
    tr = img[:size, w - size :]
    bl = img[h - size :, :size]
    br = img[h - size :, w - size :]
    top = (h - size) // 2
    left = (w - size) // 2
    center = img[top : top + size, left : left + size]
    return np.stack([tl, tr, bl, br, center])


def ten_crop(img: np.ndarray, size: int = 224) -> np.ndarray:
    """Five crops + their horizontal flips."""
    five = five_crop(img, size)
    return np.concatenate([five, five[:, :, ::-1]], axis=0)


def get_transform_img(
    img_size: int, feature_extractor: str = "resnet", n_crops: int = 1
) -> Callable[[np.ndarray], np.ndarray]:
    """Transform factory (dataio/utils.py:27-69). resnet: resize only.
    densenet: upscale ≥ 256, RGB+normalize, optional 5/10-crop(224)."""
    if feature_extractor == "resnet":
        return lambda img: resize_bicubic(img, img_size)

    def densenet_tf(img: np.ndarray) -> np.ndarray:
        img = resize_bicubic(img, max(img_size, 256))
        img = to_rgb_normalized(img)
        if n_crops == 5:
            return five_crop(img)
        if n_crops == 10:
            return ten_crop(img)
        return resize_bicubic(img, 224) if img.shape[0] != 224 else img

    return densenet_tf
