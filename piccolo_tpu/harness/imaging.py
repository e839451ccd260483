"""Host-side image IO (decode/resize/save) with cv2 or PIL backends.

The reference drives OpenCV directly (``localize.py:167-171,211,380-381``);
image IO stays on the host here too — only the math is on-device.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:  # pragma: no cover - environment probe
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from PIL import Image

__all__ = ["imread_rgb", "resize", "imwrite_rgb", "vconcat"]


def imread_rgb(path: str) -> np.ndarray:
    """Read an image file -> (H, W, 3) uint8 RGB."""
    if _HAS_CV2:
        bgr = cv2.imread(path)
        if bgr is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    return np.asarray(Image.open(path).convert("RGB"))


def resize(img: np.ndarray, size_wh: Tuple[int, int]) -> np.ndarray:
    """Resize uint8 image to (W, H) with bilinear interpolation."""
    if img.shape[1] == size_wh[0] and img.shape[0] == size_wh[1]:
        return img
    if _HAS_CV2:
        return cv2.resize(img, size_wh)
    return np.asarray(Image.fromarray(img).resize(size_wh, Image.BILINEAR))


def imwrite_rgb(path: str, img: np.ndarray) -> None:
    """Write (H, W, 3) uint8 RGB to disk."""
    if _HAS_CV2:
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    else:
        Image.fromarray(img).save(path)


def vconcat(top: np.ndarray, bottom: np.ndarray) -> np.ndarray:
    return np.concatenate([top, bottom], axis=0)
