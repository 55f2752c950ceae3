"""Image I/O and normalization helpers.

Replaces the reference's skimage-based helpers (reference/imagereader.py:34-60)
with imageio-backed I/O. Normalization math is identical.
"""

from __future__ import annotations

import numpy as np


def zscore_normalize(image_data: np.ndarray) -> np.ndarray:
    """Per-image z-score; mean-subtract only when std <= 1.

    Matches reference/imagereader.py:34-46 (whole-image statistics, float32,
    and the degenerate-contrast guard that skips the divide).
    """
    image_data = image_data.astype(np.float32)
    std = np.std(image_data)
    mean = np.mean(image_data)
    if std <= 1.0:
        return image_data - mean
    return (image_data - mean) / std


def imread(fp: str) -> np.ndarray:
    import imageio.v2 as iio
    return np.asarray(iio.imread(fp))


def imwrite(img: np.ndarray, fp: str) -> None:
    import imageio.v2 as iio
    iio.imwrite(fp, img)


def format_image_chw(image_data: np.ndarray) -> np.ndarray:
    """HWC -> CHW transpose (reference/imagereader.py:57-60).

    Kept for API parity with the reference's NCHW interchange format; the
    TPU model consumes NHWC internally and accepts either layout at the edge.
    """
    return np.transpose(image_data, [2, 0, 1])


def ensure_hwc(img: np.ndarray) -> np.ndarray:
    """Promote a 2-D grayscale image to HWC with one channel."""
    if img.ndim == 2:
        return img[:, :, None]
    return img
