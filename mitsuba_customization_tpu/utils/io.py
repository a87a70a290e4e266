"""Image IO: EXR/PFM/PNG/NPY output, bitmap reading.

TPU-native counterpart of mitsuba3 src/core/bitmap.cpp (SURVEY.md §2.3).
EXR (the reference's native HDR format) is handled by the pure-Python
reader/writer in utils/exr.py (no OpenEXR C library in this environment);
8-bit output goes through PIL with sRGB tonemapping.
"""

from __future__ import annotations

import numpy as np

from mitsuba_customization_tpu.core.spectrum import linear_to_srgb


def write_image(path, image):
    """Write by extension: .exr/.pfm float-exact, .npy, or tonemapped .png."""
    p = str(path)
    if p.endswith(".exr"):
        from mitsuba_customization_tpu.utils.exr import write_exr

        write_exr(p, np.asarray(image, np.float32))
    elif p.endswith(".pfm"):
        from mitsuba_customization_tpu.utils.exr import write_pfm

        write_pfm(p, np.asarray(image, np.float32))
    elif p.endswith(".npy"):
        write_npy(p, image)
    else:
        write_png(p, image)


def write_png(path, image, tonemap=True):
    """Write an (H, W, 3) linear-RGB float image as 8-bit sRGB PNG."""
    from PIL import Image

    img = np.asarray(image, dtype=np.float32)
    if tonemap:
        img = np.asarray(linear_to_srgb(np.clip(img, 0.0, 1.0)))
    img8 = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(img8).save(path)


def write_npy(path, image):
    """Float-exact image dump (the EXR stand-in for goldens)."""
    np.save(path, np.asarray(image, dtype=np.float32))


def read_image(path):
    """Read an image file into linear-RGB float32 (H, W, 3)."""
    path = str(path)
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    if path.endswith(".exr"):
        from mitsuba_customization_tpu.utils.exr import read_exr

        img = read_exr(path)
        return (
            np.repeat(img, 3, axis=-1) if img.shape[-1] == 1 else img
        ).astype(np.float32)
    if path.endswith(".pfm"):
        from mitsuba_customization_tpu.utils.exr import read_pfm

        img = read_pfm(path)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        return img.astype(np.float32)
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    # PNG/JPG are sRGB-encoded: linearize.
    lin = np.where(
        img <= 0.04045, img / 12.92, ((img + 0.055) / 1.055) ** 2.4
    )
    return lin.astype(np.float32)
