"""Host-side image preprocessing.

Two pipelines, parity with the reference processors
(processing_bailingmm.py:79-124, :175-176):
  - understanding: square-resize to 1024x1024 (PIL bicubic) -> normalize(0.5, 0.5)
  - generation/edit: resize short side to 512 -> center-crop 512 -> normalize

PIL is used for the resize itself because the reference resizes PIL images
through torchvision (which delegates to PIL's antialiased bicubic) — exact parity
for free. A fused pure-JAX path (`normalize_chw`) covers the on-device part.
"""

from __future__ import annotations

import numpy as np

try:
    from PIL import Image

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False


def _to_pil(img):
    if HAVE_PIL and isinstance(img, Image.Image):
        return img
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[0] < arr.shape[-1]:
        arr = np.transpose(arr, (1, 2, 0))
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    return Image.fromarray(arr)


def normalize_chw(arr_hwc: np.ndarray, mean=0.5, std=0.5) -> np.ndarray:
    """uint8 HWC -> fp32 CHW normalized (ToTensor + Normalize)."""
    x = arr_hwc.astype(np.float32) / 255.0
    x = (x - mean) / std
    return np.transpose(x, (2, 0, 1))


def preprocess_understanding(img, image_size: int = 1024, mean=0.5, std=0.5) -> np.ndarray:
    """Square resize (distorting aspect) + normalize. (3, S, S) fp32."""
    pil = _to_pil(img).convert("RGB")
    pil = pil.resize((image_size, image_size), Image.BICUBIC)
    return normalize_chw(np.asarray(pil), mean, std)


def preprocess_generation(img, image_size: int = 512, mean=0.5, std=0.5) -> np.ndarray:
    """Resize short side + center crop + normalize (torchvision semantics).

    torchvision Resize(int): short side -> size, preserving aspect ratio.
    CenterCrop(size): crop centered with rounding identical to torchvision.
    """
    pil = _to_pil(img).convert("RGB")
    w, h = pil.size
    if w < h:
        nw, nh = image_size, max(1, int(round(image_size * h / w)))
    else:
        nh, nw = image_size, max(1, int(round(image_size * w / h)))
    pil = pil.resize((nw, nh), Image.BICUBIC)
    left = int(round((nw - image_size) / 2.0))
    top = int(round((nh - image_size) / 2.0))
    pil = pil.crop((left, top, left + image_size, top + image_size))
    return normalize_chw(np.asarray(pil), mean, std)


def tensor_to_image(x: np.ndarray) -> np.ndarray:
    """Model output (3, H, W) in [-1, 1] -> uint8 HWC (matches tensor_to_pil,
    modeling_bailing_moe.py:84-90: x/2 + 0.5 then to PIL)."""
    x = np.asarray(x, np.float32)
    if x.ndim == 4:
        x = x[0]
    x = x / 2.0 + 0.5
    x = np.clip(x * 255.0, 0, 255).astype(np.uint8)
    return np.transpose(x, (1, 2, 0))


def save_image_with_suffix(img_chw: np.ndarray, prefix: str) -> str:
    """PNG save with collision-avoiding suffix (reference :1787-1796)."""
    import os

    arr = tensor_to_image(img_chw)
    pil = Image.fromarray(arr)
    for i in range(100):
        name = f"{prefix}.png" if i == 0 else f"{prefix}_{i}.png"
        if not os.path.exists(name):
            pil.save(name)
            return name
    raise RuntimeError("no free filename")


def smart_resize(height: int, width: int, factor: int = 28, min_pixels: int = 56 * 56, max_pixels: int = 14 * 14 * 4 * 1280):
    """Qwen2-VL-style dynamic resolution (bailingmm_utils.py:94-120): round H/W to
    multiples of `factor` keeping the pixel count within [min_pixels, max_pixels]."""
    import math

    if height < factor or width < factor:
        raise ValueError(f"height:{height} or width:{width} must be larger than factor:{factor}")
    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be smaller than 200")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar
