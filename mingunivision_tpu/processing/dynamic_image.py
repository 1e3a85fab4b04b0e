"""Qwen2-VL-style dynamic-resolution image processor (omni/vLLM path).

Capability analog of reference image_processing_bailingmm.py (BailingMMImageProcessor,
:124-315): smart_resize to factor-28 grids within pixel bounds, rescale+normalize,
temporal tiling x2, and patchification into flat (T*H*W, C*t*p*p) rows + grid_thw.
The UniVision HF path uses the MingTok square/center-crop processors instead
(processing/image_ops.py); this processor serves the omni checkpoint family.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from mingunivision_tpu.processing.image_ops import _to_pil, smart_resize

OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass
class DynamicImageProcessorConfig:
    patch_size: int = 14
    merge_size: int = 2
    temporal_patch_size: int = 2
    min_pixels: int = 56 * 56
    max_pixels: int = 14 * 14 * 4 * 1280
    mean: Tuple[float, float, float] = OPENAI_CLIP_MEAN
    std: Tuple[float, float, float] = OPENAI_CLIP_STD


class DynamicImageProcessor:
    def __init__(self, config: Optional[DynamicImageProcessorConfig] = None):
        self.config = config or DynamicImageProcessorConfig()

    def _prepare_frame(self, img) -> np.ndarray:
        from PIL import Image

        cfg = self.config
        pil = _to_pil(img).convert("RGB")
        w, h = pil.size
        factor = cfg.patch_size * cfg.merge_size
        h2, w2 = smart_resize(h, w, factor=factor, min_pixels=cfg.min_pixels, max_pixels=cfg.max_pixels)
        pil = pil.resize((w2, h2), Image.BICUBIC)
        x = np.asarray(pil, np.float32) / 255.0
        x = (x - np.asarray(cfg.mean)) / np.asarray(cfg.std)
        return np.transpose(x, (2, 0, 1))  # (3, H, W)

    def __call__(self, images=None, videos=None):
        """images: list of PIL/arrays -> dict(pixel_values (N, C*t*p*p), image_grid_thw (B, 3)).

        Each image is temporally tiled x2 (image_processing_bailingmm.py:291-300)
        and flattened into per-patch rows matching the Qwen2-VL layout.
        """
        cfg = self.config
        if images is not None:
            frames = [self._prepare_frame(im)[None] for im in images]  # each (1, 3, H, W)
        else:
            frames = [np.stack([self._prepare_frame(f) for f in vid]) for vid in (videos or [])]

        rows_all, grids = [], []
        for clip in frames:
            T, C, H, W = clip.shape
            tps, p = cfg.temporal_patch_size, cfg.patch_size
            if T % tps:
                clip = np.concatenate([clip, np.repeat(clip[-1:], tps - T % tps, axis=0)], axis=0)
                T = clip.shape[0]
            gt, gh, gw = T // tps, H // p, W // p
            x = clip.reshape(gt, tps, C, gh, p, gw, p)
            x = np.transpose(x, (0, 3, 5, 2, 1, 4, 6))  # (gt, gh, gw, C, tps, p, p)
            rows_all.append(x.reshape(gt * gh * gw, C * tps * p * p))
            grids.append((gt, gh, gw))
        key = "pixel_values" if images is not None else "pixel_values_videos"
        gkey = "image_grid_thw" if images is not None else "video_grid_thw"
        return {key: np.concatenate(rows_all, axis=0), gkey: np.asarray(grids, np.int64)}


# Aspect-ratio bucketing for 512px generation (bailingmm_utils.py:541-597)
ASPECT_RATIO_512 = {
    "0.25": (256, 1024),
    "0.33": (288, 864),
    "0.4": (320, 800),
    "0.5": (352, 704),
    "0.67": (384, 576),
    "0.75": (432, 576),
    "0.82": (432, 528),
    "1.0": (512, 512),
    "1.21": (528, 432),
    "1.33": (576, 432),
    "1.5": (576, 384),
    "2.0": (704, 352),
    "2.5": (800, 320),
    "3.0": (864, 288),
    "4.0": (1024, 256),
}


def process_ratio(height: int, width: int, ratios=None) -> Tuple[int, int]:
    """Snap an input aspect ratio to the closest generation bucket."""
    ratios = ratios or ASPECT_RATIO_512
    r = height / width
    best = min(ratios.keys(), key=lambda k: abs(float(k) - r))
    return ratios[best]
