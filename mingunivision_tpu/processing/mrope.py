"""3-D MRoPE position planes for multimodal sequences.

Analog of the vLLM patch's `_bailing_3drope_get_input_positions_tensor`
(vllm/ming_lite.patch:204-416): text tokens advance all three (t, h, w) planes
together; an image's patch tokens share one temporal index and enumerate the
(h, w) grid; video frames advance t per frame. After each vision segment the
scalar position resumes from max+1.

The HF Ming-UniVision path drives all-equal planes (flat positions) — which our
engine uses by default — but the 3-D builder is required for vLLM-parity
serving and for video inputs.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def build_mrope_positions(
    input_ids: Sequence[int],
    *,
    image_patch_token: int,
    video_start_token: Optional[int] = None,
    image_grids: Optional[List[Tuple[int, int, int]]] = None,  # (t, h, w) per image, in order
    start: int = 0,
) -> np.ndarray:
    """Returns (3, T) int32 position planes.

    image_grids supplies (t, h, w) for each contiguous run of image-patch
    tokens, in order of appearance; each run's length must equal t*h*w.
    """
    ids = list(input_ids)
    T = len(ids)
    out = np.zeros((3, T), np.int32)
    pos = start
    img_idx = 0
    i = 0
    while i < T:
        if ids[i] == image_patch_token:
            # find the contiguous run
            j = i
            while j < T and ids[j] == image_patch_token:
                j += 1
            run = j - i
            if image_grids is not None and img_idx < len(image_grids):
                t, h, w = image_grids[img_idx]
            else:
                # assume square single-frame grid
                side = int(round(run ** 0.5))
                t, h, w = 1, side, max(1, run // max(side, 1))
            img_idx += 1
            assert t * h * w == run, f"grid {t}x{h}x{w} != run {run}"
            tt = np.repeat(np.arange(t), h * w)
            hh = np.tile(np.repeat(np.arange(h), w), t)
            ww = np.tile(np.arange(w), t * h)
            out[0, i:j] = pos + tt
            out[1, i:j] = pos + hh
            out[2, i:j] = pos + ww
            pos = int(out[:, i:j].max()) + 1
            i = j
        else:
            out[:, i] = pos
            pos += 1
            i += 1
    return out


def mrope_position_delta(positions: np.ndarray, seq_len: int) -> int:
    """rope_deltas equivalent (reference prepare_inputs :2048-2059): the offset
    by which plain text positions continue after the multimodal prompt."""
    return int(positions.max()) + 1 - seq_len
