"""Media fetching & video/audio loading utilities.

Capability analog of reference bailingmm_utils.py: `fetch_image` (url/base64/
file, :122-164), video readers + frame samplers (:166-305; decord/torchvision in
the reference — here an ffmpeg-subprocess backend when available, with a raw
numpy `.npy`-clip fallback), `fetch_audio` (:451; stdlib `wave`), and the
message walker `process_vision_info` (:503-539).

This environment is zero-egress and has no ffmpeg/decord — every loader degrades
explicitly rather than silently (the backend-select mirror of
FORCE_BAILINGNATIVE_VIDEO_READER is a constructor argument, not an env var).
"""

from __future__ import annotations

import base64
import io
import os
import shutil
import subprocess
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Images
# ---------------------------------------------------------------------------


def fetch_image(image):
    """str (file path / file:// / data: / http(s) / base64) or PIL -> PIL RGB."""
    from PIL import Image

    if not isinstance(image, str):
        return _ensure_pil(image)
    if image.startswith("data:"):
        payload = image.split(",", 1)[-1]
        return Image.open(io.BytesIO(base64.b64decode(payload))).convert("RGB")
    if image.startswith("file://"):
        return Image.open(image[len("file://") :]).convert("RGB")
    if image.startswith(("http://", "https://")):
        import urllib.request

        with urllib.request.urlopen(image, timeout=30) as r:
            return Image.open(io.BytesIO(r.read())).convert("RGB")
    if os.path.exists(image):
        return Image.open(image).convert("RGB")
    # last resort: raw base64 without a data: prefix
    try:
        return Image.open(io.BytesIO(base64.b64decode(image))).convert("RGB")
    except Exception as e:  # noqa: BLE001
        raise FileNotFoundError(f"cannot fetch image from {image[:64]!r}") from e


def _ensure_pil(img):
    from PIL import Image

    if isinstance(img, Image.Image):
        return img.convert("RGB")
    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[0] < arr.shape[-1]:
        arr = np.transpose(arr, (1, 2, 0))
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    return Image.fromarray(arr).convert("RGB")


# ---------------------------------------------------------------------------
# Video
# ---------------------------------------------------------------------------


def sample_frame_indices(total: int, num_frames: int) -> np.ndarray:
    """Uniform frame sampler (reference uniform sampling, bailingmm_utils.py:186-200)."""
    if total <= num_frames:
        return np.arange(total)
    return np.linspace(0, total - 1, num_frames).round().astype(np.int64)


def sample_fps_indices(total: int, native_fps: float, target_fps: float, max_frames: int) -> np.ndarray:
    """FPS-based sampler: pick ~target_fps frames/sec up to max_frames."""
    duration = total / max(native_fps, 1e-6)
    n = min(max_frames, max(1, int(duration * target_fps)))
    return sample_frame_indices(total, n)


class VideoReader:
    """Video -> (num_frames, H, W, 3) uint8.

    Backends: "ffmpeg" (subprocess rawvideo pipe), "npy" (pre-extracted numpy
    clip, shape (T, H, W, 3)). decord is CUDA/C++-only upstream; ffmpeg is the
    native-tool equivalent here.
    """

    def __init__(self, backend: Optional[str] = None):
        if backend is None:
            backend = "ffmpeg" if shutil.which("ffmpeg") else "npy"
        self.backend = backend

    def probe(self, path: str) -> Tuple[int, float, int, int]:
        """-> (num_frames, fps, width, height)."""
        if self.backend == "npy":
            arr = np.load(path, mmap_mode="r")
            return arr.shape[0], 25.0, arr.shape[2], arr.shape[1]
        out = subprocess.run(
            [
                "ffprobe",
                "-v",
                "error",
                "-select_streams",
                "v:0",
                "-count_frames",
                "-show_entries",
                "stream=nb_read_frames,r_frame_rate,width,height",
                "-of",
                "csv=p=0",
                path,
            ],
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip().split(",")
        w, h = int(out[0]), int(out[1])
        num, den = out[2].split("/")
        fps = float(num) / float(den)
        frames = int(out[3])
        return frames, fps, w, h

    def read_frames(self, path: str, indices: Sequence[int]) -> np.ndarray:
        if self.backend == "npy":
            arr = np.load(path, mmap_mode="r")
            return np.asarray(arr[np.asarray(indices)])
        frames, fps, w, h = self.probe(path)
        sel = "+".join(f"eq(n\\,{int(i)})" for i in indices)
        raw = subprocess.run(
            [
                "ffmpeg",
                "-v",
                "error",
                "-i",
                path,
                "-vf",
                f"select='{sel}'",
                "-vsync",
                "0",
                "-f",
                "rawvideo",
                "-pix_fmt",
                "rgb24",
                "-",
            ],
            capture_output=True,
            check=True,
        ).stdout
        n = len(raw) // (w * h * 3)
        return np.frombuffer(raw, np.uint8)[: n * w * h * 3].reshape(n, h, w, 3)

    def load(self, path: str, num_frames: int = 8, sample: str = "uniform", query: Optional[str] = None, scorer=None) -> np.ndarray:
        total, fps, _, _ = self.probe(path)
        idx = sample_frame_indices(total, num_frames)
        if sample == "adaptive" and len(idx) > 64:
            frames = self.read_frames(path, idx)
            rows = adaptive_frame_rows(frames, num_frames, query=query, scorer=scorer)
            return frames[rows]
        return self.read_frames(path, idx)


# ---------------------------------------------------------------------------
# Audio
# ---------------------------------------------------------------------------


def fetch_audio(path: str, target_sr: Optional[int] = 16000) -> Tuple[np.ndarray, int]:
    """WAV file -> (float32 mono samples in [-1, 1], sample_rate); linear
    resampling to target_sr when requested (reference fetch_audio :451)."""
    import wave as wavmod

    with wavmod.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    dtype = {1: np.int8, 2: np.int16, 4: np.int32}[width]
    x = np.frombuffer(raw, dtype).astype(np.float32) / float(2 ** (8 * width - 1))
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    if target_sr and target_sr != sr:
        t_new = np.linspace(0, len(x) - 1, int(len(x) * target_sr / sr))
        x = np.interp(t_new, np.arange(len(x)), x).astype(np.float32)
        sr = target_sr
    return x, sr


def save_wav(path: str, samples: np.ndarray, sr: int = 22050) -> None:
    import wave as wavmod

    x = np.clip(np.asarray(samples, np.float32), -1, 1)
    with wavmod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype(np.int16).tobytes())


# ---------------------------------------------------------------------------
# Message walker (process_vision_info, reference :503-539)
# ---------------------------------------------------------------------------


def process_vision_info(conversations: List[dict], num_video_frames: int = 8):
    """Walk messages, fetch every image / video clip in order.

    Returns (images or None, video_clips or None)."""
    images, videos = [], []
    reader = None
    for message in conversations:
        content = message.get("content")
        if not isinstance(content, list):
            continue
        for c in content:
            if c.get("type") == "image":
                items = c["image"] if isinstance(c["image"], (list, tuple)) else [c["image"]]
                images.extend(fetch_image(im) for im in items)
            elif c.get("type") == "video":
                if reader is None:
                    reader = VideoReader()
                videos.append(reader.load(c["video"], num_frames=num_video_frames))
    return (images or None), (videos or None)


def adaptive_frame_rows(frames: np.ndarray, num_frames: int, query: Optional[str] = None, scorer=None) -> np.ndarray:
    """LongVU-style adaptive merge over an already-read uniform batch
    (reference bailingmm_utils.py:290-299): keep HALF the uniform grid
    (linspace downsample), fill the freed budget with the top query-relevant
    frames (select_frames_by_relevance ranking), return the SORTED union as
    row indices into `frames`."""
    T = frames.shape[0]
    half = np.linspace(0, T - 1, max(1, T // 2), dtype=int)
    budget = max(0, num_frames - len(half))
    if budget == 0:
        return half
    if scorer is not None:
        scores = np.asarray(scorer(frames, query), np.float64)
    else:
        f = frames.astype(np.float32) / 255.0
        diff = np.abs(np.diff(f, axis=0)).mean(axis=(1, 2, 3))
        scores = np.concatenate([[diff[0] if len(diff) else 1.0], diff])
    ranked = [int(i) for i in np.argsort(-scores) if int(i) not in set(half.tolist())]
    return np.sort(np.concatenate([half, np.asarray(ranked[:budget], int)])).astype(int)


def select_frames_by_relevance(frames: np.ndarray, num_keep: int, query: Optional[str] = None, scorer=None) -> np.ndarray:
    """Query-adaptive frame selection (reference bailingmm_utils.py:307-360
    `select_frames_based_on_query`, which delegates to an EXTERNAL LongVU
    cross-modal model that is not shipped — "can also be replaced with other
    text/visual encoders").

    `scorer(frames, query) -> (T,) relevance scores` plugs any cross-modal
    model in; the built-in fallback scores content CHANGE (mean abs frame
    difference) so static stretches collapse and visually distinct moments
    survive — query-agnostic but checkpoint-free.

    frames: (T, H, W, 3) uint8. Returns sorted indices of the kept frames.
    """
    T = frames.shape[0]
    if num_keep >= T:
        return np.arange(T)
    if scorer is not None:
        scores = np.asarray(scorer(frames, query), np.float64)
    else:
        f = frames.astype(np.float32) / 255.0
        diff = np.abs(np.diff(f, axis=0)).mean(axis=(1, 2, 3))
        scores = np.concatenate([[diff[0] if len(diff) else 1.0], diff])
    # always keep the first frame; then highest-relevance others
    order = np.argsort(-scores)
    keep = [0]
    for i in order:
        if len(keep) >= num_keep:
            break
        if i not in keep:
            keep.append(int(i))
    return np.sort(np.asarray(keep))
