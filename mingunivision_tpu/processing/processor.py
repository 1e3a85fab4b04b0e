"""BailingMMProcessor equivalent: chat templating, image-token expansion and the
three CFG attention masks.

Parity map against reference mingunivision/processing_bailingmm.py:
  - special tokens / role prefixes:         :40-67
  - understanding (1024px) vs gen (512px):  :175-176, :251-254
  - image_grid_thw = [1, H/ps, W/ps]:       :256-266
  - _expand_image_tokens:                   :445-464
  - tokenize: uncond mask zeros the last HUMAN turn (:301-328), text-uncond mask
    zeros non-image tokens of the last turn (:330-349), found by searching the
    <role>HUMAN</role> / <role>ASSISTANT</role> id subsequences (:292-305)
  - apply_chat_template with role prefixes + <|endoftext|> terminator: :374-437
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from mingunivision_tpu.processing.image_ops import preprocess_generation, preprocess_understanding

DEFAULT_IMAGE_PATCH_TOKEN = "<imagePatch>"
DEFAULT_IM_START_TOKEN = "<image>"
DEFAULT_IM_END_TOKEN = "</image>"
DEFAULT_VID_START_TOKEN = "<video>"
DEFAULT_VID_END_TOKEN = "</video>"
DEFAULT_FRAME_PATCH_TOKEN = "<framePatch>"
PLACEHOLDER_IMAGE_TOKEN_IN_TEXT = "<imageHere>"
USER_PREFIX = "<role>HUMAN</role>"
ASSISTANT_PREFIX = "<role>ASSISTANT</role>"
EOT_TOKEN = "<|endoftext|>"


def find_all_subsequences(sequence: Sequence[int], subsequence: Sequence[int]) -> List[int]:
    positions = []
    n, m = len(sequence), len(subsequence)
    if m == 0:
        return positions
    for i in range(n - m + 1):
        if list(sequence[i : i + m]) == list(subsequence):
            positions.append(i)
    return positions


def build_cfg_masks(
    input_ids: Sequence[int],
    user_prefix_ids: Sequence[int],
    assistant_prefix_ids: Sequence[int],
    image_token_ids: set,
):
    """Build (uncond_mask, text_uncond_mask) for one sequence.

    uncond: zeros the span between the LAST <role>HUMAN</role> tag (exclusive)
    and the next <role>ASSISTANT</role> tag (exclusive).
    text_uncond: in the same span, zeros every token that is NOT an image token.
    """
    seq = list(input_ids)
    user_positions = find_all_subsequences(seq, user_prefix_ids)
    assistant_positions = find_all_subsequences(seq, assistant_prefix_ids)

    mask = [1] * len(seq)
    text_mask = [1] * len(seq)
    if user_positions:
        last_user = user_positions[-1]
        next_assistant = None
        for pos in assistant_positions:
            if pos >= last_user:
                next_assistant = pos
                break
        span_start = last_user + len(user_prefix_ids)
        if next_assistant is not None:
            for i in range(span_start, next_assistant):
                mask[i] = 0
        span_end = next_assistant if next_assistant is not None else len(seq)
        for i in range(span_start, span_end):
            if seq[i] not in image_token_ids:
                text_mask[i] = 0
    return mask, text_mask


@dataclass
class ProcessorOutput:
    input_ids: np.ndarray  # (1, T) int64
    attention_mask: np.ndarray  # (1, T)
    uncond_attention_mask: np.ndarray  # (1, T)
    text_uncond_attention_mask: np.ndarray  # (1, T)
    pixel_values: Optional[np.ndarray] = None  # (B, 3, S, S) fp32
    image_grid_thw: Optional[np.ndarray] = None  # (B, 3)
    pixel_values_videos: Optional[np.ndarray] = None  # (B, T, 3, S, S) fp32
    video_grid_thw: Optional[np.ndarray] = None  # (B, 3)


class BailingMMProcessor:
    """Tokenizer + image preprocessing + CFG-mask construction.

    `tokenizer` needs `encode(text, add_special_tokens=False) -> List[int]` and
    `convert_tokens_to_ids(token) -> int` (HF fast tokenizers qualify).
    """

    def __init__(self, tokenizer, und_image_size: int = 1024, gen_image_size: int = 512):
        self.tokenizer = tokenizer
        self.und_image_size = und_image_size
        self.gen_image_size = gen_image_size
        self.user_prefix_ids = list(tokenizer.encode(USER_PREFIX, add_special_tokens=False))
        self.assistant_prefix_ids = list(tokenizer.encode(ASSISTANT_PREFIX, add_special_tokens=False))
        self.image_start_id = tokenizer.convert_tokens_to_ids(DEFAULT_IM_START_TOKEN)
        self.image_patch_id = tokenizer.convert_tokens_to_ids(DEFAULT_IMAGE_PATCH_TOKEN)
        self.image_end_id = tokenizer.convert_tokens_to_ids(DEFAULT_IM_END_TOKEN)
        self.gen_terminator = [tokenizer.convert_tokens_to_ids(EOT_TOKEN)]

    # -- chat templating ------------------------------------------------------

    def apply_chat_template(self, conversation: List[Dict], add_generation_prompt: bool = True, system_template: Optional[str] = None) -> str:
        text = ""
        for message in conversation:
            assert message["role"] in ("HUMAN", "ASSISTANT"), message["role"]
            if message["role"] == "ASSISTANT":
                text += ASSISTANT_PREFIX
            content = message["content"]
            if isinstance(content, str):
                content = [{"type": "text", "text": content}]
            image_counts = sum(str(c.get("text", "")).count("<image>") for c in content)
            for c in content:
                if c["type"] == "image":
                    num_images = 1 if not isinstance(c["image"], (list, tuple)) else len(c["image"])
                    if image_counts < num_images:
                        text += ("<IMAGE>\n" * (num_images - image_counts)).rstrip("\n")
                elif c["type"] == "text":
                    text += c["text"]
            if message["role"] == "ASSISTANT":
                text += EOT_TOKEN
                text += USER_PREFIX
        if add_generation_prompt:
            text += ASSISTANT_PREFIX
        sys_prompt = system_template if system_template is not None else USER_PREFIX
        return sys_prompt + text

    def process_vision_info(self, conversation: List[Dict]):
        """Collect the images referenced by a conversation, in order."""
        images = []
        for message in conversation:
            content = message["content"]
            if isinstance(content, str):
                continue
            for c in content:
                if c.get("type") == "image":
                    imgs = c["image"] if isinstance(c["image"], (list, tuple)) else [c["image"]]
                    for im in imgs:
                        images.append(self._load_image(im))
        return images or None

    @staticmethod
    def _load_image(im):
        if isinstance(im, str):
            from PIL import Image

            path = im[len("file://") :] if im.startswith("file://") else im
            return Image.open(path).convert("RGB")
        return im

    # -- image token expansion ------------------------------------------------

    def _expand_image_tokens(self, text: List[str], image_grid_thw: np.ndarray, special_token: str = "<IMAGE>") -> List[str]:
        out = []
        image_index = 0
        num_query_tokens = np.prod(image_grid_thw, axis=1)
        for sample in text:
            n = sample.count(special_token)
            for i in range(image_index, image_index + n):
                img_text = (
                    DEFAULT_IM_START_TOKEN
                    + int(num_query_tokens[i]) * DEFAULT_IMAGE_PATCH_TOKEN
                    + DEFAULT_IM_END_TOKEN
                    + "\n"
                )
                sample = sample.replace(special_token, img_text, 1)
            image_index += n
            out.append(sample)
        return out

    def _expand_video_tokens(self, text: List[str], video_grid_thw: np.ndarray, special_token: str = "<VIDEO>") -> List[str]:
        """<VIDEO> -> <video> + (prod(grid) framePatch tokens) + </video>
        (reference _expand_video_tokens :470+)."""
        out = []
        vid_index = 0
        num_tokens = np.prod(video_grid_thw, axis=1)
        for sample in text:
            n = sample.count(special_token)
            for i in range(vid_index, vid_index + n):
                vid_text = (
                    DEFAULT_VID_START_TOKEN
                    + int(num_tokens[i]) * DEFAULT_IMAGE_PATCH_TOKEN
                    + DEFAULT_VID_END_TOKEN
                    + "\n"
                )
                sample = sample.replace(special_token, vid_text, 1)
            vid_index += n
            out.append(sample)
        return out

    # -- main -----------------------------------------------------------------

    def __call__(
        self,
        text: Union[str, List[str]],
        images=None,
        videos=None,
        for_edit: bool = False,
        image_patch_size: int = 32,
    ) -> ProcessorOutput:
        """`videos`: list of (T, H, W, 3) uint8 frame stacks (omni-family path:
        each frame is preprocessed like an understanding image and <VIDEO>
        expands to prod(grid_thw) frame-patch tokens, reference
        _expand_video_tokens + video branch of processing_bailingmm)."""
        if isinstance(text, str):
            text = [text]

        pixel_values = None
        grid = None
        if images is not None:
            pre = preprocess_generation if for_edit else preprocess_understanding
            size = self.gen_image_size if for_edit else self.und_image_size
            processed = [pre(img, size) for img in images]
            pixel_values = np.stack(processed)
            grid = np.array(
                [[1, p.shape[1] // image_patch_size, p.shape[2] // image_patch_size] for p in processed]
            )
            text = self._expand_image_tokens(text, grid)

        pixel_values_videos = None
        video_grid = None
        if videos is not None:
            from PIL import Image

            clips = []
            vgrids = []
            for frames in videos:
                frames = np.asarray(frames)
                proc = [
                    preprocess_understanding(Image.fromarray(f.astype(np.uint8)), self.und_image_size)
                    for f in frames
                ]
                clip = np.stack(proc)  # (T, 3, S, S)
                clips.append(clip)
                vgrids.append(
                    [clip.shape[0], clip.shape[2] // image_patch_size, clip.shape[3] // image_patch_size]
                )
            pixel_values_videos = clips if len(clips) > 1 else clips[0][None]
            video_grid = np.array(vgrids)
            text = self._expand_video_tokens(text, video_grid)

        assert len(text) == 1, "batch size 1 only (parity with the reference path)"
        ids = list(self.tokenizer.encode(text[0], add_special_tokens=False))
        image_token_ids = {self.image_start_id, self.image_patch_id, self.image_end_id}
        uncond, text_uncond = build_cfg_masks(ids, self.user_prefix_ids, self.assistant_prefix_ids, image_token_ids)

        return ProcessorOutput(
            input_ids=np.array([ids], np.int64),
            attention_mask=np.ones((1, len(ids)), np.int64),
            uncond_attention_mask=np.array([uncond], np.int64),
            text_uncond_attention_mask=np.array([text_uncond], np.int64),
            pixel_values=pixel_values,
            image_grid_thw=grid,
            pixel_values_videos=pixel_values_videos,
            video_grid_thw=video_grid,
        )

    def decode(self, token_ids: Sequence[int], skip_special_tokens: bool = False) -> str:
        return self.tokenizer.decode(list(token_ids), skip_special_tokens=skip_special_tokens)
