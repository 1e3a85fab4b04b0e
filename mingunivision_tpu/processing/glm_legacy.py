"""GLM-heritage 2-D position-id builders (legacy surface of BailingTokenizer).

Capability analog of tokenization_bailing.py:279-:320 (`_build_position_ids`):
the Bailing tokenizer inherits GLM's dual-plane positions — a token plane plus a
"block" plane counting generated positions after the [gMASK] — with 1d / 2d /
windowed variants. The UniVision runtime path never uses them (flat RoPE); they
are provided for checkpoint families that do.
"""

from __future__ import annotations

from typing import List


def build_glm_position_ids(
    mask_pos: int,
    bos_pos: int,
    max_output_length: int,
    rotary_type: str = "none",
    window_size: int = 1024,
) -> List[List[int]]:
    """Returns [position_ids, block_position_ids], each of length
    bos_pos + max_output_length + 1.

    - "1d":  positions continue linearly after the mask; block plane counts
      generated offsets 1..n.
    - "2d":  all generated positions pin to mask_pos; block plane counts 1..n
      (classic GLM decoding).
    - else:  windowed positions that wrap every `window_size - 1` tokens.
    """
    w = window_size - 1
    block = [0] * bos_pos
    if "1d" in rotary_type:
        pos = list(range(bos_pos)) + list(range(mask_pos + 1, mask_pos + max_output_length + 2))
        block = block + list(range(1, max_output_length + 2))
    elif "2d" in rotary_type:
        pos = list(range(bos_pos)) + [mask_pos] * (1 + max_output_length)
        block = block + list(range(1, max_output_length + 2))
    else:
        pos = []
        repeat = bos_pos // w
        for _ in range(repeat):
            pos += list(range(w))
        pos += list(range(bos_pos - w * repeat))
        anchor = pos[-1]
        pos += [anchor] * (max_output_length + 1)
        block_repeat = max_output_length // (w - 1)
        extra: List[int] = []
        for _ in range(block_repeat):
            extra += list(range(1, w))
        extra += list(range(1, max_output_length + 2 - (w - 1) * block_repeat))
        block = block + extra
    return [pos, block]


def build_glm_attention_mask(seq_len: int, sep: int) -> List[List[int]]:
    """GLM mask matrix: bidirectional over the prefix [0, sep), causal after."""
    mask = [[0] * seq_len for _ in range(seq_len)]
    for i in range(seq_len):
        for j in range(seq_len):
            if j < sep or j <= i:
                mask[i][j] = 1
    return mask
