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


def build_inputs_for_generation(
    input_ids: List[int],
    *,
    eos_token_id: int,
    bos_token_id: int,
    cls_token_id: int,
    gmask_token_id: int,
    add_bos_token: bool = False,
    max_input_length: int = None,
    left_truncate: bool = True,
    max_output_length: int = 1024,
    rotary_type: str = "none",
    unidirectional_attention: bool = True,
    window_size: int = 1024,
):
    """Full GLM-legacy generation-input builder
    (tokenization_bailing.py:322-407 `_build_inputs_for_generation`):
    truncation, left-padding detection, [CLS]/[gMASK] insertion for
    bidirectional prefixes, bos handling, dual-plane position ids and the
    prefix-bidirectional mask matrix.

    Returns {"input_ids": List[int], "position_ids": [pos, block],
    "attention_mask": (T, T) list-of-lists} — framework-free (callers wrap in
    jnp/np as needed).
    """
    import numpy as np

    input_ids = list(input_ids)
    if max_input_length and len(input_ids) > max_input_length:
        input_ids = input_ids[-max_input_length:] if left_truncate else input_ids[:max_input_length]

    is_left_padding = input_ids[0] == eos_token_id
    if not unidirectional_attention:
        if input_ids[0] != cls_token_id:
            input_ids = [cls_token_id] + input_ids
        if gmask_token_id not in set(input_ids):
            input_ids = input_ids + [gmask_token_id]
        mask_pos = input_ids.index(gmask_token_id)
        sep = len(input_ids)
    else:
        if add_bos_token:
            input_ids = input_ids + [bos_token_id]
            mask_pos = (input_ids.index(eos_token_id) - 1) if eos_token_id in input_ids else len(input_ids) - 1
            sep = len(input_ids) - 1
        else:
            sep = len(input_ids)
            if eos_token_id in input_ids:
                if is_left_padding:
                    rev = input_ids[::-1]
                    mask_pos = max(0, rev.index(eos_token_id) - 1)
                    mask_pos = sep - 1 - mask_pos  # first non-eos token
                else:
                    mask_pos = max(0, input_ids.index(eos_token_id) - 1)
            else:
                mask_pos = len(input_ids) - 1

    position_ids = build_glm_position_ids(mask_pos, sep, max_output_length, rotary_type, window_size)
    if is_left_padding:
        position_ids[0] = [max(0, i - mask_pos) for i in range(len(position_ids[0]))]

    total_length = sep + max_output_length + (1 if add_bos_token else 0)
    sep_eff = sep + 1 if add_bos_token else sep

    if unidirectional_attention:
        attn = np.tril(np.ones((total_length, total_length), np.int64))
        if is_left_padding:
            attn[:, :mask_pos] = 0
        else:
            attn[:, mask_pos + 1 : sep_eff] = 0
    else:
        attn = np.zeros((total_length, total_length), np.int64)
        attn[:, : mask_pos + 1] = 1
        for i in range(sep_eff, total_length):
            attn[i, sep_eff : i + 1] = 1

    return {
        "input_ids": input_ids,
        "position_ids": position_ids,
        "attention_mask": attn.tolist(),
    }
