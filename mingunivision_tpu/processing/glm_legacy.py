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


def build_inputs_for_train(
    encode,  # callable: str -> List[int]
    inputs,
    outputs,
    *,
    eos_token_id: int,
    pad_token_id: int,
    sop_token_id: int,
    cls_token_id: int,
    gmask_token_id: int,
    add_bos_token: bool = False,
    new_conversation_offset=None,
    max_length: int = 2048,
    rotary_type: str = "1d",
    left_truncate: bool = True,
    unidirectional_attention: bool = True,
    isolation_position_ids: bool = False,
    padding: bool = True,
    use_fa2: bool = True,
    use_packed: bool = True,
):
    """GLM-legacy TRAINING-input builder (tokenization_bailing.py:492-741
    `_build_inputs_for_train`): multi-sample packing with the reference's
    truncation policy, -100-masked labels, dual-plane position ids and the
    fa2/full attention-mask variants. Framework-free (numpy lists).
    """
    import numpy as np

    if isinstance(inputs, str):
        inputs = [inputs]
    if isinstance(outputs, str):
        outputs = [outputs]
    assert len(inputs) == len(outputs)

    input_ids = [list(encode(item.replace("\\n", "\n"))) for item in inputs]
    output_ids = [list(encode(item.replace("\\n", "\n"))) for item in outputs]

    packed_input_ids = []
    packed_output_ids = []
    current_len = 0
    for idx, (inp, out) in enumerate(zip(input_ids, output_ids)):
        if not unidirectional_attention:
            first = idx == 0 or not new_conversation_offset or idx in (new_conversation_offset or [])
            num_special = 2 if first else 1
        else:
            num_special = 2 if add_bos_token else 1

        truncated = False
        if len(inp) + len(out) + current_len > max_length - num_special:
            left_len = max_length - num_special - current_len
            if len(inp) > left_len // 2 and len(out) > left_len // 2:
                # reference quirk (tokenization_bailing.py:562): `input[-left_len // 2:]`
                # parses as (-left_len)//2 — floor of the NEGATIVE, i.e. one more
                # token than left_len//2 for odd left_len
                inp = inp[(-left_len) // 2 :] if left_truncate else inp[: left_len // 2]
                out = out[: left_len // 2]
            elif len(inp) >= len(out):
                inp = inp[-(left_len - len(out)) :] if left_truncate else inp[: left_len - len(out)]
            else:
                out = out[: left_len - len(inp)]
            truncated = True

        if unidirectional_attention:
            packed_input_ids.append(list(inp))
        elif num_special == 4:  # reference quirk: this branch never fires (num_special is 1/2)
            packed_input_ids.append([cls_token_id] + list(inp) + [gmask_token_id])
        else:
            packed_input_ids.append(list(inp) + [gmask_token_id])
        packed_output_ids.append(list(out) + [eos_token_id])
        current_len += len(inp) + len(out) + num_special
        if truncated:
            break

    if use_packed:
        tokens = []
        attn_sizes = []
        input_lengths = []
        pos_lists = []
        block_lists = []
        for inp, out in zip(packed_input_ids, packed_output_ids):
            if add_bos_token:
                data = inp + [sop_token_id] + out
                mask_pos = len(inp) - 1
            else:
                data = inp + out
                mask_pos = len(inp) - 2
            tokens += data
            attn_sizes.append(len(data))
            input_lengths.append(len(inp))
            pos, block = build_glm_position_ids(mask_pos, mask_pos + 1, len(out), rotary_type)
            pos_lists.append(pos)
            block_lists.append(block)

        labels = []
        for i in range(len(packed_input_ids)):
            head = len(packed_input_ids[i]) if add_bos_token else len(packed_input_ids[i]) - 1
            labels += [-100] * head + packed_output_ids[i] + [-100]

        if use_fa2:
            pack_attention_mask = -1 * np.ones((2, current_len))
        else:
            pack_attention_mask = np.tril(np.ones((current_len, current_len)))
        pack_pos = []
        pack_block = []
        total_len = 0
        max_index = 0
        for i, size in enumerate(attn_sizes):
            if use_fa2:
                pack_attention_mask[0][i] = total_len
                pack_attention_mask[1][i] = total_len + input_lengths[i]
            else:
                sep = 0 if unidirectional_attention else input_lengths[i]
                block_mask = np.tril(np.ones((size, size)))
                block_mask[:, :sep] = 1
                pack_attention_mask[total_len : total_len + size, total_len : total_len + size] = block_mask
            pack_pos.extend([p + max_index for p in pos_lists[i]])
            pack_block.extend(block_lists[i])
            if not isolation_position_ids:
                max_index = pack_pos[-1] + 1
            total_len += size
        position_ids = [pack_pos, pack_block]
        attention_mask = pack_attention_mask
    else:
        inp, out = packed_input_ids[0], packed_output_ids[0]
        if add_bos_token:
            tokens = inp + [sop_token_id] + out
            labels = [-100] * len(inp) + out + [-100]
            position_ids = build_glm_position_ids(len(inp) - 1, len(inp), len(out), rotary_type)
        else:
            tokens = inp + out
            labels = [-100] * (len(inp) - 1) + out + [-100]
            position_ids = build_glm_position_ids(len(inp) - 2, len(inp) - 1, len(out), rotary_type)
        attention_mask = len(inp)

    assert len(tokens) == current_len

    if max_length > 0 and len(tokens) < max_length and padding:
        pad = max_length - len(tokens)
        tokens += [pad_token_id] * pad
        labels.extend([-100] * pad)
        position_ids[0] = list(position_ids[0]) + [0] * pad
        position_ids[1] = list(position_ids[1]) + [0] * pad
        if use_packed:
            if use_fa2:
                new_mask = -1 * np.ones((2, max_length))
                new_mask[:, :current_len] = attention_mask
            else:
                new_mask = np.tril(np.ones((max_length, max_length)))
                new_mask[:current_len, :current_len] = attention_mask
            attention_mask = new_mask

    if use_packed and use_fa2 and unidirectional_attention:
        attention_mask = 0  # fa2 path carries no mask (reference :726-728)

    return {
        "input_ids": tokens,
        "position_ids": [list(position_ids[0]), list(position_ids[1])],
        "attention_mask": attention_mask,
        "labels": labels,
    }
