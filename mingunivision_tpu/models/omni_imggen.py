"""Omni-family query-token image generation surface.

The reference's vLLM omni model (vllm/ming_lite.patch:1511-1527, :1687-1745,
:1939-1990) serves a DIFFUSION-decoder image-gen path that is structurally
different from the MingTok AR loop: the prompt is extended with three runs of
image-patch tokens at scales 4/8/16 (16 + 64 + 256 positions, each bracketed by
start/end tokens), LEARNABLE L2-normalized query-token embeddings are scattered
into those positions, MRoPE treats each run as a [1, 2, 2*s^2] grid, and the
LLM's final hidden states at the query positions condition an external
diffusion decoder (the decoder itself ships as a separate checkpoint; our SDK
exposes the pluggable slot — sdk/ming.MingImg).

TPU-first: the sequence assembly is host-side numpy (it happens once per
request, shapes become static before jit); the forward is one `bailing_forward`
prefill over the extended sequence; the gather of gen-position hiddens is a
static `jnp.take`.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

IMG_GEN_SCALES = (4, 8, 16)  # reference :1515


def init_query_tokens(key, hidden_size: int, scales: Sequence[int] = IMG_GEN_SCALES, dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Learnable per-scale query tokens, L2-normalized rows (reference
    :1519-1521 normalizes at init; the checkpoint overwrite keeps unit-ish
    norm). Keys follow the checkpoint naming: '4x4', '8x8', '16x16'."""
    out = {}
    for i, s in enumerate(scales):
        k = jax.random.fold_in(key, i)
        q = jax.random.normal(k, (s * s, hidden_size), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        out[f"{s}x{s}"] = q.astype(dtype)
    return out


def query_tokens_from_torch(state_dict, scales: Sequence[int] = IMG_GEN_SCALES, dtype=jnp.float32):
    """Converter for the auxiliary `mlp/model.safetensors` entries
    `query_tokens_dict.{s}x{s}` (reference :1512-1527)."""
    out = {}
    for s in scales:
        t = state_dict[f"query_tokens_dict.{s}x{s}"]
        out[f"{s}x{s}"] = jnp.asarray(np.asarray(t, np.float32), dtype)
    return out


def append_multiscale_gen_tokens(
    input_ids: np.ndarray,
    scales: Sequence[int],
    start_token_id: int,
    end_token_id: int,
    patch_token_id: int,
    strip_tail: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Extend a prompt with per-scale query-token runs.

    Reference append_input_ids_with_multiscale_learnable_tokens (:1687-1745):
    right-padding (and, in EDIT/T2I modes, a fixed template tail) is stripped,
    then for every scale `[start, patch*s^2, end]` is appended. Returns
    (ids (1, T'), gen_mask (1, T') bool) — gen_mask marks the PATCH positions
    (the query-token slots whose hidden states condition the decoder).
    """
    ids = np.asarray(input_ids).reshape(-1)
    # strip right zero-padding (reference computes first_padding_ind via flip/argmax)
    nz = np.nonzero(ids > 0)[0]
    end = int(nz[-1]) + 1 if nz.size else 0
    ids = ids[: max(0, end - strip_tail)]
    parts = [ids]
    mask_parts = [np.zeros_like(ids, bool)]
    for s in scales:
        parts.append(np.asarray([start_token_id] + [patch_token_id] * (s * s) + [end_token_id], ids.dtype))
        m = np.zeros((s * s + 2,), bool)
        m[1:-1] = True
        mask_parts.append(m)
    out = np.concatenate(parts)[None]
    gen_mask = np.concatenate(mask_parts)[None]
    return out, gen_mask


def multiscale_grid_thw(scales: Sequence[int]) -> np.ndarray:
    """MRoPE grid rows for the appended runs: [1, 2, 2*s^2] per scale
    (reference :1963-1967 — a 2 x (2s^2) 'image' whose t*h*w/4 == s^2 merged
    positions, matching the s^2 patch tokens)."""
    return np.asarray([[1, 2, 2 * s * s] for s in scales], np.int64)


def scatter_query_tokens(inputs_embeds, input_ids, query_tokens: Dict[str, jax.Array], patch_token_id: int, image_embeds=None):
    """Place [image features (EDIT mode);] concatenated per-scale query tokens
    at the patch-token positions (reference :1950-1960: T2I uses the query
    tokens alone; EDIT prepends the source image's features)."""
    from mingunivision_tpu.engine.generate import scatter_image_embeds

    qs = jnp.concatenate([query_tokens[k] for k in sorted(query_tokens, key=lambda n: int(n.split("x")[0]))], axis=0)
    if image_embeds is not None:
        qs = jnp.concatenate([image_embeds.astype(qs.dtype), qs], axis=0)
    return scatter_image_embeds(inputs_embeds, input_ids, qs, patch_token_id)


def omni_gen_hidden(
    params,
    llm_cfg,
    input_ids: np.ndarray,
    query_tokens: Dict[str, jax.Array],
    *,
    scales: Sequence[int] = IMG_GEN_SCALES,
    image_embeds=None,
    image_grids: Optional[List[Tuple[int, int, int]]] = None,  # EDIT: source-image merged grids, in order
    dtype=jnp.bfloat16,
):
    """Assemble the query-token sequence, run ONE prefill, return the hidden
    states at the query positions — the diffusion-decoder conditioning
    (reference forward under IMAGE_GEN_MODE, :1939-1990). Returns
    (hidden (N_gen, h), gen_mask (1, T'))."""
    from mingunivision_tpu.models.bailing_moe import LLMCache, bailing_forward, embed_tokens
    from mingunivision_tpu.processing.mrope import build_mrope_positions

    start_tok = llm_cfg.image_patch_token + 1
    end_tok = llm_cfg.image_patch_token + 2
    ids, gen_mask = append_multiscale_gen_tokens(
        input_ids, scales, start_tok, end_tok, llm_cfg.image_patch_token
    )
    # grid [1, 2, 2*s^2] at spatial-merge 2 => merged (1, 1, s^2) per run;
    # in EDIT mode the prompt's source-image runs come first (reference
    # concatenates grid_thw with the new rows, :1968-1972)
    merged = list(image_grids or []) + [
        (int(t), int(h) // 2, int(w) // 2) for t, h, w in multiscale_grid_thw(scales)
    ]
    positions = build_mrope_positions(
        ids.reshape(-1).tolist(), image_patch_token=llm_cfg.image_patch_token, image_grids=merged
    )[:, None, :]  # (3, 1, T)
    T = ids.shape[1]
    embeds = embed_tokens(params, jnp.asarray(ids)).astype(dtype)
    embeds, _ = scatter_query_tokens(embeds, jnp.asarray(ids), query_tokens, llm_cfg.image_patch_token, image_embeds)
    cache = LLMCache.create(llm_cfg, 1, T, dtype)
    mask = jnp.ones((1, T), bool)
    hidden, _ = bailing_forward(
        params, llm_cfg, embeds, cache, mask, positions=jnp.asarray(positions), image_mask=jnp.asarray(gen_mask)
    )
    gen_idx = jnp.asarray(np.nonzero(gen_mask.reshape(-1))[0])
    return jnp.take(hidden[0], gen_idx, axis=0), gen_mask
