"""Host-side multi-round session: the stateful orchestration around the jitted
decode loops.

Replaces the reference's wrapper state (modeling_bailingmm.py:206-308): persisted
KV cache + three persisted attention-mask buffers with PAST_MODE KEEP/DROP
semantics — but with fixed-size device buffers (no concats that grow shapes and
trigger recompiles) and an explicit prompt-length bucket for prefill.

Key invariant preserved (SURVEY §3.4): multi-round editing never round-trips
through pixels — the LLM context holds semantic tokens; pixels are decoded only
for the user-visible image.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mingunivision_tpu.config import GenerationConfig, ImageGenConfig, MingUniVisionConfig, RuntimeConfig
from mingunivision_tpu.engine.generate import (
    decode_text,
    generate_image_tokens,
    linear_proj_apply,
    pixel_decode,
    prefill,
    scatter_image_embeds,
)
from mingunivision_tpu.engine.sampler import sample_token
from mingunivision_tpu.models.bailing_moe import LLMCache, embed_tokens
from mingunivision_tpu.models.mingtok import mingtok_encode


PROMPT_BUCKET = 128  # prompts are right-padded to multiples of this for prefill


def _bucket(n: int) -> int:
    return max(PROMPT_BUCKET, ((n + PROMPT_BUCKET - 1) // PROMPT_BUCKET) * PROMPT_BUCKET)


@dataclasses.dataclass
class RoundOutput:
    token_ids: List[int]
    images: List[np.ndarray]  # each (3, H, W) fp32 in [-1, 1]


class MingUniVisionSession:
    """One conversation: owns the KV cache and persisted masks across rounds."""

    def __init__(self, params, cfg: MingUniVisionConfig, runtime: RuntimeConfig, seed: int = 0, mesh=None):
        """`mesh`: optional jax.sharding.Mesh. Params are expected to be placed
        already (api.py does `shard_mm_params`); the session then creates its KV
        cache sharded (kv-heads over `model`) so the 16B model serves on v5e-8
        — the analog of the reference's vLLM TP inference (patch :468-661)."""
        self.params = params
        self.cfg = cfg
        self.runtime = runtime
        self.mesh = mesh
        self.key = jax.random.PRNGKey(seed)
        self._dtype = jnp.bfloat16 if runtime.compute_dtype == "bfloat16" else jnp.float32
        self.reset_inner_state()

    # -- state ---------------------------------------------------------------

    def reset_inner_state(self):
        S = self.runtime.max_seq_len
        self.cache: Optional[LLMCache] = None
        self.mask = jnp.zeros((1, S), bool)
        self.uncond_mask = jnp.zeros((1, S), bool)
        self.text_uncond_mask = jnp.zeros((1, S), bool)
        self.seq_len = 0  # host mirror of cache.length

    def _ensure_cache(self):
        if self.cache is None:
            self.cache = LLMCache.create(self.cfg.llm, 1, self.runtime.max_seq_len, self._dtype)
            if self.mesh is not None:
                from mingunivision_tpu.parallel.sharding import shard_cache

                self.cache = shard_cache(self.cache, self.mesh)

    # -- vision --------------------------------------------------------------

    def extract_image_features(self, pixel_values):
        """pixel_values (B, 3, H, W) -> flattened (B*N, hidden) projected features.

        Parity: modeling_bailingmm.py:131-138 — MingTok forward (bf16) ->
        x_norm_patchtokens -> fp32 -> linear_proj.
        """
        feats = mingtok_encode(self.params["mingtok"], self.cfg.mingtok, jnp.asarray(pixel_values), compute_dtype=self._dtype)
        x = feats["x_norm_patchtokens"].astype(jnp.float32)
        proj = linear_proj_apply(self.params["linear_proj"], x)
        return proj.reshape(-1, proj.shape[-1])

    # -- main entry ----------------------------------------------------------

    def generate(
        self,
        input_ids: np.ndarray,  # (1, T) — tokens for the NEW turn only
        attention_mask: np.ndarray,  # (1, T)
        uncond_attention_mask: Optional[np.ndarray] = None,  # (1, T)
        text_uncond_attention_mask: Optional[np.ndarray] = None,  # (1, T)
        pixel_values: Optional[np.ndarray] = None,
        generation: Optional[GenerationConfig] = None,
        image_gen: Optional[ImageGenConfig] = None,
        n_images: int = 1,
    ) -> RoundOutput:
        gen = generation or GenerationConfig()
        igen = image_gen or self.cfg.image_gen
        llm_cfg = self.cfg.llm
        self._ensure_cache()

        ids = np.asarray(input_ids)
        T = ids.shape[1]
        start = self.seq_len
        if start + T + gen.max_new_tokens + (self.cfg.image_gen.num_image_tokens + 1) * 2 > self.runtime.max_seq_len:
            raise ValueError("sequence would exceed max_seq_len; raise RuntimeConfig.max_seq_len")

        # append this round's masks into the fixed buffers
        am = np.asarray(attention_mask).astype(bool)
        um = am if uncond_attention_mask is None else np.asarray(uncond_attention_mask).astype(bool)
        tm = am if text_uncond_attention_mask is None else np.asarray(text_uncond_attention_mask).astype(bool)
        self.mask = self.mask.at[:, start : start + T].set(jnp.asarray(am))
        self.uncond_mask = self.uncond_mask.at[:, start : start + T].set(jnp.asarray(um))
        self.text_uncond_mask = self.text_uncond_mask.at[:, start : start + T].set(jnp.asarray(tm))

        # embeddings (+ scattered image features)
        T_pad = _bucket(T)
        ids_pad = np.zeros((1, T_pad), np.int64)
        ids_pad[:, :T] = ids
        embeds = embed_tokens(self.params["llm"], jnp.asarray(ids_pad)).astype(self._dtype)
        image_mask = None
        if pixel_values is not None:
            feats = self.extract_image_features(pixel_values)
            embeds, image_mask = scatter_image_embeds(
                embeds, jnp.asarray(ids_pad), feats, llm_cfg.image_patch_token
            )

        # first-round prefill (empty cache) can use the Pallas flash kernel:
        # the fresh keys are the entire causal context
        from mingunivision_tpu.ops.kernels.flash import flash_usable

        use_flash = start == 0 and flash_usable(T_pad)
        logits, self.cache = prefill(
            self.params["llm"], llm_cfg, embeds, self.cache, self.mask, image_mask=image_mask, use_flash=use_flash
        )
        self.seq_len = int(self.cache.length)
        prompt_end = self.seq_len
        # materialized COPY: self.mask gets donated to the decode loop later
        cond_prompt_mask = self.mask.copy()  # snapshot for PAST_MODE bookkeeping

        self.key, sub = jax.random.split(self.key)
        cur = sample_token(
            logits, sub, do_sample=gen.do_sample, temperature=gen.temperature, top_k=gen.top_k, top_p=gen.top_p
        )[0]

        out_tokens: List[int] = []
        images: List[np.ndarray] = []
        hidden_chunks: List[np.ndarray] = []  # thinker reply hidden states
        budget = gen.max_new_tokens
        while budget > 0:
            cur_host = int(cur)
            out_tokens.append(cur_host)
            budget -= 1
            if cur_host == llm_cfg.eos_token_id:
                break
            if cur_host == llm_cfg.image_start_token:
                cur = self._run_image_phase(cur, prompt_end, igen, n_images=n_images)
                images.extend(np.asarray(im) for im in self._last_image)
                continue
            if budget <= 0:
                break
            # text decode until stop/image/budget
            self.key, sub = jax.random.split(self.key)
            res = decode_text(
                self.params["llm"],
                llm_cfg,
                cur,
                self.cache,
                self.mask,
                sub,
                max_steps=budget,
                do_sample=gen.do_sample,
                temperature=gen.temperature,
                top_k=gen.top_k,
                top_p=gen.top_p,
            )
            self.cache, self.mask = res.cache, res.mask
            n = int(res.num)
            toks = np.asarray(res.tokens[:n]).tolist()
            if n:
                hidden_chunks.append(np.asarray(res.hidden[:n]))
            self.seq_len = int(self.cache.length)
            if n == 0:
                break
            # all but the last are plain text; the last is eos/image-start/cutoff
            out_tokens.extend(toks[:-1])
            budget -= max(0, n - 1)
            cur = jnp.asarray(toks[-1], jnp.int32)

        self._last_token = cur  # enables continue_decode() streaming
        self._prompt_end = prompt_end
        # persisted-mask bookkeeping for the next round (modeling_bailingmm.py:278-299)
        if self.runtime.past_mode == "KEEP":
            pos = jnp.arange(self.runtime.max_seq_len)[None, :]
            self.text_uncond_mask = jnp.where(pos < prompt_end, self.text_uncond_mask, self.mask)
            # uncond beyond prompt stays 0 (pad_uncond_attn_mask is zeros)
        else:  # DROP (default)
            self.uncond_mask = cond_prompt_mask
            # COPY, never alias: continue_decode() donates self.mask to the
            # decode loop — an aliased text_uncond_mask would be invalidated
            self.text_uncond_mask = self.mask.copy()
        self.seq_len = int(self.cache.length)
        # reply hidden states for the thinker->talker feed (vLLM-patch
        # return_hidden_states analog, SURVEY §2.7)
        self.last_hidden_states = (
            np.concatenate(hidden_chunks, axis=0) if hidden_chunks else np.zeros((0, llm_cfg.hidden_size), np.float32)
        )
        return RoundOutput(out_tokens, images)

    def continue_decode(self, max_new_tokens: int, generation: Optional[GenerationConfig] = None) -> RoundOutput:
        """Resume decoding from where the last round stopped (streaming chunks).

        Only valid right after a generate() that ended on the token budget (not
        EOS); feeds the held-back last token and decodes up to max_new_tokens."""
        gen = generation or GenerationConfig(max_new_tokens=max_new_tokens)
        if getattr(self, "_last_token", None) is None:
            raise RuntimeError("no round to continue")
        cur = self._last_token
        out_tokens: List[int] = []
        images: List[np.ndarray] = []
        budget = max_new_tokens
        llm_cfg = self.cfg.llm
        reported = True  # _last_token was already reported by the previous round
        while budget > 0:
            cur_host = int(cur)
            if not reported:
                out_tokens.append(cur_host)
            reported = False
            budget -= 1
            if cur_host == llm_cfg.eos_token_id:
                break
            if cur_host == llm_cfg.image_start_token:
                cur = self._run_image_phase(cur, self._prompt_end, self.cfg.image_gen)
                images.extend(np.asarray(im) for im in self._last_image)
                continue
            if budget <= 0:
                break
            self.key, sub = jax.random.split(self.key)
            res = decode_text(
                self.params["llm"], llm_cfg, cur, self.cache, self.mask, sub,
                max_steps=budget, do_sample=gen.do_sample, temperature=gen.temperature,
                top_k=gen.top_k, top_p=gen.top_p,
            )
            self.cache, self.mask = res.cache, res.mask
            n = int(res.num)
            toks = np.asarray(res.tokens[:n]).tolist()
            self.seq_len = int(self.cache.length)
            if n == 0:
                break
            out_tokens.extend(toks[:-1])
            budget -= max(0, n - 1)
            cur = jnp.asarray(toks[-1], jnp.int32)
        self._last_token = cur
        self.seq_len = int(self.cache.length)
        # keep the persisted-mask bookkeeping current (a streamed round is one
        # logical round split into chunks)
        if self.runtime.past_mode == "KEEP":
            pos = jnp.arange(self.runtime.max_seq_len)[None, :]
            self.text_uncond_mask = jnp.where(pos < self._prompt_end, self.text_uncond_mask, self.mask)
        else:
            self.text_uncond_mask = self.mask.copy()
        return RoundOutput(out_tokens, images)

    # -- image phase ---------------------------------------------------------

    def _run_image_phase(self, image_start_token, prompt_end: int, igen: ImageGenConfig, n_images: int = 1):
        """Run the 256-token AR image loop; returns the next sampled text token.

        n_images > 1 generates that many VARIANTS of the same prompt in one
        batched loop (block-major CFG rows, per-image RF noise — the decode
        weight reads amortize across variants: 2.8x images/min at 4 on v5e).
        The conversation continues from variant 0's cache row."""
        llm_cfg = self.cfg.llm
        pos = jnp.arange(self.runtime.max_seq_len)[None, :]
        cond = self.mask
        uncond = jnp.where(pos < prompt_end, self.uncond_mask, cond)
        text_uncond = jnp.where(pos < prompt_end, self.text_uncond_mask, cond)

        # reference :1856-1866: add the text-uncond row only when non-empty and
        # different from the uncond row
        has_text_row = bool(jnp.any(text_uncond != uncond)) and bool(jnp.sum(text_uncond) > 0)
        rows = [cond, uncond] + ([text_uncond] if has_text_row else [])
        cfg_rows = len(rows)
        # BLOCK-major for n_images variants: [conds x n | unconds x n | ...];
        # the source cache has batch 1 so repeat_rows already yields this layout
        row_masks = jnp.concatenate([r for kind in rows for r in [kind] * n_images], axis=0)

        cache_r = self.cache.repeat_rows(cfg_rows * n_images)
        start_embed = embed_tokens(self.params["llm"], jnp.asarray([[int(image_start_token)]])).astype(self._dtype)

        self.key, sub = jax.random.split(self.key)
        result = generate_image_tokens(
            {
                "llm": self.params["llm"],
                "vis_head": self.params["vis_head"],
                "rf_head": self.params["rf_head"],
                "linear_proj": self.params["linear_proj"],
                "mingtok": self.params["mingtok"],
            },
            llm_cfg,
            self.cfg.mingtok,
            self.cfg.rf_head,
            igen,
            start_embed,
            cache_r,
            row_masks,
            sub,
            cfg_rows=cfg_rows,
            n_images=n_images,
        )
        self.cache = result.cache.first_row()
        self.mask = result.mask[0:1]
        self.seq_len = int(self.cache.length)

        img = pixel_decode(self.params["mingtok"], self.cfg.mingtok, result.sem_tokens)
        self._last_image = np.asarray(img, np.float32)

        # next text token from the trailing hidden state
        from mingunivision_tpu.models.bailing_moe import compute_logits

        logits = compute_logits(self.params["llm"], llm_cfg, result.last_hidden[0:1])[:, -1]
        self.key, sub = jax.random.split(self.key)
        return sample_token(logits, sub)[0]
