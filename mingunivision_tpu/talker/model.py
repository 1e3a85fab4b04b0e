"""BailingTalker: speech-generation LM over the Qwen2 core.

Parity map against reference mingunivision/modeling_bailing_talker.py:
  - Qwen2 LM over a joint vocab (151677 text + 32768 audio-codec bpe): :58-62
  - audio + text embeddings SUMMED per position: :217-220
  - voice-print injection: vp_head Conv1d over speaker embedding, written at
    vp_insert_loc: :66-72, :175-181
  - thinker hidden states projected (2048 -> talker hidden) and written at
    thinker_prefix_insert_loc: :63-65, :182-195
  - AR decode of audio-codec bpe tokens, s3bpe-decoded to raw codec ids: :339-470, :525-527
  - omni_audio_generation: sentence-wise TTS over the thinker's text stream: :802+

TPU-native: prefill + jitted while_loop decode over the shared static cache;
the reference's thread/CUDA-stream/vLLM plumbing collapses into the streaming
pipeline in talker/streaming.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mingunivision_tpu.models.bailing_moe import LLMCache
from mingunivision_tpu.ops.conv import conv1d, conv1d_init
from mingunivision_tpu.ops.linear import dense
from mingunivision_tpu.engine.sampler import sample_token
from mingunivision_tpu.talker.qwen2 import (
    Qwen2Config,
    init_qwen2_params,
    make_qwen2_cache,
    qwen2_embed,
    qwen2_forward,
    qwen2_logits,
)
from mingunivision_tpu.utils.init import linear_init


@dataclass(frozen=True)
class TalkerConfig:
    qwen2: Qwen2Config = field(default_factory=Qwen2Config)
    text_vocab_size: int = 151677
    audio_vocab_size: int = 32768
    qa_model_hidden_size: int = 2048  # thinker hidden width (config.json talker_config)
    vp_feature_size: int = 192  # speaker-embedding dim
    vp_kernel_size: int = 3
    vp_stride: int = 1
    audio_eos_offset: int = 0  # audio eos = text_vocab + audio_vocab - 1 - offset
    max_audio_tokens: int = 512

    @property
    def audio_base(self) -> int:
        return self.text_vocab_size

    @property
    def audio_eos(self) -> int:
        return self.text_vocab_size + self.audio_vocab_size - 1 - self.audio_eos_offset


def init_talker_params(key, cfg: TalkerConfig, dtype=jnp.bfloat16):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "qwen2": init_qwen2_params(k1, cfg.qwen2, dtype),
        "thinker_to_talker_proj": linear_init(k2, cfg.qa_model_hidden_size, cfg.qwen2.hidden_size, dtype=dtype),
        "vp_head": conv1d_init(k3, cfg.vp_feature_size, cfg.qwen2.hidden_size, cfg.vp_kernel_size, dtype),
    }


def compose_prefix_embeds(
    params,
    cfg: TalkerConfig,
    audio_ids,
    text_ids,
    vp_emb=None,
    vp_insert_loc: int = 0,
    thinker_hidden=None,
    thinker_insert_loc: int = 0,
):
    """Build the talker prompt embedding (reference forward :214-229).

    audio_ids/text_ids: (1, T) — summed embeddings; vp_emb: (1, T_vp, vp_feat)
    convolved and written at vp_insert_loc; thinker_hidden: (1, T_th, 2048)
    projected and written at thinker_insert_loc.
    """
    embeds = qwen2_embed(params["qwen2"], audio_ids) + qwen2_embed(params["qwen2"], text_ids)
    if vp_emb is not None:
        vp = conv1d(vp_emb.astype(embeds.dtype).transpose(0, 2, 1), params["vp_head"], stride=cfg.vp_stride)
        vp = vp.transpose(0, 2, 1)  # (1, T', hidden)
        embeds = lax.dynamic_update_slice(embeds, vp[:, :1], (0, vp_insert_loc, 0))
    if thinker_hidden is not None:
        th = dense(thinker_hidden.astype(embeds.dtype), params["thinker_to_talker_proj"])
        embeds = lax.dynamic_update_slice(embeds, th, (0, thinker_insert_loc, 0))
    return embeds


class TalkerDecodeResult(NamedTuple):
    tokens: jax.Array  # (max_steps,) bpe audio ids (absolute vocab ids)
    num: jax.Array
    cache: LLMCache


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_steps", "do_sample", "temperature", "top_k", "top_p"), donate_argnames=("cache",)
)
def talker_decode(
    params,
    cfg: TalkerConfig,
    prefix_embeds,
    cache: LLMCache,
    key,
    *,
    max_steps: int,
    do_sample: bool = True,
    temperature: float = 1.0,
    top_k: int = 50,
    top_p: float = 1.0,
):
    """Prefill the composed prompt, then AR-decode audio-codec tokens.

    Non-audio logits are masked out (generation stays in the audio id range,
    plus the audio EOS)."""
    B, T, _ = prefix_embeds.shape
    Smax = cache.max_len
    mask = jnp.zeros((B, Smax), bool)
    mask = lax.dynamic_update_slice(mask, jnp.ones((B, T), bool), (0, 0))
    hidden, cache = qwen2_forward(params["qwen2"], cfg.qwen2, prefix_embeds, cache, mask)

    vocab = cfg.qwen2.vocab_size
    audio_mask = (jnp.arange(vocab) >= cfg.audio_base) & (jnp.arange(vocab) < cfg.audio_base + cfg.audio_vocab_size)

    def logits_of(h):
        lg = qwen2_logits(params["qwen2"], cfg.qwen2, h)[:, -1]
        return jnp.where(audio_mask[None], lg, -1e9)

    def sample(lg, k):
        return sample_token(lg, k, do_sample=do_sample, temperature=temperature, top_k=top_k, top_p=top_p)[0]

    key, sub = jax.random.split(key)
    cur = sample(logits_of(hidden), sub)
    tokens0 = jnp.zeros((max_steps,), jnp.int32).at[0].set(cur)

    def cond(state):
        i, cur, done, *_ = state
        return jnp.logical_and(i < max_steps, jnp.logical_not(done))

    def body(state):
        i, cur, done, cache, mask, tokens, key = state
        mask = lax.dynamic_update_slice(mask, jnp.ones((1, 1), bool), (0, cache.length))
        embeds = qwen2_embed(params["qwen2"], cur.reshape(1, 1))
        h, cache = qwen2_forward(params["qwen2"], cfg.qwen2, embeds, cache, mask)
        key, sub = jax.random.split(key)
        nxt = sample(logits_of(h), sub)
        tokens = tokens.at[i].set(nxt)
        done = nxt == cfg.audio_eos
        return (i + 1, nxt, done, cache, mask, tokens, key)

    init = (jnp.int32(1), cur, cur == cfg.audio_eos, cache, mask, tokens0, key)
    i, cur, done, cache, mask, tokens, key = lax.while_loop(cond, body, init)
    return TalkerDecodeResult(tokens, i, cache)


class BailingTalker:
    """Host-side talker: prompt composition + decode + s3bpe detok."""

    def __init__(self, params, cfg: TalkerConfig, s3bpe=None, seed: int = 0):
        from mingunivision_tpu.talker.s3bpe import S3BpeTokenizer

        self.params = params
        self.cfg = cfg
        self.s3bpe = s3bpe or S3BpeTokenizer()
        self.key = jax.random.PRNGKey(seed)

    @classmethod
    def random_init(cls, key, cfg: Optional[TalkerConfig] = None, dtype=jnp.float32):
        cfg = cfg or TalkerConfig()
        return cls(init_talker_params(key, cfg, dtype), cfg)

    def generate_audio_tokens(
        self,
        text_ids: np.ndarray,  # (1, T) tokenized sentence
        vp_emb: Optional[np.ndarray] = None,
        thinker_hidden: Optional[np.ndarray] = None,
        thinker_insert_loc: int = 0,
        max_len: int = 1024,
        max_steps: Optional[int] = None,
    ) -> List[int]:
        """One sentence -> raw speech-codec ids."""
        cfg = self.cfg
        T = text_ids.shape[1]
        audio_ids = np.full_like(text_ids, cfg.audio_base)  # neutral audio row
        embeds = compose_prefix_embeds(
            self.params,
            cfg,
            jnp.asarray(audio_ids),
            jnp.asarray(text_ids),
            vp_emb=None if vp_emb is None else jnp.asarray(vp_emb),
            thinker_hidden=None if thinker_hidden is None else jnp.asarray(thinker_hidden),
            thinker_insert_loc=thinker_insert_loc,
        )
        cache = make_qwen2_cache(cfg.qwen2, 1, max_len, embeds.dtype)
        self.key, sub = jax.random.split(self.key)
        res = talker_decode(
            self.params, cfg, embeds, cache, sub, max_steps=max_steps or cfg.max_audio_tokens
        )
        n = int(res.num)
        toks = np.asarray(res.tokens[:n]).tolist()
        if toks and toks[-1] == cfg.audio_eos:
            toks = toks[:-1]
        bpe_ids = [t - cfg.audio_base for t in toks]
        return self.s3bpe.decode(bpe_ids)
