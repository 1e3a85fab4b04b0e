"""Exact-tier token2wav: CosyVoice2 flow + HiFT with the reference's streaming
cache/fade semantics (modeling_bailing_talker.py:533-614, :676-797).

Per streamed chunk the reference re-runs the flow over ALL tokens so far and
slices off the already-emitted mel frames (`token_offset * token_mel_ratio`),
prepends the cached mel overlap, runs hift with the cached NSF source, fades
the new speech against the cached tail with a hamming window, and re-caches the
trailing mel/source/speech. Chunk boundaries: a chunk is synthesizable once
`token_offset + token_hop_len + pre_lookahead_len` tokens are available; the
final chunk runs with finalize=True (no lookahead split, full emit).

The ODE noise is a FIXED buffer (the torch CausalConditionalCFM keeps a
rand_noise member) so overlapping re-runs of the same frames integrate the same
trajectory — without this the overlap fade would blend different mels.

This class plugs into talker/streaming.py's OmniAudioPipeline via the same
`token2wav(codec_tokens, key, state) / flush(state)` surface as the analog
`AudioDetokenizer` (per-sentence streaming), and additionally exposes the
chunk-level `stream_chunk` / `synthesize` used by tests and serving.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mingunivision_tpu.talker.flow import FlowConfig, flow_inference, init_flow_params
from mingunivision_tpu.talker.hift import (
    HiFTGeneratorConfig,
    hift_inference,
    init_hift_generator_params,
)


def fade_in_out(fade_in: np.ndarray, fade_out: np.ndarray, window: np.ndarray) -> np.ndarray:
    """Hamming crossfade: head of `fade_in` blended with tail of `fade_out`."""
    ov = window.shape[0] // 2
    fade_in = fade_in.copy()
    fade_in[..., :ov] = fade_in[..., :ov] * window[:ov] + fade_out[..., -ov:] * window[ov:]
    return fade_in


@dataclass
class T2WState:
    """Per-utterance streaming state (the reference's hift_cache_dict[uuid])."""

    tokens: np.ndarray  # (1, N) all codec ids so far
    token_offset: int = 0
    mel: Optional[np.ndarray] = None  # (1, 80, mel_cache_len)
    source: Optional[np.ndarray] = None  # (1, 1, source_cache_len)
    speech: Optional[np.ndarray] = None  # (1, source_cache_len)


@dataclass
class CosyVoiceDetokenizer:
    """flow + hift + reference streaming caches. Weight-compatible tier."""

    flow_cfg: FlowConfig
    hift_cfg: HiFTGeneratorConfig
    flow_params: dict
    hift_params: dict
    mel_cache_len: int = 8
    token_hop_len: int = 25
    max_mel_frames: int = 4096
    noise_seed: int = 0
    # default empty prompt; real usage passes speaker prompt at construction
    prompt_token: Optional[np.ndarray] = None
    prompt_feat: Optional[np.ndarray] = None
    embedding: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.prompt_token is None:
            self.prompt_token = np.zeros((1, 0), np.int32)
        if self.prompt_feat is None:
            self.prompt_feat = np.zeros((1, 0, self.flow_cfg.output_size), np.float32)
        self.source_cache_len = self.mel_cache_len * self.hift_cfg.upsample_scale
        self.speech_window = np.hamming(2 * self.source_cache_len)
        # fixed ODE noise (torch keeps a rand_noise buffer for the same reason)
        self.rand_noise = np.asarray(
            jax.random.normal(
                jax.random.PRNGKey(self.noise_seed),
                (1, self.flow_cfg.output_size, self.max_mel_frames),
            ),
            np.float32,
        )
        if self.embedding is None:
            self.embedding = np.zeros((1, self.flow_cfg.spk_embed_dim), np.float32)
        self._flow_jit = jax.jit(
            lambda p, tok, ptok, pfeat, emb, noise, streaming, finalize: flow_inference(
                p, self.flow_cfg, tok, ptok, pfeat, emb, noise,
                streaming=streaming, finalize=finalize,
            ),
            static_argnames=("streaming", "finalize"),
        )
        self._hift_jit = jax.jit(
            lambda p, mel, key, cache: hift_inference(p, self.hift_cfg, mel, key, cache_source=cache),
            static_argnames=(),
        )

    @classmethod
    def random_init(cls, key, flow_cfg: Optional[FlowConfig] = None, hift_cfg: Optional[HiFTGeneratorConfig] = None, **kw):
        flow_cfg = flow_cfg or FlowConfig()
        hift_cfg = hift_cfg or HiFTGeneratorConfig(in_channels=flow_cfg.output_size)
        k1, k2 = jax.random.split(key)
        return cls(
            flow_cfg, hift_cfg, init_flow_params(k1, flow_cfg), init_hift_generator_params(k2, hift_cfg), **kw
        )

    # -- core chunk step (reference token2wav, :533-614) ---------------------

    def _chunk(self, state: T2WState, finalize: bool, key, speed: float = 1.0) -> tuple[np.ndarray, T2WState]:
        ratio = self.flow_cfg.token_mel_ratio
        mel = self._flow_jit(
            self.flow_params,
            jnp.asarray(state.tokens),
            jnp.asarray(self.prompt_token),
            jnp.asarray(self.prompt_feat),
            jnp.asarray(self.embedding),
            jnp.asarray(self.rand_noise),
            not finalize,
            finalize,
        )
        mel = np.asarray(mel)[:, :, state.token_offset * ratio :]
        if state.mel is not None:
            cache_source = state.source
            mel = np.concatenate([state.mel, mel], axis=2)
        else:
            cache_source = np.zeros((1, 1, 0), np.float32)
        if finalize and speed != 1.0:
            # reference speed change (non-stream only): linear mel resample
            # (modeling_bailing_talker.py:600-606)
            assert state.mel is None, "speed change only supports non-stream inference"
            T = int(mel.shape[2] / speed)
            mel = np.asarray(
                jax.image.resize(jnp.asarray(mel), (mel.shape[0], mel.shape[1], T), method="linear")
            )
        speech, source = self._hift_jit(
            self.hift_params, jnp.asarray(mel), key, jnp.asarray(cache_source)
        )
        speech, source = np.asarray(speech), np.asarray(source)
        if state.speech is not None:
            speech = fade_in_out(speech, state.speech, self.speech_window)
        if not finalize:
            new_state = T2WState(
                tokens=state.tokens,
                token_offset=state.tokens.shape[1],
                mel=mel[:, :, -self.mel_cache_len :],
                source=source[:, :, -self.source_cache_len :],
                speech=speech[:, -self.source_cache_len :],
            )
            return speech[:, : -self.source_cache_len], new_state
        return speech, T2WState(tokens=state.tokens, token_offset=state.tokens.shape[1])

    # -- chunk-level API -----------------------------------------------------

    def stream_chunk(self, state: Optional[T2WState], new_tokens, key, finalize: bool = False):
        """Append tokens; emit all currently synthesizable audio.

        Returns (wav (1, S) possibly empty, state). Non-final chunks run once
        `token_hop_len + pre_lookahead_len` new tokens are pending (reference
        :716-757); finalize flushes everything."""
        new_tokens = np.asarray(new_tokens, np.int32).reshape(1, -1)
        if state is None:
            state = T2WState(tokens=np.zeros((1, 0), np.int32))
        state = T2WState(
            tokens=np.concatenate([state.tokens, new_tokens], axis=1),
            token_offset=state.token_offset,
            mel=state.mel,
            source=state.source,
            speech=state.speech,
        )
        out = []
        La = self.flow_cfg.pre_lookahead_len
        while state.tokens.shape[1] - state.token_offset >= self.token_hop_len + La:
            # synthesize up to offset + hop, peeking La tokens of lookahead
            upto = state.token_offset + self.token_hop_len + La
            sub = T2WState(
                tokens=state.tokens[:, :upto],
                token_offset=state.token_offset,
                mel=state.mel,
                source=state.source,
                speech=state.speech,
            )
            key, k = jax.random.split(key)
            wav, sub = self._chunk(sub, finalize=False, key=k)
            # _chunk advanced offset to len(sub.tokens); lookahead tokens were
            # consumed by the encoder context, not emitted — wind back
            state = T2WState(
                tokens=state.tokens,
                token_offset=upto - La,
                mel=sub.mel,
                source=sub.source,
                speech=sub.speech,
            )
            out.append(wav)
        if finalize and state.tokens.shape[1] > state.token_offset:
            key, k = jax.random.split(key)
            wav, state = self._chunk(state, finalize=True, key=k)
            out.append(wav)
        wav = np.concatenate(out, axis=1) if out else np.zeros((1, 0), np.float32)
        return wav, state

    def synthesize(self, tokens, key, speed: float = 1.0) -> np.ndarray:
        """One-shot non-streaming synthesis. tokens: (1, N) -> wav (1, S);
        speed != 1.0 time-stretches via mel resampling (reference parity)."""
        state = T2WState(tokens=np.asarray(tokens, np.int32).reshape(1, -1))
        wav, _ = self._chunk(state, finalize=True, key=key, speed=speed)
        return wav

    # -- OmniAudioPipeline surface (talker/streaming.py) ---------------------

    def token2wav(self, codec_tokens, key, state: Optional[T2WState] = None):
        """Sentence-chunk surface shared with the analog AudioDetokenizer:
        returns (1-D wav, state)."""
        wav, state = self.stream_chunk(state, codec_tokens, key, finalize=False)
        return wav[0], state

    def flush(self, state: Optional[T2WState]):
        if state is None or state.tokens.shape[1] == state.token_offset:
            return np.zeros(0, np.float32)
        wav, _ = self.stream_chunk(
            T2WState(np.zeros((1, 0), np.int32)) if state is None else state,
            np.zeros((1, 0), np.int32),
            jax.random.PRNGKey(1),
            finalize=True,
        )
        return wav[0]
