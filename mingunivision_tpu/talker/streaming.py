"""Streaming TTS pipeline: llm_job -> sentence manager -> tts_job -> wav chunks.

Capability analog of the reference's omni_audio_generation threading
(modeling_bailing_talker.py:96-112, :616-652): the thinker's text stream feeds
a SentenceManager; complete normalized sentences go through the talker LM to
codec tokens, then the detokenizer to waveform chunks with crossfade. The
reference's two CUDA streams + shared dicts + lock become a producer/consumer
pair of threads over queues — TPU work stays serialized on one device stream.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Callable, Iterator, List, Optional

import jax
import numpy as np

from mingunivision_tpu.talker.detokenizer import AudioDetokenizer, StreamState
from mingunivision_tpu.talker.model import BailingTalker
from mingunivision_tpu.talker.sentence_manager import SentenceManager, SentenceManagerConfig

_SENTINEL = object()


@dataclass
class AudioChunk:
    wav: np.ndarray  # float32 mono
    sentence: str
    is_last: bool = False


class OmniAudioPipeline:
    """text stream -> audio chunk stream."""

    def __init__(
        self,
        talker: BailingTalker,
        detokenizer: AudioDetokenizer,
        tokenize: Callable[[str], List[int]],
        sm_config: Optional[SentenceManagerConfig] = None,
        seed: int = 0,
        vp_emb=None,
    ):
        self.talker = talker
        self.detok = detokenizer
        self.tokenize = tokenize
        self.sm_config = sm_config
        self.key = jax.random.PRNGKey(seed)
        self.vp_emb = vp_emb  # (1, K, 192) voice-print frames (talker vp_head)

    def set_voice(self, profile) -> None:
        """Apply a zero-shot VoiceProfile (talker/frontend.py): the voice-print
        conditions every sentence's talker prompt; the codec/mel prompt +
        speaker embedding condition the flow when the detokenizer supports
        them (CosyVoiceDetokenizer's prompt_token/prompt_feat/embedding —
        the reference's zero-shot conditioning surface, flow.inference args
        modeling_bailing_talker.py:553-568)."""
        self.vp_emb = profile.vp_emb
        if hasattr(self.detok, "prompt_token"):
            self.detok.prompt_token = np.asarray(profile.prompt_token, np.int32)
            self.detok.prompt_feat = np.asarray(profile.prompt_feat, np.float32)
            self.detok.embedding = np.asarray(profile.embedding, np.float32)

    def synthesize_sentence(self, sentence: str, state: Optional[StreamState], thinker_hidden=None):
        ids = np.asarray([self.tokenize(sentence)], np.int64)
        codec = self.talker.generate_audio_tokens(ids, vp_emb=self.vp_emb, thinker_hidden=thinker_hidden)
        if not codec:
            return np.zeros(0, np.float32), state
        self.key, sub = jax.random.split(self.key)
        wav, state = self.detok.token2wav(np.asarray([codec]), sub, state)
        return wav, state

    def stream(self, text_pieces: Iterator[str], thinker_hidden=None) -> Iterator[AudioChunk]:
        """Synchronous streaming: consume text pieces, yield audio chunks.

        thinker_hidden: optional (1, T, qa_hidden) thinker reply states injected
        into the first sentence's talker prompt (reference thinker_reply_part)."""
        sm = SentenceManager(self.sm_config)
        state: Optional[StreamState] = None
        first = True
        for piece in text_pieces:
            sm.put(piece)
            for sentence in sm.get_all():
                wav, state = self.synthesize_sentence(sentence, state, thinker_hidden if first else None)
                first = False
                yield AudioChunk(wav, sentence)
        sm.finish()
        for sentence in sm.get_all():
            wav, state = self.synthesize_sentence(sentence, state)
            yield AudioChunk(wav, sentence)
        yield AudioChunk(self.detok.flush(state), "", is_last=True)

    def stream_threaded(self, text_pieces: Iterator[str], max_queue: int = 8) -> Iterator[AudioChunk]:
        """Producer/consumer version: text ingestion (llm_job) and synthesis
        (tts_job) overlap, mirroring the reference's two-stream design."""
        sentences: "queue.Queue" = queue.Queue(max_queue)
        chunks: "queue.Queue" = queue.Queue(max_queue)

        def llm_job():
            sm = SentenceManager(self.sm_config)
            try:
                for piece in text_pieces:
                    sm.put(piece)
                    for s in sm.get_all():
                        sentences.put(s)
                sm.finish()
                for s in sm.get_all():
                    sentences.put(s)
            finally:
                sentences.put(_SENTINEL)

        def tts_job():
            state: Optional[StreamState] = None
            try:
                while True:
                    s = sentences.get()
                    if s is _SENTINEL:
                        break
                    wav, state = self.synthesize_sentence(s, state)
                    chunks.put(AudioChunk(wav, s))
            finally:
                chunks.put(AudioChunk(self.detok.flush(state), "", is_last=True))
                chunks.put(_SENTINEL)

        t1 = threading.Thread(target=llm_job, daemon=True)
        t2 = threading.Thread(target=tts_job, daemon=True)
        t1.start()
        t2.start()
        while True:
            c = chunks.get()
            if c is _SENTINEL:
                break
            yield c
        t1.join()
        t2.join()
