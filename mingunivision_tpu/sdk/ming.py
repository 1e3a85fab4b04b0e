"""Ming SDK: process-level orchestration over thinker + talker + image gen.

Capability analog of reference ming_sdk/ming.py (~1270 LoC): the `Ming` facade
routes `generate(text=..., image=..., output_type=...)` to the right stack
(:657-987), `MingUtils` builds prompts incl. the image-gen `<gen_image>` scale
tokens (:27-348), and server processes are babysat (spawn on a port, poll for
readiness, kill on shutdown — :691-740).

TPU-native simplifications: the thinker is our in-process engine (no vLLM
subprocess needed for hidden-state return — the session exposes them directly);
the optional HTTP server subprocess reuses mingunivision_tpu.serving.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time
import urllib.request
from dataclasses import dataclass
from typing import Iterator, List, Optional


class MingUtils:
    """Prompt builders (reference ming_sdk/ming.py:27-348)."""

    GEN_IMAGE_SCALES = {4: "<gen_image4>", 8: "<gen_image8>", 16: "<gen_image16>"}

    @staticmethod
    def build_text_messages(prompt: str, system: Optional[str] = None) -> List[dict]:
        msgs = []
        if system:
            msgs.append({"role": "HUMAN", "content": [{"type": "text", "text": system}]})
        msgs.append({"role": "HUMAN", "content": [{"type": "text", "text": prompt}]})
        return msgs

    @staticmethod
    def build_image_understanding_messages(prompt: str, image) -> List[dict]:
        return [
            {
                "role": "HUMAN",
                "content": [{"type": "image", "image": image}, {"type": "text", "text": prompt}],
            }
        ]

    @staticmethod
    def build_image_gen_prompt(prompt: str, scale: int = 16) -> List[dict]:
        tok = MingUtils.GEN_IMAGE_SCALES.get(scale, "")
        return [{"role": "HUMAN", "content": [{"type": "text", "text": f"{prompt}{tok}"}]}]

    @staticmethod
    def build_prompt(
        prompt: Optional[str] = None,
        *,
        image=None,
        video=None,
        audio=None,
        history: Optional[List[dict]] = None,
        sys_prompt: Optional[str] = None,
        sample_rate: int = 16000,
        max_frames: int = 32,
        limit_images: int = 10,
        limit_videos: int = 2,
        limit_audios: int = 1,
    ) -> List[dict]:
        """Full multimodal prompt builder (reference ming_sdk build_prompt,
        ming.py:104-221): one HUMAN turn assembled in the reference's content
        order (SYSTEM text, video, images, audio, text), prepended with history
        (dropped when a video is present) and passed through the media-budget
        filter. `image` may be a single item or a list."""
        content: List[dict] = []
        if sys_prompt:
            content.append({"type": "text", "text": f"SYSTEM: {sys_prompt}"})
        if video is not None:
            n = len(video) if isinstance(video, list) else max_frames
            content.append({"type": "video", "video": video, "sample": "uniform", "max_frames": n})
        if image is not None:
            for single in image if isinstance(image, list) else [image]:
                content.append({"type": "image", "image": single})
        if audio is not None:
            content.append({"type": "audio", "audio": audio, "sample_rate": sample_rate})
        if prompt is not None:
            content.append({"type": "text", "text": prompt})
        messages = [{"role": "HUMAN", "content": content}]
        if history and video is None:  # reference :176-177: video clears history
            messages = list(history) + messages
        return MingUtils.filter_message(messages, limit_images, limit_videos, limit_audios)

    @staticmethod
    def filter_message(
        data: List[dict], limit_images: int = 10, limit_videos: int = 2, limit_audios: int = 1
    ) -> List[dict]:
        """Media-budget history filter (reference ming.py:46-102): keep the
        final HUMAN turn if it fits the budgets, then walk history newest-first
        admitting complete ASSISTANT+HUMAN pairs while the image/video budgets
        hold; any history pair containing audio is dropped (history does not
        support audio)."""

        def counts(entry):
            c = entry.get("content", [])
            if not isinstance(c, list):
                return 0, 0, 0
            return (
                sum(1 for x in c if x.get("type") == "image"),
                sum(1 for x in c if x.get("type") == "video"),
                sum(1 for x in c if x.get("type") == "audio"),
            )

        if not data:
            return []
        filtered: List[dict] = []
        total_i = total_v = total_a = 0
        last = data[-1]
        if last.get("role") == "HUMAN":
            li, lv, la = counts(last)
            if li <= limit_images and lv <= limit_videos and la <= limit_audios:
                filtered.append(last)
                total_i, total_v, total_a = li, lv, la
        tmp_h = tmp_a = None
        for entry in reversed(data[:-1]):
            if entry.get("role") == "HUMAN":
                tmp_h = entry
                if tmp_h is not None and tmp_a is not None:
                    hi, hv, ha = counts(tmp_h)
                    ai, av, aa = counts(tmp_a)
                    ni, nv = total_i + hi + ai, total_v + hv + av
                    if ni > limit_images or nv > limit_videos or (ha + aa) > 0:
                        tmp_h = tmp_a = None
                        continue
                    filtered.append(tmp_a)
                    filtered.append(tmp_h)
                    total_i, total_v = ni, nv
                    tmp_h = tmp_a = None
            elif entry.get("role") == "ASSISTANT":
                tmp_a = entry
        return filtered[::-1]

    @staticmethod
    def build_img_prompt(prompt: str, image=None) -> List[dict]:
        """Image-gen/edit message order (reference ming.py:223-281): text-to-
        image puts the text FIRST and appends a 1x1 dummy image slot; editing
        puts the source image first."""
        if image is None:
            try:
                from PIL import Image as _Image

                dummy = _Image.new("RGB", (1, 1), (0, 0, 0))
            except Exception:  # PIL-free env: omit the dummy slot
                return [{"role": "HUMAN", "content": [{"type": "text", "text": prompt}]}]
            return [
                {"role": "HUMAN", "content": [{"type": "text", "text": prompt}, {"type": "image", "image": dummy}]}
            ]
        return [
            {"role": "HUMAN", "content": [{"type": "image", "image": image}, {"type": "text", "text": prompt}]}
        ]


class MingImg:
    """Diffusion image-generation loader slot (reference ming_sdk/ming.py:630-654).

    The omni checkpoint family pairs the thinker with an EXTERNAL diffusion
    decoder driven by query tokens; Ming-UniVision proper generates images
    natively through the AR loop (the route `Ming.generate(output_type="image")`
    takes). This class is the pluggable slot for an omni-style decoder: pass any
    callable `(prompt: str, query_embeds) -> image` at construction.
    """

    def __init__(self, decoder=None):
        self.decoder = decoder

    @property
    def available(self) -> bool:
        return self.decoder is not None

    def generate(self, prompt: str, query_embeds=None):
        if not self.available:
            raise RuntimeError(
                "no diffusion decoder configured — Ming-UniVision generates images "
                "natively via Ming.generate(output_type='image')"
            )
        return self.decoder(prompt, query_embeds)

    @staticmethod
    def conditioning(params, llm_cfg, input_ids, query_tokens, **kw):
        """Produce the query-token conditioning hiddens for an external
        diffusion decoder (models/omni_imggen.omni_gen_hidden): the thinker-side
        half of the omni image-gen path (vllm/ming_lite.patch:1939-1990)."""
        from mingunivision_tpu.models.omni_imggen import omni_gen_hidden

        return omni_gen_hidden(params, llm_cfg, input_ids, query_tokens, **kw)


@dataclass
class TalkerServerHandle:
    process: subprocess.Popen
    port: int

    def kill(self):
        if self.process.poll() is None:
            self.process.send_signal(signal.SIGTERM)
            try:
                self.process.wait(timeout=5)
            except subprocess.TimeoutExpired:
                self.process.kill()


def wait_for_ready(url: str, timeout: float = 60.0, interval: float = 0.5) -> bool:
    """Poll a /health endpoint until ready (reference wait_for_talker_ready :729-735)."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(url, timeout=2) as r:
                if r.status == 200:
                    return True
        except Exception:
            pass
        time.sleep(interval)
    return False


class Ming:
    """Unified entry: text QA, image understanding/generation/editing, speech."""

    def __init__(
        self,
        model_path: Optional[str] = None,
        *,
        infer=None,  # MingUniVisionInfer
        talker_pipeline=None,  # OmniAudioPipeline
        audio_frontend=None,  # talker.frontend.TTSFrontend (zero-shot cloning)
        spawn_server: bool = False,
        server_port: int = 8816,
    ):
        if infer is None:
            from mingunivision_tpu.api import MingUniVisionInfer

            infer = MingUniVisionInfer(model_path)
        self.infer = infer
        self.talker_pipeline = talker_pipeline
        self.audio_frontend = audio_frontend
        self.server: Optional[TalkerServerHandle] = None
        if spawn_server:
            self.server = self._spawn_server(model_path, server_port)

    # -- server babysitting ---------------------------------------------------

    def _spawn_server(self, model_path, port: int) -> TalkerServerHandle:
        proc = subprocess.Popen(
            [sys.executable, "-m", "mingunivision_tpu.serving.launch", "--ckpt", str(model_path), "--port", str(port)],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        if not wait_for_ready(f"http://127.0.0.1:{port}/health"):
            proc.kill()
            raise RuntimeError("server failed to become healthy")
        return TalkerServerHandle(proc, port)

    def shutdown(self):
        if self.server is not None:
            self.server.kill()
            self.server = None

    def __del__(self):  # reference :737-740
        try:
            self.shutdown()
        except Exception:
            pass

    # -- generation routes ----------------------------------------------------

    def generate(
        self,
        text: str,
        image=None,
        output_type: str = "text",
        max_new_tokens: int = 512,
        for_edit: bool = False,
        **kw,
    ):
        """Route by output_type: "text" | "image" | "speech"."""
        if output_type == "image":
            msgs = MingUtils.build_image_gen_prompt(text) if image is None else MingUtils.build_image_understanding_messages(text, image)
            out_text = self.infer.generate(msgs, max_new_tokens=max_new_tokens, for_edit=for_edit or image is not None, **kw)
            return {"text": out_text, "images": getattr(self.infer, "last_images", [])}
        msgs = (
            MingUtils.build_image_understanding_messages(text, image)
            if image is not None
            else MingUtils.build_text_messages(text)
        )
        out_text = self.infer.generate(msgs, max_new_tokens=max_new_tokens, **kw)
        if output_type == "speech":
            if self.talker_pipeline is None:
                raise RuntimeError("no talker pipeline configured")
            # thinker reply hidden states condition the talker (reference
            # return_hidden_states -> thinker_reply_part plumbing)
            hidden = getattr(self.infer.session, "last_hidden_states", None)
            th = None
            if hidden is not None and len(hidden) and hidden.shape[-1] == getattr(
                getattr(self.talker_pipeline.talker, "cfg", None), "qa_model_hidden_size", -1
            ):
                th = hidden[None, : 4]
            chunks = list(self.talker_pipeline.stream(iter([out_text]), thinker_hidden=th))
            import numpy as np

            wav = np.concatenate([c.wav for c in chunks]) if chunks else None
            return {"text": out_text, "audio": wav}
        return {"text": out_text}

    def generate_stream(self, text: str, chunk_tokens: int = 16, max_new_tokens: int = 256) -> Iterator[str]:
        """Chunked text streaming: one real prefill, then continue_decode chunks
        over the SAME session (no re-prompting between chunks)."""
        piece = self.infer.generate(MingUtils.build_text_messages(text), max_new_tokens=chunk_tokens)
        if piece:
            yield piece
        remaining = max_new_tokens - chunk_tokens
        sess = self.infer.session
        eos = self.infer.config.llm.eos_token_id
        while remaining > 0:
            if int(sess._last_token) == eos:
                break
            out = sess.continue_decode(min(chunk_tokens, remaining))
            ids = [t for t in out.token_ids if t != eos]
            if not ids:
                break
            yield self.infer.processor.decode(ids)
            remaining -= len(out.token_ids)
            if out.token_ids and out.token_ids[-1] == eos:
                break

    def tts(self, text: str, prompt_audio=None, prompt_sr: int = 16000):
        """Text -> waveform via the talker pipeline.

        prompt_audio: optional raw mono waveform (np.float32) for zero-shot
        voice cloning — the audio frontend (talker/frontend.py, analog of the
        reference TTSFrontEnd, ming_sdk/ming.py:407-411) derives the 192-d
        voice-print, the 25 Hz prompt codec tokens, and the prompt mel, and
        conditions both the talker prompt and the flow decoder with them."""
        if self.talker_pipeline is None:
            raise RuntimeError("no talker pipeline configured")
        import numpy as np

        if prompt_audio is not None:
            if self.audio_frontend is None:
                raise RuntimeError(
                    "prompt_audio given but no audio_frontend configured "
                    "(pass Ming(audio_frontend=TTSFrontend(...)))"
                )
            self.talker_pipeline.set_voice(
                self.audio_frontend.voice_profile(np.asarray(prompt_audio, np.float32), prompt_sr)
            )
        chunks = list(self.talker_pipeline.stream(iter([text])))
        return np.concatenate([c.wav for c in chunks if len(c.wav)]) if chunks else np.zeros(0, np.float32)
