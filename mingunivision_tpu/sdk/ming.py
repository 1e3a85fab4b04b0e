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
        spawn_server: bool = False,
        server_port: int = 8816,
    ):
        if infer is None:
            from mingunivision_tpu.api import MingUniVisionInfer

            infer = MingUniVisionInfer(model_path)
        self.infer = infer
        self.talker_pipeline = talker_pipeline
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

    def tts(self, text: str):
        """Text -> waveform via the talker pipeline."""
        if self.talker_pipeline is None:
            raise RuntimeError("no talker pipeline configured")
        import numpy as np

        chunks = list(self.talker_pipeline.stream(iter([text])))
        return np.concatenate([c.wav for c in chunks if len(c.wav)]) if chunks else np.zeros(0, np.float32)
