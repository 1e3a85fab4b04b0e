"""HTTP client for the inference server (analog of talker_vllm_client.py:6-76)."""

from __future__ import annotations

import base64
import io
import json
import urllib.request
from typing import Iterator, List, Optional


class InferenceClient:
    def __init__(self, base_url: str = "http://127.0.0.1:8816", timeout: float = 600.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def _post(self, path: str, payload: dict) -> dict:
        req = urllib.request.Request(
            f"{self.base_url}{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())

    def health(self) -> dict:
        with urllib.request.urlopen(f"{self.base_url}/health", timeout=self.timeout) as r:
            return json.loads(r.read())

    def metrics(self) -> dict:
        with urllib.request.urlopen(f"{self.base_url}/metrics", timeout=self.timeout) as r:
            return json.loads(r.read())

    @staticmethod
    def encode_image(img) -> str:
        """PIL image -> base64 payload string."""
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    def generate(self, messages: List[dict], **kwargs) -> dict:
        out = self._post("/generate", {"messages": messages, **kwargs})
        out["pil_images"] = [self._decode_image(b) for b in out.get("images", [])]
        return out

    @staticmethod
    def _decode_image(b64: str):
        from PIL import Image

        return Image.open(io.BytesIO(base64.b64decode(b64)))

    def generate_stream(self, messages: List[dict], **kwargs) -> Iterator[str]:
        req = urllib.request.Request(
            f"{self.base_url}/generate_stream",
            data=json.dumps({"messages": messages, **kwargs}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            while True:
                chunk = r.read(4096)
                if not chunk:
                    break
                yield chunk.decode(errors="replace")
