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


class BatchTextWorker:
    """Continuous-batching text path (the vLLM-analog serving tier, reference
    patch :2054-2073): a dedicated thread admits queued prompts into free
    ContinuousBatchingEngine slots and steps all active slots together —
    decode is HBM-bound, so co-scheduled requests are near-free throughput."""

    def __init__(self, engine, eos_token_id: int):
        import queue as _queue
        import threading

        self.engine = engine
        self.eos_token_id = eos_token_id
        from collections import deque

        self.queue: "_queue.Queue" = _queue.Queue()
        self._pending: "deque" = deque()  # worker-local admission queue (drained by stop)
        self._inflight: list = []
        self._running = True
        self._thread = threading.Thread(target=self._loop, name="batch-worker", daemon=True)
        self._thread.start()

    def submit(self, input_ids, max_new_tokens: int, sampling: dict = None) -> dict:
        import threading

        item = {
            "ids": input_ids,
            "max": int(max_new_tokens),
            "sampling": sampling or {},
            "event": threading.Event(),
            "req": None,
        }
        self.queue.put(item)
        return item

    def stop(self):
        import queue as _queue

        self._running = False
        self._thread.join(timeout=5)
        # fail everything still queued / admitted-but-unfinished so handlers
        # blocked on item["event"].wait() unblock instead of hanging forever
        leftovers = list(self._pending) + list(self._inflight)
        self._pending.clear()
        self._inflight = []
        try:
            while True:
                leftovers.append(self.queue.get_nowait())
        except _queue.Empty:
            pass
        for item in leftovers:
            item.setdefault("error", "server shutting down")
            item["event"].set()

    def _loop(self):
        import queue as _queue

        pending = self._pending
        while self._running:
            try:
                while True:
                    pending.append(self.queue.get_nowait())
            except _queue.Empty:
                pass
            while pending and self.engine.has_free_slot():
                item = pending.popleft()
                try:
                    item["req"] = self.engine.add_request(item["ids"], item["max"], **item.get("sampling", {}))
                except Exception as e:  # noqa: BLE001 — bad request must not kill the worker
                    item["error"] = str(e)
                    item["event"].set()
                    continue
                if item["req"] is None:
                    # paged engine: free slot but no pages right now — requeue
                    # and retry after in-flight requests release pages; if the
                    # pool is IDLE this request can never fit (prompt needs
                    # more pages than the pool holds) — fail it instead
                    if self.engine.slot_req:
                        pending.appendleft(item)
                        break
                    item["error"] = "request exceeds the KV page pool"
                    item["event"].set()
                elif item["req"].done:  # instant stop (eos/image-start first)
                    item["event"].set()
                else:
                    self._inflight.append(item)
            if not self.engine.slot_req:
                try:
                    pending.append(self.queue.get(timeout=0.05))
                except _queue.Empty:
                    pass
                continue
            self.engine.step()
            still = []
            for item in self._inflight:
                if item["req"].done:
                    item["event"].set()
                else:
                    still.append(item)
            self._inflight = still


class ImagePoolWorker:
    """Continuous-admission T2I serving (engine/image_pool.py): requests from
    ANY /generate_image_batch POST are admitted into free pool slots while
    earlier requests are mid-generation — the vLLM-style scheduler for the AR
    image loop (the barrier batcher serving/image_batch.py admits only between
    whole AR batches). Same thread/queue/drain discipline as BatchTextWorker."""

    def __init__(self, engine):
        import queue as _queue
        import threading
        from collections import deque

        self.engine = engine  # ImagePoolEngine
        self.queue: "_queue.Queue" = _queue.Queue()
        self._pending: "deque" = deque()
        self._inflight: list = []
        self._running = True
        self._thread = threading.Thread(target=self._loop, name="image-pool-worker", daemon=True)
        self._thread.start()

    def submit(self, batch: dict, key, gen_kwargs: dict = None) -> dict:
        import threading

        item = {"batch": batch, "key": key, "gen": gen_kwargs or {}, "event": threading.Event(), "req": None}
        self.queue.put(item)
        return item

    def stop(self):
        import queue as _queue

        self._running = False
        self._thread.join(timeout=5)
        leftovers = list(self._pending) + list(self._inflight)
        self._pending.clear()
        self._inflight = []
        try:
            while True:
                leftovers.append(self.queue.get_nowait())
        except _queue.Empty:
            pass
        for item in leftovers:
            item.setdefault("error", "server shutting down")
            item["event"].set()

    def _loop(self):
        import queue as _queue

        pending = self._pending
        while self._running:
            try:
                while True:
                    pending.append(self.queue.get_nowait())
            except _queue.Empty:
                pass
            while pending and self.engine.has_free_slot():
                item = pending.popleft()
                try:
                    item["req"] = self.engine.add_request(item["batch"], item["key"], **item["gen"])
                except Exception as e:  # noqa: BLE001 — bad request must not kill the worker
                    item["error"] = str(e)
                    item["event"].set()
                    continue
                if item["req"] is None:
                    item["error"] = "admission raced"
                    item["event"].set()
                else:
                    self._inflight.append(item)
            if not self.engine.slot_req:
                try:
                    pending.append(self.queue.get(timeout=0.05))
                except _queue.Empty:
                    pass
                continue
            self.engine.step()  # one jitted chunk for every active slot
            still = []
            for item in self._inflight:
                if item["req"].done:
                    item["event"].set()
                else:
                    still.append(item)
            self._inflight = still


class InferenceServer:
    def __init__(
        self,
        infer,
        host: str = "0.0.0.0",
        port: int = 8816,
        max_sessions: int = 8,
        max_queue: int = 64,
        talker_pipeline=None,
        batch_slots: int = 0,
        batch_max_len: int = 1024,
        image_pool_slots: int = 0,
        image_pool_chunk: int = 32,
        paged_kv: Optional[bool] = None,
        page_size: int = 64,
        num_pages: Optional[int] = None,
        prefix_cache: bool = False,
        lora_adapters: Optional[dict] = None,
    ):
        """batch_slots > 0 enables the continuous-batching text endpoint
        (/generate_batch) with that many concurrent decode slots;
        image_pool_slots > 0 switches /generate_image_batch to slot-level
        continuous admission (engine/image_pool.py) — requests from different
        POSTs co-schedule and admit mid-generation. paged_kv switches the text
        pool to the block-paged engine (engine/paged.py, the vLLM
        PagedAttention analog): KV HBM ∝ tokens in flight, sized by
        num_pages * page_size; exhausted pools stall slots instead of OOMing
        (single-device tier — unsharded). prefix_cache additionally
        content-addresses full prompt pages so repeated prefixes (shared
        system prompts) skip their prefill — the vLLM APC analog.
        lora_adapters: {name: adapter pytree} (lora.py) — /generate_batch
        requests pick one via a "lora" field (the vLLM per-request LoRA
        analog; reference registers SupportsLoRA, ming_lite.patch:901-940)."""
        self.infer = infer  # a MingUniVisionInfer (holds the default session)
        self.host = host
        self.port = port
        self.max_sessions = max_sessions
        self.max_queue = max_queue
        self.talker_pipeline = talker_pipeline  # OmniAudioPipeline for /tts
        self.executor = ThreadPoolExecutor(max_workers=1)  # one TPU stream
        self.pending = 0
        self.stats = {"requests": 0, "errors": 0, "tokens": 0, "images": 0}
        self._t0 = time.time()
        # per-session_id multi-round state: session_id -> MingUniVisionSession,
        # LRU-evicted at max_sessions. The map is touched from BOTH the asyncio
        # event-loop thread (stream setup) and the executor thread, so it is
        # lock-guarded; additionally each session carries its own non-blocking
        # lock so two streams (or a stream and a one-shot) sharing a session_id
        # cannot interleave KV-cache continuations — the loser gets OVERLOADED.
        import threading

        self._sessions_lock = threading.Lock()
        self._session_locks: dict = {"default": threading.Lock()}
        self._sessions: OrderedDict = OrderedDict([("default", infer.session)])
        self.batch_worker = None
        lora_kw = {}
        if lora_adapters:
            from mingunivision_tpu.lora import make_lora_bank

            names = list(lora_adapters)
            lora_kw = {
                "lora_bank": make_lora_bank([lora_adapters[n] for n in names], infer.config.llm),
                "lora_names": names,
            }
        if batch_slots > 0:
            mesh = getattr(infer, "mesh", None)
            if paged_kv is None:
                # default tier: paged on a single device (measured tax 0-2% at
                # B=8/16 after the round-4 multi-page kernel — BENCHMARKS
                # "Serving re-measure"; buys bounded KV HBM + prefix reuse),
                # dense pool under a mesh (paged is the unsharded tier)
                paged_kv = mesh is None
            if paged_kv:
                if mesh is not None:
                    raise ValueError("paged_kv is the single-device tier; use the dense pool with a mesh")
                from mingunivision_tpu.engine.paged import PagedBatchingEngine

                engine = PagedBatchingEngine(
                    infer.params["llm"],
                    infer.config.llm,
                    slots=batch_slots,
                    max_len=batch_max_len,
                    page_size=page_size,
                    num_pages=num_pages,
                    dtype=infer.session._dtype,
                    prefix_cache=prefix_cache,
                    **lora_kw,
                )
            else:
                from mingunivision_tpu.engine.batch_engine import ContinuousBatchingEngine

                engine = ContinuousBatchingEngine(
                    infer.params["llm"],
                    infer.config.llm,
                    slots=batch_slots,
                    max_len=batch_max_len,
                    dtype=infer.session._dtype,
                    mesh=mesh,
                    **lora_kw,
                )
            self.batch_worker = BatchTextWorker(engine, infer.config.llm.eos_token_id)
        self.image_pool_worker = None
        if image_pool_slots > 0:
            from mingunivision_tpu.engine.image_pool import ImagePoolEngine

            pool = ImagePoolEngine(
                infer.params,
                infer.config,
                infer.runtime,
                slots=image_pool_slots,
                chunk=image_pool_chunk,
                mesh=getattr(infer, "mesh", None),
            )
            self.image_pool_worker = ImagePoolWorker(pool)

    # -- request handling -----------------------------------------------------

    def _get_session(self, session_id: str):
        import threading

        with self._sessions_lock:
            if session_id in self._sessions:
                self._sessions.move_to_end(session_id)
                return self._sessions[session_id]
            from mingunivision_tpu.engine.session import MingUniVisionSession

            sess = MingUniVisionSession(
                self.infer.params, self.infer.config, self.infer.runtime, mesh=getattr(self.infer, "mesh", None)
            )
            self._sessions[session_id] = sess
            self._session_locks.setdefault(session_id, threading.Lock())
            while len(self._sessions) > self.max_sessions:
                evicted_id, _ = self._sessions.popitem(last=False)
                if evicted_id == "default":  # never evict the default session
                    self._sessions["default"] = self.infer.session
                else:
                    self._session_locks.pop(evicted_id, None)
            return sess

    async def _lock_session(self, session_id: str, timeout: float = 300.0):
        """Per-session lock: a request (and a stream, across ALL its chunks)
        holds it, so concurrent requests on one session_id SERIALIZE instead of
        crossing KV state; None after `timeout` (caller responds 409).
        Acquisition polls from the EVENT-LOOP side — blocking in the executor
        would deadlock, since the single executor thread is the one the current
        holder needs for its next chunk."""
        import threading

        with self._sessions_lock:
            lock = self._session_locks.setdefault(session_id, threading.Lock())
        deadline = time.time() + timeout
        while not lock.acquire(blocking=False):
            if time.time() > deadline:
                return None
            await asyncio.sleep(0.01)
        return lock

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
        self.infer.session = self._get_session(str(payload.get("session_id", "default")))
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
            n_images=int(payload.get("n_images", 1)),
        )
        images = [_png_b64(img) for img in getattr(self.infer, "last_images", [])]
        self.stats["requests"] += 1
        self.stats["tokens"] += len(text.split())
        return {"ret_code": int(RetCode.OK), "text": text, "images": images}

    def _build_image_batches(self, requests) -> list:
        """Processor outputs for each T2I request. A request is either a
        `messages` list or {"messages": [...], "text_cfg"/"image_cfg"/
        "temperature"/"seed": ...} (per-request generation params — pool mode
        honors them per slot)."""
        batches = []
        for r in requests:
            opts = r if isinstance(r, dict) and "messages" in r else {}
            messages = opts.get("messages", r)
            messages = self._decode_images(messages)
            text = self.infer.processor.apply_chat_template(messages, add_generation_prompt=True)
            imgs = self.infer.processor.process_vision_info(messages)
            b = self.infer.processor(text=text, images=imgs)
            batches.append(
                {
                    "input_ids": b.input_ids,
                    "attention_mask": b.attention_mask,
                    "uncond_attention_mask": b.uncond_attention_mask,
                    "text_uncond_attention_mask": b.text_uncond_attention_mask,
                    "_opts": opts,
                }
            )
        return batches

    def _run_generate_image_batch(self, payload: dict) -> dict:
        """N independent T2I requests through ONE batched AR loop
        (serving/image_batch.py: block-major CFG rows amortize decode weight
        reads — measured 2.8x images/min at 4 concurrent on v5e)."""
        import jax as _jax

        from mingunivision_tpu.serving.image_batch import batched_image_generation

        requests = payload["requests"]
        batches = [{k: v for k, v in b.items() if k != "_opts"} for b in self._build_image_batches(requests)]
        seed = int(payload.get("seed", 0))
        imgs = batched_image_generation(
            self.infer.params,
            self.infer.config,
            self.infer.runtime,
            batches,
            _jax.random.PRNGKey(seed),
        )
        self.stats["requests"] += len(requests)
        return {"ret_code": int(RetCode.OK), "images": [_png_b64(im) for im in imgs]}

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
            sid = str(payload.get("session_id", "default"))
            lock = await self._lock_session(sid)
            if lock is None:
                return web.json_response(
                    {"ret_code": int(RetCode.OVERLOADED), "error": f"session {sid!r} busy"}, status=409
                )
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
                lock.release()

        async def generate_stream(request):
            """Chunked streaming: one prefill, then KV-cache CONTINUATION chunks
            via session.continue_decode — the prompt is never re-prefilled
            (the reference streams tokens the same way, talker_vllm_server.py)."""
            try:
                payload = await request.json()
            except json.JSONDecodeError:
                return web.json_response({"ret_code": int(RetCode.BAD_REQUEST)}, status=400)
            sid = str(payload.get("session_id", "default"))
            # hold the per-session lock for the WHOLE stream: two streams on one
            # session_id would interleave continue_decode chunks on shared KV
            lock = await self._lock_session(sid)
            if lock is None:
                return web.json_response(
                    {"ret_code": int(RetCode.OVERLOADED), "error": f"session {sid!r} busy"}, status=409
                )
            try:
                sse = bool(payload.get("sse", False))
                ctype = "text/event-stream" if sse else "text/plain; charset=utf-8"
                resp = web.StreamResponse(headers={"Content-Type": ctype, "Cache-Control": "no-cache"})
                await resp.prepare(request)

                def frame(piece: str, done: bool = False) -> bytes:
                    if not sse:
                        return piece.encode()
                    event = {"text": piece, "done": done}
                    return f"data: {json.dumps(event, ensure_ascii=False)}\n\n".encode()

                loop = asyncio.get_running_loop()
                chunk = int(payload.get("stream_chunk_tokens", 16))
                total = int(payload.get("max_new_tokens", 512))
                first = dict(payload)
                first["max_new_tokens"] = min(chunk, total)
                result = await loop.run_in_executor(self.executor, self._run_generate, first)
                await resp.write(frame(result["text"]))
                eos = self.infer.config.llm.eos_token_id
                emitted = chunk
                # bind this stream's session once (lock held -> no one swaps it)
                sess = self._get_session(sid)

                def _continue(n):
                    out = sess.continue_decode(n)
                    ids = out.token_ids
                    done = bool(ids) and ids[-1] == eos
                    if done:
                        ids = ids[:-1]
                    self.stats["tokens"] += len(ids)
                    return self.infer.processor.decode(ids), done or not out.token_ids

                while emitted < total:
                    piece, done = await loop.run_in_executor(
                        self.executor, _continue, min(chunk, total - emitted)
                    )
                    if piece:
                        await resp.write(frame(piece))
                    emitted += chunk
                    if done:
                        break
                if sse:
                    await resp.write(frame("", done=True))
                await resp.write_eof()
                return resp
            finally:
                lock.release()

        async def generate_batch(request):
            """Text-only generation through the continuous-batching engine —
            concurrent requests decode in the SAME jitted step."""
            if self.batch_worker is None:
                return web.json_response(
                    {"ret_code": int(RetCode.BAD_REQUEST), "error": "batching disabled (batch_slots=0)"}, status=400
                )
            try:
                payload = await request.json()
                messages = payload["messages"]
            except Exception:
                return web.json_response({"ret_code": int(RetCode.BAD_REQUEST)}, status=400)
            text = self.infer.processor.apply_chat_template(messages, add_generation_prompt=True)
            batch = self.infer.processor(text=text)
            sampling = {
                k: payload[k]
                for k in ("do_sample", "temperature", "top_k", "top_p", "lora")
                if k in payload
            }
            item = self.batch_worker.submit(
                batch.input_ids.reshape(-1), int(payload.get("max_new_tokens", 128)), sampling
            )
            loop = asyncio.get_running_loop()
            finished = await loop.run_in_executor(None, item["event"].wait, 600.0)
            if not finished:
                item["error"] = "batch worker timeout"
            if item.get("error") or item["req"] is None:
                self.stats["errors"] += 1
                return web.json_response(
                    {"ret_code": int(RetCode.INTERNAL_ERROR), "error": item.get("error", "admission failed")}, status=500
                )
            ids = item["req"].tokens
            if ids and ids[-1] == self.infer.config.llm.eos_token_id:
                ids = ids[:-1]
            self.stats["requests"] += 1
            self.stats["tokens"] += len(ids)
            return web.json_response({"ret_code": int(RetCode.OK), "text": self.infer.processor.decode(ids)})

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
        app.router.add_post("/generate_batch", generate_batch)

        async def generate_image_batch(request):
            try:
                payload = await request.json()
                if not payload.get("requests"):
                    return web.json_response({"ret_code": int(RetCode.BAD_REQUEST), "error": "missing requests"}, status=400)
            except json.JSONDecodeError:
                return web.json_response({"ret_code": int(RetCode.BAD_REQUEST), "error": "invalid json"}, status=400)
            loop = asyncio.get_running_loop()
            if self.image_pool_worker is not None:
                # continuous admission: each request lands in a pool slot as
                # one frees up — concurrent POSTs co-schedule mid-generation
                import jax as _jax

                try:
                    batches = await loop.run_in_executor(
                        self.executor, self._build_image_batches, payload["requests"]
                    )
                except Exception as e:  # noqa: BLE001
                    self.stats["errors"] += 1
                    return web.json_response({"ret_code": int(RetCode.INTERNAL_ERROR), "error": str(e)}, status=500)
                seed = int(payload.get("seed", 0))
                items = []
                for i, b in enumerate(batches):
                    opts = b.pop("_opts", {})
                    key = _jax.random.PRNGKey(int(opts.get("seed", seed + i)))
                    gen = {k: float(opts[k]) for k in ("text_cfg", "image_cfg", "temperature") if k in opts}
                    items.append(self.image_pool_worker.submit(b, key, gen))
                images = []
                for item in items:
                    ok = await loop.run_in_executor(None, item["event"].wait, 600.0)
                    if not ok:
                        item["error"] = "image pool timeout"
                    if item.get("error"):
                        self.stats["errors"] += 1
                        return web.json_response(
                            {"ret_code": int(RetCode.INTERNAL_ERROR), "error": item["error"]}, status=500
                        )
                    images.append(_png_b64(item["req"].image))
                self.stats["requests"] += len(items)
                self.stats["images"] += len(items)
                return web.json_response({"ret_code": int(RetCode.OK), "images": images})
            try:
                result = await loop.run_in_executor(self.executor, self._run_generate_image_batch, payload)
                return web.json_response(result)
            except Exception as e:  # noqa: BLE001
                self.stats["errors"] += 1
                return web.json_response({"ret_code": int(RetCode.INTERNAL_ERROR), "error": str(e)}, status=500)

        app.router.add_post("/generate_image_batch", generate_image_batch)
        app.router.add_post("/tts", tts)
        return app

    def run(self):  # pragma: no cover - blocking entry
        from aiohttp import web

        web.run_app(self.build_app(), host=self.host, port=self.port)
