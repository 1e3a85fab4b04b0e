"""Serving layer test: in-process aiohttp server over the tiny model."""

import asyncio
import json

import numpy as np
import pytest

aiohttp = pytest.importorskip("aiohttp")


@pytest.fixture(scope="module")
def tiny_infer():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from examples.test_infer_unified import build_tiny_infer

    return build_tiny_infer()


def test_server_endpoints(tiny_infer):
    from aiohttp.test_utils import TestClient, TestServer

    from mingunivision_tpu.serving.server import InferenceServer

    srv = InferenceServer(tiny_infer)
    app = srv.build_app()

    async def run():
        async with TestClient(TestServer(app)) as client:
            r = await client.get("/health")
            assert r.status == 200
            health = await r.json()
            assert health["status"] == "healthy"

            r = await client.post(
                "/generate",
                json={
                    "messages": [{"role": "HUMAN", "content": [{"type": "text", "text": "hi"}]}],
                    "max_new_tokens": 4,
                    "reset": True,
                },
            )
            assert r.status == 200
            out = await r.json()
            assert out["ret_code"] == 0
            assert isinstance(out["text"], str)

            # malformed json -> 400
            r = await client.post("/generate", data=b"not json", headers={"Content-Type": "application/json"})
            assert r.status == 400

            # missing messages -> 400
            r = await client.post("/generate", json={"max_new_tokens": 4})
            assert r.status == 400

            r = await client.get("/metrics")
            m = await r.json()
            assert m["requests"] >= 1

    asyncio.run(run())
