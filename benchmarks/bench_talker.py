"""Talker micro-benchmarks: single-request token latency + N-way concurrent
token counts (reference talker/vllm_infer.py:129-186, sync_vllm_infer.py:121-148
analogs).

Usage: python benchmarks/bench_talker.py [--tiny] [--concurrency 8]
"""

import argparse
import json
import sys
import threading
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def build_talker(tiny: bool):
    from mingunivision_tpu.talker.model import BailingTalker, TalkerConfig
    from mingunivision_tpu.talker.qwen2 import Qwen2Config

    if tiny:
        cfg = TalkerConfig(
            qwen2=Qwen2Config(
                vocab_size=192, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2, head_dim=16, intermediate_size=128,
            ),
            text_vocab_size=128, audio_vocab_size=64, qa_model_hidden_size=32,
            vp_feature_size=8, max_audio_tokens=32,
        )
    else:
        cfg = TalkerConfig()
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    return BailingTalker.random_init(jax.random.PRNGKey(0), cfg, dtype=dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--requests", type=int, default=16)
    args = ap.parse_args()

    talker = build_talker(args.tiny)
    cfg = talker.cfg
    rng = np.random.default_rng(0)

    def one_request(seed=0):
        ids = rng.integers(0, cfg.text_vocab_size, (1, 8))
        t0 = time.perf_counter()
        codec = talker.generate_audio_tokens(ids, max_len=256)
        dt = time.perf_counter() - t0
        return len(codec), dt

    # warm compile
    one_request()

    # single-request token latency
    n, dt = one_request()
    print(json.dumps({"bench": "talker_single_request", "tokens": n, "seconds": round(dt, 3),
                      "ms_per_token": round(dt / max(n, 1) * 1e3, 2)}), flush=True)

    # concurrent requests (device work serializes; measures scheduling overhead)
    results = []
    lock = threading.Lock()

    def worker():
        r = one_request()
        with lock:
            results.append(r)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(args.concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    total_tokens = sum(r[0] for r in results)
    print(json.dumps({"bench": "talker_concurrent", "concurrency": args.concurrency,
                      "total_tokens": total_tokens, "wall_s": round(wall, 3),
                      "tokens_per_s": round(total_tokens / wall, 1)}), flush=True)


if __name__ == "__main__":
    main()
