"""End-to-end LM pre-training driver for the Bailing-MoE stack.

The reference repo is inference-only; this driver wires the training surface
this framework adds (SURVEY §5 checkpoint/resume; engine/train.py) into a
runnable loop:

  - donated TrainState steps (params + adamw moments updated in place),
  - warmup-cosine schedule + gradient accumulation,
  - router auxiliary losses (switch balance / z) forwarded into lm_loss,
  - async Orbax checkpoints every --ckpt-every steps (the loop keeps stepping
    while the previous checkpoint serializes) and --resume restore,
  - StepTimer wall-clock stats + one JSON log line per --log-every steps.

Data: --data points at a flat binary/npy of token ids (np.memmap, any int
dtype); without it a deterministic synthetic stream with learnable structure
(repeating n-gram patterns) is used, so smoke runs still show loss descent.

CPU smoke (tiny config, a few seconds):
  python examples/train_lm.py --tiny --steps 30 --allow-cpu

One-chip v5e at the real 16B-A3B width (1 layer, bf16):
  python examples/train_lm.py --layers 1 --steps 100 --ckpt-dir /tmp/lm_ckpt
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--allow-cpu" in sys.argv:
    # under axon the env-var route is overridden by sitecustomize (CLAUDE.md);
    # this must run before any device use
    jax.config.update("jax_platforms", "cpu")
    _mesh_arg = next(
        (
            sys.argv[i].split("=", 1)[1] if "=" in sys.argv[i] else sys.argv[i + 1]
            for i in range(len(sys.argv))
            if sys.argv[i] == "--mesh" or sys.argv[i].startswith("--mesh=")
        ),
        None,
    )
    if _mesh_arg:
        # virtual multi-device CPU for sharded smoke runs (before backend init)
        n = 1
        for v in _mesh_arg.split(","):
            n *= int(v)
        jax.config.update("jax_num_cpu_devices", max(n, 1))

import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


class TokenStream:
    """Batched (B, T)-window sampler over a flat token-id array (lm_loss
    shifts inputs/targets internally — feed T tokens, not T+1).

    With a --data file: np.memmap windows at rng-chosen offsets (.npy keeps
    its stored dtype; raw binaries read as --data-dtype). Without: a synthetic
    stream of repeated vocab-patterns (period 97) + noise, which a 1-layer
    model can partially predict — loss descent is visible in smoke runs,
    unlike uniform-random tokens whose optimal loss is log(V)."""

    def __init__(self, path, vocab_size: int, seed: int = 0, data_dtype: str = "uint32"):
        self.rng = np.random.default_rng(seed)
        self.vocab = vocab_size
        if path:
            self.ids = np.load(path, mmap_mode="r") if path.endswith(".npy") else np.memmap(path, dtype=np.dtype(data_dtype), mode="r")
        else:
            base = self.rng.integers(0, vocab_size, 97)
            reps = np.tile(base, 4096 // 97 + 2)[:4096 * 2]
            noise = self.rng.integers(0, vocab_size, reps.shape)
            keep = self.rng.random(reps.shape) < 0.9
            self.ids = np.where(keep, reps, noise).astype(np.uint32)

    def batch(self, B: int, T: int) -> np.ndarray:
        if len(self.ids) < T + 1:
            raise ValueError(f"data stream has {len(self.ids)} tokens; need at least seq+1 = {T + 1}")
        starts = self.rng.integers(0, len(self.ids) - T + 1, B)
        return np.stack([np.asarray(self.ids[s : s + T]) for s in starts]).astype(np.int32)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny config (CPU smoke)")
    ap.add_argument("--allow-cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--balance-alpha", type=float, default=0.01)
    ap.add_argument("--z-alpha", type=float, default=1e-4)
    ap.add_argument("--mesh", default=None, help="dp,ep,tp device mesh, e.g. 2,2,2")
    ap.add_argument("--remat", action="store_true", help="rematerialize layers in backward (fit deeper stacks)")
    ap.add_argument("--data", default=None)
    ap.add_argument("--data-dtype", default="uint32", help="dtype of raw-binary --data files (.npy keeps its own)")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--ckpt-every", type=int, default=50)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    from mingunivision_tpu.engine.train import (
        TrainState,
        make_scheduled_optimizer,
        make_train_step,
    )
    from mingunivision_tpu.models.bailing_moe import init_bailing_moe_params
    from mingunivision_tpu.utils.checkpoint import AsyncTrainCheckpointer
    from mingunivision_tpu.utils.profiling import StepTimer, force_sync

    if args.tiny:
        from mingunivision_tpu.config import tiny_llm_config

        cfg = tiny_llm_config()
        args.batch, args.seq = 2, 64
    else:
        from mingunivision_tpu.config import BailingMoeConfig

        cfg = BailingMoeConfig(num_hidden_layers=args.layers)
    if args.remat:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, remat_layers=True)

    import contextlib

    mesh = None
    if args.mesh:
        import dataclasses

        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        dp, ep, tp = (int(v) for v in args.mesh.split(","))
        devs = np.array(jax.devices()[: dp * ep * tp]).reshape(dp, ep, tp)
        mesh = Mesh(devs, ("data", "expert", "model"))
        # route the sharded MoE dispatch (TPU: fused sharded kernel with the
        # custom_vjp training path; aux losses shard per __graft_entry__ dryrun)
        cfg = dataclasses.replace(cfg, expert_tables_sharded=True, expert_mesh=mesh)
        mesh_ctx = lambda: mesh
        data_sharding = NamedSharding(mesh, P("data", None))
        put = lambda a: jax.device_put(a, data_sharding)
    else:
        mesh_ctx = contextlib.nullcontext
        put = lambda a: a

    warmup = min(args.warmup, max(args.steps // 2, 1))  # keep decay_steps > 0
    opt = make_scheduled_optimizer(args.lr, warmup, args.steps)
    params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if mesh is not None:
        from mingunivision_tpu.parallel.sharding import llm_param_shardings

        params = jax.tree_util.tree_map(jax.device_put, params, llm_param_shardings(params, mesh))
    state = TrainState(params, opt.init(params), jnp.int32(0))
    del params
    step = make_train_step(
        cfg, opt, accum_steps=args.accum,
        balance_alpha=args.balance_alpha, z_alpha=args.z_alpha,
    )

    ckptr = AsyncTrainCheckpointer() if args.ckpt_dir else None
    start_step = 0
    if ckptr and args.resume:
        latest = _latest_ckpt(args.ckpt_dir)
        if latest is not None:
            state = ckptr.restore(latest, template=state)
            start_step = int(state.step)
            print(f"resumed from {latest} at step {start_step}", flush=True)

    stream = TokenStream(args.data, cfg.vocab_size, seed=start_step, data_dtype=args.data_dtype)
    timer = StepTimer()
    losses = []
    mask = put(jnp.ones((args.batch, args.seq), jnp.int32))  # constant: hoisted
    for i in range(start_step, args.steps):
        ids = put(jnp.asarray(stream.batch(args.batch, args.seq)))
        with timer.time("step"), mesh_ctx():
            state, loss = step(state, ids, mask)
            # host sync for honest wall-clock (axon block_until_ready is a no-op)
            l = force_sync(loss)
        losses.append(l)
        if (i + 1) % args.log_every == 0 or i + 1 == args.steps:
            s = timer.summary()["step"]
            print(
                json.dumps(
                    {
                        "step": i + 1,
                        "loss": round(float(np.mean(losses[-args.log_every :])), 4),
                        "ms_per_step": round(s["p50_ms"], 1),
                        "tok_per_s": round(args.batch * args.seq / (s["p50_ms"] / 1e3)),
                    }
                ),
                flush=True,
            )
        if ckptr and (i + 1) % args.ckpt_every == 0:
            # async: blocks only for the device->host snapshot, then the loop
            # keeps stepping (donation is safe — orbax copied already)
            ckptr.save(os.path.join(args.ckpt_dir, f"step_{i + 1:07d}"), state)
    if ckptr:
        if args.steps % args.ckpt_every != 0:  # not already written above
            ckptr.save(os.path.join(args.ckpt_dir, f"step_{args.steps:07d}"), state)
        ckptr.close()
    return losses


def _latest_ckpt(ckpt_dir):
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


if __name__ == "__main__":
    main()
