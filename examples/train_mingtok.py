"""MingTok joint pre-training driver (pixel reconstruction + semantic distill).

Wires the tokenizer training surface end-to-end:

  - engine/train.mingtok_train_loss (pixel recon + optional feature distill —
    the reference trains MingTok with these objectives,
    vision_transformer.py:529-570; SURVEY §2.1),
  - the native prefetch queue (utils/native_io.PrefetchQueue): uint8 HWC
    batches normalize to fp32 CHW on C++ worker threads one step AHEAD of the
    device, overlapping host preprocessing with the train step,
  - donated (params, opt_state) carry + async Orbax checkpoints.

Data: --data points at a directory of images (any size; short-side resize +
center crop, torchvision semantics) or an .npy of uint8 NHWC images. Without
it, a synthetic structured image stream keeps smoke runs meaningful.
--feature-weight > 0 adds the semantic-distillation term; the frozen-teacher
targets come from --teacher, an .npy of (N_images, N_tokens, feature_dim)
aligned index-for-index with the --data .npy (required in that combination).

CPU smoke:  python examples/train_mingtok.py --tiny --steps 10 --allow-cpu
One v5e:    python examples/train_mingtok.py --steps 200 --batch 2
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--allow-cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")  # before any device use (CLAUDE.md)

import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def synthetic_batch(rng, B: int, S: int) -> np.ndarray:
    """uint8 (B, S, S, 3) with learnable low-frequency structure."""
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32) / S
    out = np.empty((B, S, S, 3), np.uint8)
    for i in range(B):
        fx, fy = rng.uniform(0.5, 3.0, 2)
        phase = rng.uniform(0, 2 * np.pi, 3)
        for c in range(3):
            img = 0.5 + 0.5 * np.sin(2 * np.pi * (fx * xx + fy * yy) + phase[c])
            out[i, :, :, c] = (img * 255).astype(np.uint8)
    return out


class ImageStream:
    def __init__(self, path, S: int, seed: int = 0):
        self.rng = np.random.default_rng(seed)
        self.S = S
        self.arr = None
        self.files = None
        if path and path.endswith(".npy"):
            self.arr = np.load(path, mmap_mode="r")  # (N, H, W, 3) uint8
        elif path:
            self.files = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
            )

    def _load_crop(self, f) -> np.ndarray:
        # short-side resize + center crop (torchvision semantics, kept uint8 —
        # normalization happens on the native prefetch threads)
        from PIL import Image

        pil = Image.open(f).convert("RGB")
        w, h = pil.size
        S = self.S
        nw, nh = (S, max(1, round(S * h / w))) if w < h else (max(1, round(S * w / h)), S)
        pil = pil.resize((nw, nh), Image.BICUBIC)
        left, top = round((nw - S) / 2.0), round((nh - S) / 2.0)
        return np.asarray(pil.crop((left, top, left + S, top + S)), np.uint8)

    def batch(self, B: int):
        """-> (uint8 (B, S, S, 3) images, (B,) source indices) — indices align
        teacher-feature rows with their images for the distill term."""
        if self.arr is not None:
            idx = self.rng.integers(0, len(self.arr), B)
            return np.stack([np.asarray(self.arr[i]) for i in idx]), idx
        if self.files:
            idx = self.rng.integers(0, len(self.files), B)
            return np.stack([self._load_crop(self.files[i]) for i in idx]), idx
        return synthetic_batch(self.rng, B, self.S), np.zeros((B,), np.int64)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--allow-cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--feature-weight", type=float, default=0.0, help=">0 adds distill vs the --teacher features")
    ap.add_argument("--teacher", default=None, help=".npy (N_images, N_tokens, feat_dim) frozen-teacher features, aligned with --data .npy")
    ap.add_argument("--data", default=None)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--ckpt-every", type=int, default=50)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--prefetch-threads", type=int, default=2)
    ap.add_argument("--remat", action="store_true", help="rematerialize ViT blocks in backward")
    args = ap.parse_args(argv)

    import functools

    import optax

    from mingunivision_tpu.engine.train import mingtok_train_loss
    from mingunivision_tpu.models.mingtok import init_mingtok_params
    from mingunivision_tpu.utils.checkpoint import AsyncTrainCheckpointer
    from mingunivision_tpu.utils.native_io import PrefetchQueue
    from mingunivision_tpu.utils.profiling import StepTimer, force_sync

    if args.tiny:
        from mingunivision_tpu.config import tiny_mingtok_config

        cfg = tiny_mingtok_config()
        args.batch = 1
    else:
        from mingunivision_tpu.config import MingTokConfig

        cfg = MingTokConfig()
    S = cfg.encoder.img_size

    params = init_mingtok_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    opt = optax.adamw(args.lr)
    carry = (params, opt.init(params))
    del params

    teacher_bank = None
    if args.feature_weight > 0:
        if not args.teacher:
            sys.exit("--feature-weight > 0 requires --teacher (frozen-teacher feature .npy)")
        teacher_bank = np.load(args.teacher, mmap_mode="r")

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("with_teacher",))
    def step(carry, imgs, teacher, with_teacher: bool):
        params, opt_state = carry
        (loss, metrics), grads = jax.value_and_grad(mingtok_train_loss, has_aux=True)(
            params, cfg, imgs, teacher if with_teacher else None,
            feature_weight=args.feature_weight if with_teacher else 1.0,
            remat=args.remat,
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), (loss, metrics)

    ckptr = AsyncTrainCheckpointer() if args.ckpt_dir else None
    stream = ImageStream(args.data, S)
    # normalization runs on native worker threads one batch AHEAD of the device
    pq = PrefetchQueue(num_threads=args.prefetch_threads)
    pending_idx = {}  # ticket -> source indices (pops can reorder across threads)

    def submit():
        imgs, idx = stream.batch(args.batch)
        pending_idx[pq.submit(imgs)] = idx

    def teacher_for(idx):
        if teacher_bank is None:
            return jnp.zeros((args.batch, 0, 0), jnp.float32)  # unused
        return jnp.asarray(np.stack([np.asarray(teacher_bank[i]) for i in idx]), jnp.bfloat16)

    submit()
    timer = StepTimer()
    losses = []
    for i in range(args.steps):
        ticket, imgs = pq.get(block=True)
        idx = pending_idx.pop(ticket)
        submit()  # overlap with this step
        with timer.time("step"):
            carry, (loss, _) = step(carry, jnp.asarray(imgs), teacher_for(idx), teacher_bank is not None)
            l = force_sync(loss)
        losses.append(l)
        if (i + 1) % args.log_every == 0 or i + 1 == args.steps:
            s = timer.summary()["step"]
            print(
                json.dumps(
                    {
                        "step": i + 1,
                        "loss": round(float(np.mean(losses[-args.log_every :])), 5),
                        "ms_per_step": round(s["p50_ms"], 1),
                        "img_per_s": round(args.batch / (s["p50_ms"] / 1e3), 2),
                    }
                ),
                flush=True,
            )
        if ckptr and (i + 1) % args.ckpt_every == 0:
            ckptr.save(os.path.join(args.ckpt_dir, f"step_{i + 1:07d}"), carry[0])
    pq.close()
    if ckptr:
        if args.steps % args.ckpt_every != 0:
            ckptr.save(os.path.join(args.ckpt_dir, f"step_{args.steps:07d}"), carry[0])
        ckptr.close()
    return losses


if __name__ == "__main__":
    main()
