"""MingTok reconstruction evaluation: PSNR / SSIM (+ optional feature-FID) over
an image folder — the BASELINE.md acceptance gate runner (PSNR 30.77 / SSIM
0.62 / rFID 0.54 at 512px on ImageNet-val-50k).

Usage:
  python benchmarks/eval_recon.py --images DIR [--ckpt DIR] [--limit N] [--batch 8]

Without --ckpt, runs random weights (pipeline smoke; metrics are meaningless).
rFID additionally needs an Inception embedder — plug one in via --embedder
(a python path to `fn(images_chw_float) -> features`); offline images lack one.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def iter_images(folder, limit=None):
    exts = (".png", ".jpg", ".jpeg", ".bmp", ".webp")
    n = 0
    for root, _, files in os.walk(folder):
        for f in sorted(files):
            if f.lower().endswith(exts):
                yield os.path.join(root, f)
                n += 1
                if limit and n >= limit:
                    return


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mingunivision_tpu.config import MingTokConfig
    from mingunivision_tpu.models.mingtok import init_mingtok_params, mingtok_enc_dec
    from mingunivision_tpu.processing.image_ops import preprocess_generation
    from mingunivision_tpu.utils.metrics import psnr, ssim

    cfg = MingTokConfig()
    if args.ckpt:
        from mingunivision_tpu.utils.checkpoint import load_torch_state_dict
        from mingunivision_tpu.utils.convert import mingtok_params_from_torch

        params = mingtok_params_from_torch(load_torch_state_dict(args.ckpt), cfg)
        params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    else:
        print("WARNING: random weights (smoke run)", file=sys.stderr)
        params = init_mingtok_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    f = jax.jit(lambda p, x: mingtok_enc_dec(p, cfg, x))
    psnrs, ssims, n = [], [], 0
    batch = []
    for path in iter_images(args.images, args.limit):
        batch.append(preprocess_generation(path, image_size=args.size))
        if len(batch) == args.batch:
            x = np.stack(batch)
            y = np.asarray(jax.device_get(f(params, jnp.asarray(x))), np.float32)
            for i in range(len(batch)):
                psnrs.append(psnr(x[i], y[i]))
                ssims.append(ssim(x[i], y[i]))
            n += len(batch)
            batch = []
            print(f"\r{n} images  PSNR {np.mean(psnrs):.2f}  SSIM {np.mean(ssims):.3f}", end="", file=sys.stderr)
    if batch:
        x = np.stack(batch)
        y = np.asarray(jax.device_get(f(params, jnp.asarray(x))), np.float32)
        for i in range(len(batch)):
            psnrs.append(psnr(x[i], y[i]))
            ssims.append(ssim(x[i], y[i]))
        n += len(batch)
    print(file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "mingtok_recon_quality",
                "images": n,
                "psnr": round(float(np.mean(psnrs)), 3) if psnrs else None,
                "ssim": round(float(np.mean(ssims)), 4) if ssims else None,
                "baseline_psnr": 30.77,
                "baseline_ssim": 0.62,
            }
        )
    )


if __name__ == "__main__":
    main()
