"""MingTok reconstruction demo — the analog of the reference recon smoke test
(mingunivision/test_infer_recon_image.py): load an image, encode -> decode,
save the reconstruction.

Usage:
  python examples/test_infer_recon_image.py --image path.png [--ckpt DIR] [--out recon.png]

Without --ckpt, runs with random weights (pipeline smoke; output is noise).
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", required=True)
    ap.add_argument("--ckpt", default=None, help="MingTok checkpoint dir (torch/safetensors)")
    ap.add_argument("--out", default="recon.png")
    args = ap.parse_args()

    from mingunivision_tpu.config import MingTokConfig
    from mingunivision_tpu.models.mingtok import init_mingtok_params, mingtok_enc_dec
    from mingunivision_tpu.processing.image_ops import preprocess_generation, save_image_with_suffix

    cfg = MingTokConfig()
    if args.ckpt:
        from mingunivision_tpu.utils.checkpoint import load_torch_state_dict
        from mingunivision_tpu.utils.convert import mingtok_params_from_torch

        params = mingtok_params_from_torch(load_torch_state_dict(args.ckpt), cfg)
        params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    else:
        print("no --ckpt: random weights (smoke run)")
        params = init_mingtok_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    x = preprocess_generation(args.image, image_size=512)[None]  # (1, 3, 512, 512)
    recon = jax.jit(lambda p, im: mingtok_enc_dec(p, cfg, im))(params, jnp.asarray(x))
    name = save_image_with_suffix(np.asarray(recon[0]), args.out.removesuffix(".png"))
    print(f"saved {name}")


if __name__ == "__main__":
    main()
