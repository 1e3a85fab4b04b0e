"""Convert a Ming-UniVision HF checkpoint to the native TPU layout.

Usage:
  python tools/convert_checkpoint.py --src /path/Ming-UniVision-16B-A3B \
      --mingtok /path/MingTok-Vision --out /path/native_ckpt [--dtype bf16]

Reads the composed HF checkpoint (safetensors shards, torch layout), converts
every subsystem through utils/convert.py (fused-QKV kept fused, SwiGLU w12 kept
packed, experts stacked per layer, depth-stacked for lax.scan) and writes one
Orbax checkpoint that `MingUniVisionInfer` restores directly.

The MingTok tower ships as a separate HF repo (reference hardcodes
./models/MingTok-Vision, modeling_bailingmm.py:102) — pass --mingtok; when the
composed checkpoint embeds `vision.*` weights, --mingtok is optional.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert(src: str, out: str, mingtok: str | None = None, dtype: str = "bf16") -> dict:
    import jax.numpy as jnp
    import jax

    from mingunivision_tpu.config import MingUniVisionConfig
    from mingunivision_tpu.utils.checkpoint import load_torch_state_dict, save_pytree
    from mingunivision_tpu.utils.convert import (
        bailing_moe_params_from_torch,
        linear_proj_params_from_torch,
        mingtok_params_from_torch,
        rf_head_params_from_torch,
        vis_head_params_from_torch,
    )
    from mingunivision_tpu.utils.dtypes import resolve_dtype

    cfg = MingUniVisionConfig()
    sd = load_torch_state_dict(src)

    def sub(prefix):
        n = len(prefix)
        return {k[n:]: v for k, v in sd.items() if k.startswith(prefix)}

    vision_sd = sub("vision.")
    if not vision_sd:
        if mingtok is None:
            raise SystemExit("checkpoint has no vision.* weights; pass --mingtok DIR")
        vision_sd = load_torch_state_dict(mingtok)

    params = {
        "mingtok": mingtok_params_from_torch(vision_sd, cfg.mingtok),
        "llm": bailing_moe_params_from_torch(sub("model."), cfg.llm, root="model"),
        "rf_head": rf_head_params_from_torch(sub("model."), cfg.rf_head, root="diffloss.net"),
        "vis_head": vis_head_params_from_torch(sub("model."), root="vis_head"),
        "linear_proj": linear_proj_params_from_torch(sd, cfg.mlp_depth, root="linear_proj"),
    }
    dt = resolve_dtype(dtype)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dt), params)
    save_pytree(out, params)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--mingtok", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()
    params = convert(args.src, args.out, args.mingtok, args.dtype)
    from mingunivision_tpu.utils.pytree import tree_param_count

    print(f"converted {tree_param_count(params)/1e9:.2f}B params -> {args.out}")


if __name__ == "__main__":
    main()
