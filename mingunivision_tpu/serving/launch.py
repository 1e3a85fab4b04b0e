"""Server launcher: `python -m mingunivision_tpu.serving.launch --ckpt DIR --port P`."""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--port", type=int, default=8816)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--dtype", choices=["bf16", "int8", "int4"], default="bf16", help="weight tier (reference app.py --dtype)")
    ap.add_argument("--mesh", action="store_true", help="shard over all local devices (TP/EP) — required for bf16 16B on 16 GB chips")
    ap.add_argument("--batch-slots", type=int, default=0, help="enable /generate_batch with N continuous-batching slots")
    args = ap.parse_args()

    if args.tiny or not args.ckpt or args.ckpt == "None":
        import os
        import sys

        sys.path.insert(0, os.getcwd())
        from examples.test_infer_unified import build_tiny_infer

        infer = build_tiny_infer()
    else:
        from mingunivision_tpu.api import MingUniVisionInfer
        from mingunivision_tpu.config import RuntimeConfig

        mesh = None
        if args.mesh:
            from mingunivision_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
        runtime = RuntimeConfig(param_dtype={"bf16": "bfloat16", "int8": "int8", "int4": "int4"}[args.dtype])
        infer = MingUniVisionInfer(args.ckpt, runtime=runtime, mesh=mesh)

    from mingunivision_tpu.serving.server import InferenceServer

    InferenceServer(infer, host=args.host, port=args.port, batch_slots=args.batch_slots).run()


if __name__ == "__main__":
    main()
