"""Server launcher: `python -m mingunivision_tpu.serving.launch --ckpt DIR --port P`."""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--port", type=int, default=8816)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    if args.tiny or not args.ckpt or args.ckpt == "None":
        import os
        import sys

        sys.path.insert(0, os.getcwd())
        from examples.test_infer_unified import build_tiny_infer

        infer = build_tiny_infer()
    else:
        from mingunivision_tpu.api import MingUniVisionInfer

        infer = MingUniVisionInfer(args.ckpt)

    from mingunivision_tpu.serving.server import InferenceServer

    InferenceServer(infer, host=args.host, port=args.port).run()


if __name__ == "__main__":
    main()
