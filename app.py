"""Chat app — the analog of the reference Gradio demo (reference app.py).

Keyword-based intent routing over the four workloads (generate / edit /
understand / chat, reference app.py:45-53), multi-round edit as chained
for_edit calls (:72-103), uploaded-image chat state (:135-153).

Gradio is not in this image, so the UI is gated: with gradio installed the same
handlers serve a web UI; otherwise an interactive REPL provides the identical
flows ("/image PATH" attaches an image, "/reset" clears the session).

Usage: python app.py --ckpt DIR [--dtype bf16|int8] | python app.py --tiny
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GEN_KEYWORDS = ("generate", "draw", "create an image", "画", "生成")
EDIT_KEYWORDS = ("edit", "change", "modify", "replace", "改", "编辑")


def route_intent(text: str, has_image: bool) -> str:
    t = text.lower()
    if any(k in t for k in EDIT_KEYWORDS) and has_image:
        return "edit"
    if any(k in t for k in GEN_KEYWORDS) and not has_image:
        return "generate"
    if has_image:
        return "understand"
    return "chat"


class ChatApp:
    def __init__(self, infer):
        self.infer = infer
        self.image = None
        self.round = 0

    def reset(self):
        self.infer.reset_inner_state()
        self.image = None
        self.round = 0

    def step(self, text: str, image=None) -> str:
        if image is not None:
            self.image = image
        intent = route_intent(text, self.image is not None)
        content = []
        if self.image is not None and intent in ("understand", "edit"):
            content.append({"type": "image", "image": self.image})
            self.image = None  # consumed into context
        content.append({"type": "text", "text": text})
        messages = [{"role": "HUMAN", "content": content}]
        prefix = f"app_out_{self.round}"
        self.round += 1
        if intent == "edit":
            # reference chains 3 for_edit rounds: region -> edit -> refine (:72-103)
            out = self.infer.generate(messages, for_edit=True, output_image_prefix=prefix + "_region")
            out = self.infer.generate(
                [{"role": "HUMAN", "content": [{"type": "text", "text": text}]}],
                for_edit=True,
                output_image_prefix=prefix + "_edit",
            )
            out = self.infer.generate(
                [{"role": "HUMAN", "content": [{"type": "text", "text": "refine the result"}]}],
                for_edit=True,
                output_image_prefix=prefix + "_refine",
            )
            return out
        return self.infer.generate(messages, output_image_prefix=prefix, for_edit=False)


def find_free_port(start: int = 7860, tries: int = 20) -> int:
    import socket

    for p in range(start, start + tries):
        with socket.socket() as s:
            try:
                s.bind(("0.0.0.0", p))
                return p
            except OSError:
                continue
    raise RuntimeError("no free port")


def run_cli(app: ChatApp):
    print("ming-univision-tpu chat. Commands: /image PATH, /reset, /quit")
    while True:
        try:
            line = input("> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not line:
            continue
        if line == "/quit":
            break
        if line == "/reset":
            app.reset()
            print("(session reset)")
            continue
        if line.startswith("/image "):
            from PIL import Image

            app.image = Image.open(line.split(" ", 1)[1]).convert("RGB")
            print("(image attached)")
            continue
        print(app.step(line))


def run_gradio(app: ChatApp):  # pragma: no cover - optional dependency
    import gradio as gr

    def fn(message, history, image):
        return app.step(message, image)

    demo = gr.Interface(
        fn=fn,
        inputs=[gr.Textbox(), gr.State(), gr.Image(type="pil")],
        outputs=gr.Textbox(),
        title="Ming-UniVision (TPU)",
    )
    demo.launch(server_port=find_free_port())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "int8", "int4"])
    ap.add_argument("--tiny", action="store_true", help="random tiny model (smoke)")
    args = ap.parse_args()

    if args.tiny or not args.ckpt:
        from examples.test_infer_unified import build_tiny_infer

        infer = build_tiny_infer()
    else:
        from mingunivision_tpu.api import MingUniVisionInfer
        from mingunivision_tpu.config import RuntimeConfig

        rt = RuntimeConfig(param_dtype={"bf16": "bfloat16", "int8": "int8", "int4": "int4"}[args.dtype])
        infer = MingUniVisionInfer(args.ckpt, runtime=rt)

    app = ChatApp(infer)
    try:
        import gradio  # noqa

        run_gradio(app)
    except ImportError:
        run_cli(app)


if __name__ == "__main__":
    main()
