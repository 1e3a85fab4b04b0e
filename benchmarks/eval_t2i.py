"""GenEval / DPG-Bench T2I evaluation harness (BASELINE.md gates: GenEval 0.85,
DPG 82.12; reference numbers from README.md:690-699).

Both benchmarks score generated images with EXTERNAL detectors (GenEval:
mmdetection Mask2Former; DPG: mPLUG VQA) that don't ship in this image — the
harness therefore splits cleanly:

  1. prompt suites   — GenEval's six categories (built-in structured subset
                       mirroring the official generation protocol: 4 images per
                       prompt) and a DPG-style dense-prompt list; official
                       prompt files drop in via --prompts.
  2. generation      — drives MingUniVisionInfer.generate per prompt, saves
                       PNGs + a manifest.jsonl in the official layouts
                       (GenEval: <outdir>/<idx>/samples/0000.png + metadata.jsonl)
                       so the upstream scorers run unmodified.
  3. scoring hook    — `score_manifest(manifest, scorer)` applies any callable
                       `scorer(image_path, prompt_meta) -> dict` and aggregates
                       per-category means; plug the official detectors in here.

Usage:
  python benchmarks/eval_t2i.py --model /path/to/ckpt --suite geneval --out /tmp/geneval
  python benchmarks/eval_t2i.py --suite geneval --dry-run   # prompts + layout only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Callable, Dict, List, Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# GenEval category templates (object_counts/colors/positions per the official
# generation protocol; a representative built-in subset — the official
# evaluation_metadata.jsonl drops in via --prompts)
_OBJECTS = ["cat", "dog", "car", "bicycle", "bench", "cup", "clock", "vase"]
_COLORS = ["red", "blue", "green", "yellow", "purple", "white"]
_POSITIONS = ["left of", "right of", "above", "below"]


def geneval_prompts(per_category: int = 8) -> List[Dict]:
    out = []
    for i in range(per_category):
        o1, o2 = _OBJECTS[i % len(_OBJECTS)], _OBJECTS[(i + 3) % len(_OBJECTS)]
        c1, c2 = _COLORS[i % len(_COLORS)], _COLORS[(i + 2) % len(_COLORS)]
        pos = _POSITIONS[i % len(_POSITIONS)]
        n = 2 + i % 3
        out += [
            {"tag": "single_object", "prompt": f"a photo of a {o1}", "include": [{"class": o1, "count": 1}]},
            {"tag": "two_object", "prompt": f"a photo of a {o1} and a {o2}", "include": [{"class": o1, "count": 1}, {"class": o2, "count": 1}]},
            {"tag": "counting", "prompt": f"a photo of {n} {o1}s", "include": [{"class": o1, "count": n}]},
            {"tag": "colors", "prompt": f"a photo of a {c1} {o1}", "include": [{"class": o1, "count": 1, "color": c1}]},
            {"tag": "position", "prompt": f"a photo of a {o1} {pos} a {o2}", "include": [{"class": o1, "count": 1}, {"class": o2, "count": 1, "position": pos}]},
            {"tag": "color_attr", "prompt": f"a photo of a {c1} {o1} and a {c2} {o2}", "include": [{"class": o1, "count": 1, "color": c1}, {"class": o2, "count": 1, "color": c2}]},
        ]
    return out


def dpg_prompts(n: int = 24) -> List[Dict]:
    """DPG-style dense prompts (multi-entity, attribute+relation rich)."""
    out = []
    for i in range(n):
        o1, o2 = _OBJECTS[i % len(_OBJECTS)], _OBJECTS[(i + 5) % len(_OBJECTS)]
        c1, c2 = _COLORS[i % len(_COLORS)], _COLORS[(i + 3) % len(_COLORS)]
        pos = _POSITIONS[i % len(_POSITIONS)]
        out.append(
            {
                "tag": "dpg",
                "item_id": f"dpg_{i:04d}",
                "prompt": (
                    f"a detailed photo of a {c1} {o1} {pos} a {c2} {o2} on a wooden table, "
                    f"soft window light, shallow depth of field"
                ),
            }
        )
    return out


def load_prompt_file(path: str) -> List[Dict]:
    """Official metadata.jsonl (GenEval) or prompt-per-line file."""
    items = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                items.append(json.loads(line))
            except json.JSONDecodeError:
                items.append({"tag": "custom", "prompt": line})
    return items


def generate_suite(infer, prompts: List[Dict], outdir: str, images_per_prompt: int = 4, max_new_tokens: int = 300):
    """Official GenEval output layout: <outdir>/<idx:05>/samples/<k:04>.png +
    metadata.jsonl; manifest.jsonl ties every image to its prompt metadata."""
    os.makedirs(outdir, exist_ok=True)
    manifest_path = os.path.join(outdir, "manifest.jsonl")
    with open(manifest_path, "w") as manifest:
        for idx, item in enumerate(prompts):
            pdir = os.path.join(outdir, f"{idx:05d}")
            sdir = os.path.join(pdir, "samples")
            os.makedirs(sdir, exist_ok=True)
            with open(os.path.join(pdir, "metadata.jsonl"), "w") as f:
                f.write(json.dumps(item) + "\n")
            for k in range(images_per_prompt):
                infer.reset_inner_state()
                prefix = os.path.join(sdir, f"{k:04d}")
                infer.generate(
                    [{"role": "HUMAN", "content": [{"type": "text", "text": item["prompt"]}]}],
                    max_new_tokens=max_new_tokens,
                    output_image_prefix=prefix,
                )
                manifest.write(json.dumps({**item, "image": prefix + ".png", "prompt_idx": idx, "sample": k}) + "\n")
    return manifest_path


def score_manifest(manifest_path: str, scorer: Callable[[str, Dict], Dict]) -> Dict:
    """Apply `scorer(image_path, prompt_meta) -> {"correct": bool, ...}` to every
    generated image; aggregate per-tag accuracy + the GenEval overall mean."""
    per_tag: Dict[str, List[float]] = {}
    with open(manifest_path) as f:
        for line in f:
            item = json.loads(line)
            res = scorer(item["image"], item)
            per_tag.setdefault(item.get("tag", "all"), []).append(float(res.get("correct", 0.0)))
    summary = {tag: sum(v) / len(v) for tag, v in per_tag.items() if v}
    if summary:
        summary["overall"] = sum(summary.values()) / len(summary)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="checkpoint dir for MingUniVisionInfer")
    ap.add_argument("--suite", choices=["geneval", "dpg"], default="geneval")
    ap.add_argument("--prompts", default=None, help="official metadata.jsonl / prompt file")
    ap.add_argument("--out", default="/tmp/t2i_eval")
    ap.add_argument("--images-per-prompt", type=int, default=4)
    ap.add_argument("--dry-run", action="store_true", help="emit prompts + layout without a model")
    args = ap.parse_args()

    prompts = load_prompt_file(args.prompts) if args.prompts else (geneval_prompts() if args.suite == "geneval" else dpg_prompts())
    if args.dry_run:
        os.makedirs(args.out, exist_ok=True)
        path = os.path.join(args.out, "prompts.jsonl")
        with open(path, "w") as f:
            for p in prompts:
                f.write(json.dumps(p) + "\n")
        print(json.dumps({"suite": args.suite, "prompts": len(prompts), "file": path}))
        return

    from mingunivision_tpu.api import MingUniVisionInfer

    infer = MingUniVisionInfer(args.model)
    manifest = generate_suite(infer, prompts, args.out, images_per_prompt=args.images_per_prompt)
    print(json.dumps({"suite": args.suite, "prompts": len(prompts), "manifest": manifest}))


if __name__ == "__main__":
    main()
