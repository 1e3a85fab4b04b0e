"""Learned-feature perceptual metrics: LPIPS net + rFID feature extractors.

BASELINE.md gates rFID 0.54 / LPIPS 0.14 (reference evaluates LPIPS through the
hook at mingtok/vision_transformer/vision_transformer.py:564-570 and rFID with
an Inception feature net). No pretrained weights ship in this image, so this
module provides:

  - the exact LPIPS(VGG16) architecture in JAX + `lpips_params_from_torch`
    keyed to the public `lpips` package's state-dict naming — the real weights
    drop in unchanged the moment a checkpoint is available;
  - `random_lpips_params` so the full pipeline is exercisable today (random
    VGG features still yield a valid perceptual-style distance for tests);
  - `TinyConvFeatures`, a small deterministic conv embedder implementing the
    rFID `feature_fn` interface for utils.metrics.FeatureStats/frechet_distance
    (swap in real InceptionV3 pool3 features for the published number).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config (torchvision layout): conv counts per stage; LPIPS taps
# the activation after the last relu of each stage.
_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# ImageNet scaling layer of the lpips package (inputs in [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@dataclass(frozen=True)
class LPIPSConfig:
    stages: tuple = _VGG_STAGES
    use_dropout: bool = True  # lpips lin layers are Dropout+Conv1x1; inference ignores dropout


def _conv_init(key, cin, cout, k=3):
    w = jax.random.normal(key, (cout, cin, k, k), jnp.float32) * (2.0 / (cin * k * k)) ** 0.5
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def random_lpips_params(key, cfg: LPIPSConfig = LPIPSConfig()):
    params = {"vgg": [], "lin": []}
    cin = 3
    for si, (ch, n_convs) in enumerate(cfg.stages):
        stage = []
        for ci in range(n_convs):
            key, sub = jax.random.split(key)
            stage.append(_conv_init(sub, cin, ch))
            cin = ch
        params["vgg"].append(stage)
        key, sub = jax.random.split(key)
        params["lin"].append({"w": jnp.abs(jax.random.normal(sub, (1, ch, 1, 1), jnp.float32)) * 0.1})
    return params


def lpips_params_from_torch(sd: Mapping, cfg: LPIPSConfig = LPIPSConfig()):
    """Convert the `lpips` package's LPIPS(net='vgg') state dict.

    Names: net.slice{K}.{idx}.weight/bias (VGG convs, torchvision indices with
    ReLU/MaxPool gaps) and lin{K}.model.1.weight (1x1 conv head)."""
    import re

    # collect conv layers per slice in index order
    params = {"vgg": [], "lin": []}
    for k in range(1, len(cfg.stages) + 1):
        convs = {}
        pat = re.compile(rf"^net\.slice{k}\.(\d+)\.weight$")
        for name in sd:
            m = pat.match(name)
            if m:
                idx = int(m.group(1))
                convs[idx] = {
                    "w": np.asarray(sd[f"net.slice{k}.{idx}.weight"], np.float32),
                    "b": np.asarray(sd[f"net.slice{k}.{idx}.bias"], np.float32),
                }
        params["vgg"].append([convs[i] for i in sorted(convs)])
        params["lin"].append({"w": np.asarray(sd[f"lin{k - 1}.model.1.weight"], np.float32)})
    return params


def _conv2d(x, p, stride=1):
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["w"]), (stride, stride), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    return y + jnp.asarray(p["b"])[None, :, None, None]


def _vgg_features(params, x, cfg: LPIPSConfig):
    """x: (B, 3, H, W) in [-1, 1] -> list of stage activations."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / jnp.asarray(_SCALE)[None, :, None, None]
    feats = []
    for si, stage in enumerate(params["vgg"]):
        if si > 0:
            # 2x2 max pool between stages (torchvision VGG16)
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        for conv in stage:
            x = jax.nn.relu(_conv2d(x, conv))
        feats.append(x)
    return feats


def lpips_distance(params, a, b, cfg: LPIPSConfig = LPIPSConfig()):
    """LPIPS(a, b): unit-normalize each stage's channels, squared diff, 1x1
    linear head, spatial mean, sum over stages. a/b: (B, 3, H, W) in [-1, 1]."""
    fa = _vgg_features(params, jnp.asarray(a, jnp.float32), cfg)
    fb = _vgg_features(params, jnp.asarray(b, jnp.float32), cfg)
    total = 0.0
    for xa, xb, lin in zip(fa, fb, params["lin"]):
        na = xa / jnp.sqrt(jnp.sum(xa**2, axis=1, keepdims=True) + 1e-10)
        nb = xb / jnp.sqrt(jnp.sum(xb**2, axis=1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        w = jnp.asarray(lin["w"]).reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(d * w, axis=1), axis=(-2, -1))
    return total  # (B,)


# ---------------------------------------------------------------------------
# rFID feature extractor interface
# ---------------------------------------------------------------------------


class TinyConvFeatures:
    """Deterministic small conv embedder for the rFID pipeline (interface
    stand-in for InceptionV3 pool3). feature_fn: (B, 3, H, W) -> (B, dim)."""

    def __init__(self, dim: int = 192, seed: int = 0):
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 4)
        self.convs = [
            _conv_init(ks[0], 3, 32),
            _conv_init(ks[1], 32, 64),
            _conv_init(ks[2], 64, dim),
        ]
        self.dim = dim
        self._fn = jax.jit(self._apply)

    def _apply(self, x):
        for i, p in enumerate(self.convs):
            x = jax.nn.relu(_conv2d(x, p, stride=2))
        return jnp.mean(x, axis=(-2, -1))  # global average pool

    def __call__(self, images) -> np.ndarray:
        return np.asarray(self._fn(jnp.asarray(images, jnp.float32)))
