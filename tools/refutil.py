"""Import helpers for using the PyTorch reference as a *test oracle*.

Golden-value generation only (tools/gen_golden.py): we run the reference modules on
CPU with tiny random weights, record activations to .npz, and unit-test our JAX
implementation against those recordings. No reference code is copied; the reference
tree is imported read-only from its mount point.

Missing optional deps of the reference (omegaconf, torchvision, flash_attn,
xformers) are stubbed with inert shims sufficient for CPU eager execution.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types
import warnings


def _mk_module(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m

REFERENCE_ROOT = "/root/reference"


def _stub_omegaconf():
    if "omegaconf" in sys.modules:
        return
    om = _mk_module("omegaconf")
    om.MISSING = object()

    class _OmegaConf:
        @staticmethod
        def create(*a, **k):
            raise NotImplementedError("omegaconf stub")

    om.OmegaConf = _OmegaConf
    sys.modules["omegaconf"] = om


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    tv = _mk_module("torchvision")
    tr = _mk_module("torchvision.transforms")

    class ToPILImage:
        def __call__(self, x):
            import numpy as np
            from PIL import Image

            arr = x.detach().cpu().float().numpy()
            if arr.ndim == 4:
                arr = arr[0]
            arr = np.transpose(arr, (1, 2, 0))
            arr = (arr * 255.0).clip(0, 255).astype("uint8")
            return Image.fromarray(arr)

    class InterpolationMode:
        BICUBIC = "bicubic"

    tr.ToPILImage = ToPILImage
    tr.InterpolationMode = InterpolationMode
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr


def _stub_torchvision_full():
    """Richer torchvision stub for processing_bailingmm/bailingmm_utils: the
    transforms/functional/io submodules exist but raise on use (the golden tests
    exercise tokenize/template/mask code, never the tensor transforms)."""
    for name in ("torchvision", "torchvision.transforms", "torchvision.transforms.functional", "torchvision.io"):
        sys.modules.pop(name, None)
    tv = _mk_module("torchvision")
    tr = _mk_module("torchvision.transforms")
    trf = _mk_module("torchvision.transforms.functional")
    io_m = _mk_module("torchvision.io")

    class InterpolationMode:
        BICUBIC = "bicubic"
        NEAREST = "nearest"
        BILINEAR = "bilinear"

    class _Unavailable:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            raise NotImplementedError("torchvision stub")

    for cls in ("Resize", "CenterCrop", "ToTensor", "Normalize", "Compose", "Lambda"):
        setattr(tr, cls, type(cls, (_Unavailable,), {}))

    class ToPILImage:  # functional (modeling_bailing_moe saves PNGs through it)
        def __call__(self, x):
            import numpy as np
            from PIL import Image

            arr = x.detach().cpu().float().numpy()
            if arr.ndim == 4:
                arr = arr[0]
            arr = np.transpose(arr, (1, 2, 0))
            arr = (arr * 255.0).clip(0, 255).astype("uint8")
            return Image.fromarray(arr)

    tr.ToPILImage = ToPILImage
    tr.InterpolationMode = InterpolationMode
    trf.InterpolationMode = InterpolationMode
    trf.resize = _Unavailable()
    tv.transforms = tr
    tv.io = io_m
    tv.__version__ = "0.0.0-stub"
    io_m.VideoReader = _Unavailable
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = trf
    sys.modules["torchvision.io"] = io_m


def _stub_torchaudio():
    if "torchaudio" in sys.modules:
        return
    ta = _mk_module("torchaudio")

    def _load(*a, **k):
        raise NotImplementedError("torchaudio stub")

    ta.load = _load
    sys.modules["torchaudio"] = ta


def import_reference_processor():
    """Import the reference processing_bailingmm module (tokenize/template/mask
    builders run pure-Python; image/audio tensor paths are stubbed)."""
    warnings.filterwarnings("ignore")
    _stub_torchvision_full()
    _stub_torchaudio()
    p = f"{REFERENCE_ROOT}/mingunivision"
    if p not in sys.path:
        sys.path.insert(0, p)
    import processing_bailingmm  # noqa

    return processing_bailingmm


def import_reference_mingtok():
    warnings.filterwarnings("ignore")
    _stub_omegaconf()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from mingtok import modeling_mingtok  # noqa

    return modeling_mingtok


def import_reference_llm():
    warnings.filterwarnings("ignore")
    _stub_torchvision()
    p = f"{REFERENCE_ROOT}/mingunivision"
    if p not in sys.path:
        sys.path.insert(0, p)
    import modeling_bailing_moe  # noqa

    return modeling_bailing_moe


def import_reference_rf():
    warnings.filterwarnings("ignore")
    p = f"{REFERENCE_ROOT}/mingunivision"
    if p not in sys.path:
        sys.path.insert(0, p)
    import diff_loss_rf_swiglu  # noqa

    return diff_loss_rf_swiglu
