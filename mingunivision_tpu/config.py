"""Typed configuration tree for the whole framework.

One dataclass hierarchy, JSON-serializable, env-var free — replacing the reference's
four overlapping config mechanisms (HF PretrainedConfig / OmegaConf / argparse / env
vars; see reference modeling_mingtok.py:20-54, configuration_bailing_moe.py:6,
app.py:12-18).

Default values reproduce the shipped Ming-UniVision-16B-A3B checkpoint:
  - MingTok:   reference mingtok/config/config_mingtok.json
  - Bailing:   reference mingunivision/config.json:11-119
  - RF head:   reference modeling_bailing_moe.py:1559-1584 (setup_vishead_diffloss)
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


def _asdict(obj) -> dict:
    # manual recursion (dataclasses.asdict deep-copies values, which chokes on
    # runtime-only fields like a jax Mesh — those are skipped instead)
    out = {}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if dataclasses.is_dataclass(v):
            out[f.name] = _asdict(v)
            continue
        try:
            json.dumps(v)
        except TypeError:
            continue
        out[f.name] = v
    return out


class _JsonMixin:
    def to_json(self, **kw) -> str:
        return json.dumps(_asdict(self), indent=2, **kw)

    @classmethod
    def from_dict(cls, d: dict):
        field_names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in d.items():
            if k not in field_names:
                continue
            ftype = cls.__dataclass_fields__[k].type  # type: ignore[attr-defined]
            sub = _SUBCONFIG_TYPES.get((cls.__name__, k))
            if sub is not None and isinstance(v, dict):
                v = sub.from_dict(v)
            kwargs[k] = v
        return cls(**kwargs)

    @classmethod
    def from_json(cls, s: str):
        return cls.from_dict(json.loads(s))


# ---------------------------------------------------------------------------
# MingTok-Vision visual tokenizer
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ViTEncoderConfig(_JsonMixin):
    """Low-level encoder: bidirectional ViT -> 32-d latents.

    Reference: mingtok/config/config_mingtok.json:3-10 and
    mingtok/vision_transformer/vision_transformer.py:640-674.
    """

    img_size: int = 512
    patch_size: int = 32
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12  # embed_dim // 64
    mlp_ratio: float = 4.0
    ffn_layer: str = "swiglufused"
    out_dim: int = 32
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    ln_eps: float = 1e-6
    # Historical DINO kludge preserved for checkpoint parity
    # (vision_transformer.py:198-203): pos-embed interpolation uses
    # scale_factor=(w0+offset)/M instead of an exact output size.
    interpolate_offset: float = 0.1
    interpolate_antialias: bool = False

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size


@dataclass(frozen=True)
class SemanticDecoderConfig(_JsonMixin):
    """Causal ViT decoder: 32-d latent -> 1024-d semantic features, KV-cached.

    Reference: mingtok/config/config_mingtok.json:11-17 and
    vision_transformer.py:599-638 (causal_decoder).
    """

    in_dim: int = 32
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16  # embed_dim // 64
    mlp_ratio: float = 4.0
    ffn_layer: str = "swiglufused"
    patch_size: int = 32  # only used for sem->pix spatial expansion ratio
    with_cls_token: bool = True
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    ln_eps: float = 1e-6


@dataclass(frozen=True)
class PixelDecoderConfig(_JsonMixin):
    """Bidirectional ViT decoder: semantic features -> RGB patches (fp32 path).

    Reference: mingtok/config/config_mingtok.json:18-24 and
    vision_transformer.py:572-597 (decoder).
    """

    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    ffn_layer: str = "mlp"
    patch_size: int = 16
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    ln_eps: float = 1e-6
    loss_type: str = "L1-plain"
    norm_pix_loss: bool = True
    # fp32 matmul tier for this decoder (BENCHMARKS "Pixel-decoder precision
    # tiers"; v5e b8 512px enc_dec img/s @ PSNR-vs-true-fp32, with the
    # head-major flash-attention path active on the reduced tiers):
    #   "highest" 41.4 (oracle) / "high" 50.7 @109dB / "default" 86.6 @60.3dB
    #   / "bf16" 95.9 @50.3dB (whole stack in bf16 activations).
    # "high" (bf16x3, fp32-class) is the quality default; serving selects a
    # faster tier via RuntimeConfig.pixdec_matmul_precision — uint8 image
    # quantization sits at 48.1 dB, so >=60 dB divergence is invisible in the
    # saved PNG.
    matmul_precision: str = "high"


@dataclass(frozen=True)
class MingTokConfig(_JsonMixin):
    """Three-part continuous visual tokenizer.

    Reference: mingtok/modeling_mingtok.py:97-206. `scaling_factor`/`mean`
    standardize latents at the encode boundary (modeling_mingtok.py:162) and are
    inverted before semantic decode (:168).
    """

    encoder: ViTEncoderConfig = field(default_factory=ViTEncoderConfig)
    semantic_decoder: SemanticDecoderConfig = field(default_factory=SemanticDecoderConfig)
    pixel_decoder: PixelDecoderConfig = field(default_factory=PixelDecoderConfig)
    scaling_factor: float = 8.09449291
    mean: float = 1.46817409
    # bf16 compute for encoder/semantic decoder, fp32 for the pixel decoder
    # (maybe_autocast semantics, modeling_mingtok.py:157,180).
    compute_dtype: str = "bfloat16"

    @property
    def latent_dim(self) -> int:
        return self.encoder.out_dim

    @property
    def feature_dim(self) -> int:
        return self.semantic_decoder.embed_dim


# ---------------------------------------------------------------------------
# Bailing-MoE language model
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BailingMoeConfig(_JsonMixin):
    """16B-A3B decoder-only MoE LLM.

    Reference: mingunivision/config.json:11-119 + configuration_bailing_moe.py.
    """

    vocab_size: int = 126464
    hidden_size: int = 2048
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 4
    head_dim: int = 128
    intermediate_size: int = 5632  # dense FFN (unused: first_k_dense_replace=0)
    moe_intermediate_size: int = 1408
    num_experts: int = 64
    num_experts_per_tok: int = 6
    num_shared_experts: int = 2
    first_k_dense_replace: int = 0
    norm_topk_prob: bool = True
    multi_gate: bool = True
    hidden_act: str = "silu"
    rms_norm_eps: float = 1e-5
    rope_theta: float = 600000.0
    rope_scaling_type: str = "3D"  # config.json:94-97; all-equal planes == 1D RoPE
    mrope_section: Tuple[int, int, int] = (16, 24, 24)
    max_position_embeddings: int = 32768
    use_qkv_bias: bool = False
    use_bias: bool = False
    norm_head: bool = False
    tie_word_embeddings: bool = False
    eos_token_id: int = 126081
    pad_token_id: int = 126081
    image_patch_token: int = 126346
    image_start_token: int = 126347
    video_start_token: int = 126349
    num_image_tokens_for_gen: int = 256
    # set True when serving with expert/model-sharded tables (api.py does):
    # the Pallas stream kernel fed through GSPMD would force an all-gather of
    # the tables. With `expert_mesh` also set, decode dispatches through the
    # manual-SPMD shard_map wrapper (parallel/moe_shard.py) that runs the
    # stream kernel on each device's local expert shard + psum; otherwise (or
    # for int4 tables) it goes masked-dense (partitioned + psum'd by GSPMD).
    expert_tables_sharded: bool = False
    # diagnostic/test override of the trace-time MoE dispatch selection:
    # "dense" forces masked-dense everywhere (the conservative GSPMD path the
    # sharded TPU graph falls back to) — used by the AOT 16B memory-analysis
    # test so a CPU lowering reflects the real serving graph's temps instead of
    # the CPU-only gather path. None = normal selection.
    moe_force_dispatch: Any = None
    # prefill MoE dispatch: route through the capacity-dense scatter +
    # UNIFORM-groups fused SwiGLU kernel (ops/kernels/moe_capacity.py —
    # tm == capacity means one kernel visit per expert, no megablox group-
    # boundary recompute) with a lax.cond fallback to the exact argsort-gmm on
    # overflow. factor scales capacity vs the mean expert load
    # (default_capacity); 0 disables the capacity path entirely. 2.0 since
    # round 5: at 1024 tok random routing, factor 1.33 (C=128) overflows to
    # the fallback on a large share of steps (binomial max load ~96+3sigma
    # crosses 128), while C=192's padding is cheap — measured e2e 8L bf16
    # prefill 5219 tok/s (28L-extrap) vs 5067 @1.33 vs 5007 argsort-only
    # (benchmarks/bench_prefill_deep.py). Only engages at
    # B*T >= MOE_CAPACITY_MIN_TOKENS (512).
    moe_prefill_capacity_factor: float = 2.0
    # row-tile override for the fused argsort-gmm prefill kernel (0 = the
    # measured defaults: 128 int4 / 256 otherwise)
    moe_prefill_tm: int = 0
    # runtime-only: the jax Mesh for the shard_map decode path (excluded from
    # JSON / equality; api.py fills it in when constructed with a mesh)
    expert_mesh: Any = dataclasses.field(default=None, compare=False, repr=False)
    # set by the training losses (engine/train.py): routes MoE dispatch through
    # the custom_vjp kernel wrappers so jax.grad works; inference keeps the
    # (non-differentiable but operand-layout-faster) stacked-table calls
    moe_differentiable: bool = False
    # rematerialize each decoder layer in the backward pass (jax.checkpoint on
    # the scan body): activation memory per layer drops to the layer BOUNDARY
    # (B*T*h) instead of every intermediate (attention probs, expert g/u
    # activations, logits of the router...), trading one extra forward. The
    # standard TPU trick for fitting deeper stacks/batches in HBM. Training
    # callers opt in (train_lm --remat); inference is unaffected (no grads).
    remat_layers: bool = False

    @property
    def num_kv_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @property
    def qkv_out_dim(self) -> int:
        return (self.num_attention_heads + 2 * self.num_key_value_heads) * self.head_dim


@dataclass(frozen=True)
class RFHeadConfig(_JsonMixin):
    """Rectified-flow head sampling 32-d continuous latents from LLM hidden states.

    Reference: modeling_bailing_moe.py:1559-1584 ("flow_matching_swiglu-4",
    "linear2-norm") and diff_loss_rf_swiglu.py:75-395.
    """

    target_channels: int = 32  # MingTok latent dim
    z_channels: int = 3072  # vis_head output / conditioning width
    width: int = 3072
    depth: int = 12
    mlp_mult: int = 4
    num_sampling_steps: int = 16
    freq_embed_size: int = 256
    ln_eps: float = 1e-6


@dataclass(frozen=True)
class ImageGenConfig(_JsonMixin):
    """Defaults for the AR image generation loop.

    Reference: modeling_bailingmm.py:224-226 (cfg 3.0/1.1),
    modeling_bailing_moe.py:1844-1965 (generate_image).
    """

    num_image_tokens: int = 256
    text_cfg: float = 3.0
    image_cfg: float = 1.1
    temperature: float = 1.0
    cfg_schedule: str = "constant"  # constant | linear | linear-reverse
    cfg_renorm_type: Optional[str] = None  # None | "channel"
    time_shifting_factor: Optional[float] = None


@dataclass(frozen=True)
class GenerationConfig(_JsonMixin):
    """Text decoding defaults (HF-generate equivalents)."""

    max_new_tokens: int = 512
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    eos_token_id: int = 126081


# ---------------------------------------------------------------------------
# Composition
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MingUniVisionConfig(_JsonMixin):
    """Full multimodal composition.

    Reference: mingunivision/modeling_bailingmm.py:85-129 — MingTok + Bailing-MoE +
    linear_proj MLP (1024->2048, depth 2) + vis_head/RF head.
    """

    mingtok: MingTokConfig = field(default_factory=MingTokConfig)
    llm: BailingMoeConfig = field(default_factory=BailingMoeConfig)
    rf_head: RFHeadConfig = field(default_factory=RFHeadConfig)
    image_gen: ImageGenConfig = field(default_factory=ImageGenConfig)
    mlp_depth: int = 2  # linear_proj depth (config.json "mlp_depth": 2)


# ---------------------------------------------------------------------------
# Parallelism / runtime
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MeshConfig(_JsonMixin):
    """Device-mesh layout.

    TPU-native replacement for the reference vLLM TP/PP/NCCL stack (SURVEY §2.9):
    a single mesh with (data, expert, model) axes; XLA emits collectives over ICI.
    """

    data: int = 1
    expert: int = 1  # shards the 64-expert dim of MoE weights
    model: int = 1  # shards attention heads / FFN hidden

    @property
    def axis_names(self) -> Tuple[str, str, str]:
        return ("data", "expert", "model")

    @property
    def shape(self) -> Tuple[int, int, int]:
        return (self.data, self.expert, self.model)

    @property
    def num_devices(self) -> int:
        return self.data * self.expert * self.model


@dataclass(frozen=True)
class RuntimeConfig(_JsonMixin):
    """Engine-level knobs: cache sizes, dtypes, kernels."""

    max_seq_len: int = 4096  # preallocated KV-cache length for the LLM
    max_semdec_len: int = 257  # semantic-decoder cache (256 latents + headroom)
    cfg_rows: int = 3  # cond / uncond / text-uncond
    param_dtype: str = "bfloat16"
    # RF-head tier override (None = follow param_dtype). The velocity field is
    # the most quantization-sensitive module; int4 LLM + int8 RF trades
    # ~4 ms/token for safety margin (BENCHMARKS round-2 T2I table).
    rf_param_dtype: Optional[str] = None
    compute_dtype: str = "bfloat16"
    use_pallas_attention: bool = True
    use_pallas_moe: bool = True
    # multi-round mask persistence policy; "DROP" is the reference default
    # (modeling_bailingmm.py:279-299).
    past_mode: str = "DROP"  # DROP | KEEP
    # Pixel-decoder matmul tier override for serving (None = model default
    # "high"). "default" = single-pass bf16 MXU, measured 86.6 img/s @ 60.3 dB
    # PSNR-vs-fp32 (vs 50.7 @ "high") — invisible in uint8 output (48.1 dB
    # quantizer floor). "bf16" = 95.9 img/s @ 50.3 dB, max-throughput opt-in.
    pixdec_matmul_precision: Optional[str] = None
    # integer-MXU s8 dots in the decode stream MoE kernels (round-5 default:
    # +16-21% serving throughput, bounded per-row activation-quant noise);
    # False restores the exact-dequant kernels for golden/debug runs.
    # Applied by api.MingUniVisionInfer at construction (module flags in
    # ops/kernels/moe_stream are the source of truth for bare-library use).
    moe_int_dots: bool = True


def with_pixdec_precision(config: "MingUniVisionConfig", precision: str) -> "MingUniVisionConfig":
    """Return `config` with the pixel-decoder matmul tier replaced (serving
    tiers; see PixelDecoderConfig.matmul_precision for the measured table)."""
    import dataclasses

    mt = config.mingtok
    return dataclasses.replace(
        config,
        mingtok=dataclasses.replace(
            mt, pixel_decoder=dataclasses.replace(mt.pixel_decoder, matmul_precision=precision)
        ),
    )


_SUBCONFIG_TYPES = {
    ("MingTokConfig", "encoder"): ViTEncoderConfig,
    ("MingTokConfig", "semantic_decoder"): SemanticDecoderConfig,
    ("MingTokConfig", "pixel_decoder"): PixelDecoderConfig,
    ("MingUniVisionConfig", "mingtok"): MingTokConfig,
    ("MingUniVisionConfig", "llm"): BailingMoeConfig,
    ("MingUniVisionConfig", "rf_head"): RFHeadConfig,
    ("MingUniVisionConfig", "image_gen"): ImageGenConfig,
}


# ---------------------------------------------------------------------------
# Small test-scale presets (used by unit tests and CI; same code paths)
# ---------------------------------------------------------------------------


def tiny_mingtok_config() -> MingTokConfig:
    return MingTokConfig(
        encoder=ViTEncoderConfig(img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=2, out_dim=8),
        semantic_decoder=SemanticDecoderConfig(in_dim=8, embed_dim=64, depth=2, num_heads=2, patch_size=16),
        pixel_decoder=PixelDecoderConfig(embed_dim=64, depth=2, num_heads=2, patch_size=8),
        scaling_factor=2.0,
        mean=0.5,
    )


def tiny_llm_config() -> BailingMoeConfig:
    return BailingMoeConfig(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        moe_intermediate_size=32,
        num_experts=8,
        num_experts_per_tok=2,
        num_shared_experts=2,
        max_position_embeddings=256,
        mrope_section=(2, 3, 3),
    )


def tiny_rf_config() -> RFHeadConfig:
    return RFHeadConfig(target_channels=8, z_channels=48, width=48, depth=2, mlp_mult=4, num_sampling_steps=4, freq_embed_size=16)
