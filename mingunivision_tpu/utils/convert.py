"""Checkpoint conversion: torch/safetensors state dicts -> JAX param pytrees.

Handles the reference layouts (SURVEY §7 hard-part #4): fused `query_key_value`
splits, `w12` SwiGLU packing, per-layer expert stacking into single (E, ...) arrays
and depth-stacking every layer for `lax.scan`.

Works from any mapping of name -> numpy array (a torch ``state_dict`` converted
with ``.numpy()``, or safetensors loaded with ``safetensors.numpy``).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from mingunivision_tpu.config import BailingMoeConfig, MingTokConfig, MingUniVisionConfig, RFHeadConfig


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def _lin(sd: Mapping, prefix: str, bias: bool = True):
    p = {"w": _np(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def _norm(sd: Mapping, prefix: str):
    return {"w": _np(sd[f"{prefix}.weight"]), "b": _np(sd[f"{prefix}.bias"])}


def _stack(trees):
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


# ---------------------------------------------------------------------------
# MingTok
# ---------------------------------------------------------------------------


def _vit_block(sd: Mapping, prefix: str, ffn_layer: str):
    blk = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "attn": {
            "qkv": _lin(sd, f"{prefix}.attn.qkv"),
            "proj": _lin(sd, f"{prefix}.attn.proj"),
        },
        "norm2": _norm(sd, f"{prefix}.norm2"),
    }
    if ffn_layer in ("swiglufused", "swiglu"):
        blk["mlp"] = {"w12": _lin(sd, f"{prefix}.mlp.w12"), "w3": _lin(sd, f"{prefix}.mlp.w3")}
    else:
        blk["mlp"] = {"fc1": _lin(sd, f"{prefix}.mlp.fc1"), "fc2": _lin(sd, f"{prefix}.mlp.fc2")}
    return blk


def _vit_blocks(sd: Mapping, root: str, depth: int, ffn_layer: str):
    # reference wraps all blocks in one BlockChunk -> names `{root}.blocks.0.{i}.*`
    # (vision_transformer.py:152-159); fall back to unchunked `{root}.blocks.{i}.*`.
    chunked = f"{root}.blocks.0.0.norm1.weight" in sd
    fmt = (root + ".blocks.0.{i}") if chunked else (root + ".blocks.{i}")
    return _stack([_vit_block(sd, fmt.format(i=i), ffn_layer) for i in range(depth)])


def mingtok_params_from_torch(sd: Mapping, cfg: MingTokConfig):
    """Reference MingTok state_dict -> our param pytree."""
    enc, sem, pix = cfg.encoder, cfg.semantic_decoder, cfg.pixel_decoder
    conv_w = _np(sd["low_level_encoder.patch_embed.proj.weight"])  # (D, C, p, p)
    D = conv_w.shape[0]
    params = {
        "encoder": {
            "patch_embed": {
                "w": conv_w.reshape(D, -1).T,  # (C*p*p, D) — matches extract_patches order
                "b": _np(sd["low_level_encoder.patch_embed.proj.bias"]),
            },
            "cls_token": _np(sd["low_level_encoder.cls_token"]),
            "pos_embed": _np(sd["low_level_encoder.pos_embed"]),
            "blocks": _vit_blocks(sd, "low_level_encoder", enc.depth, enc.ffn_layer),
            "out_norm": _norm(sd, "low_level_encoder.out_norm"),
            "out_proj": _lin(sd, "low_level_encoder.out_proj"),
        },
        "semantic_decoder": {
            "in_proj": _lin(sd, "semantic_decoder.in_proj"),
            "blocks": _vit_blocks(sd, "semantic_decoder", sem.depth, sem.ffn_layer),
            "norm": _norm(sd, "semantic_decoder.norm"),
        },
        "pixel_decoder": {
            "blocks": _vit_blocks(sd, "pixel_decoder", pix.depth, pix.ffn_layer),
            "norm": _norm(sd, "pixel_decoder.norm"),
            "head": _lin(sd, "pixel_decoder.head"),
        },
        "sem_to_pix": _lin(sd, "sem_to_pix"),
    }
    return params


# ---------------------------------------------------------------------------
# Bailing-MoE LLM
# ---------------------------------------------------------------------------


def _moe_layer(sd: Mapping, prefix: str, cfg: BailingMoeConfig):
    """One decoder layer -> layer pytree with experts stacked on a leading axis."""
    experts_gate = np.stack(
        [_np(sd[f"{prefix}.mlp.experts.{e}.gate_proj.weight"]).T for e in range(cfg.num_experts)]
    )
    experts_up = np.stack(
        [_np(sd[f"{prefix}.mlp.experts.{e}.up_proj.weight"]).T for e in range(cfg.num_experts)]
    )
    experts_down = np.stack(
        [_np(sd[f"{prefix}.mlp.experts.{e}.down_proj.weight"]).T for e in range(cfg.num_experts)]
    )
    layer = {
        "input_layernorm": {"w": _np(sd[f"{prefix}.input_layernorm.weight"])},
        "attention": {
            "query_key_value": _lin(sd, f"{prefix}.attention.query_key_value"),
            "dense": _lin(sd, f"{prefix}.attention.dense"),
        },
        "post_attention_layernorm": {"w": _np(sd[f"{prefix}.post_attention_layernorm.weight"])},
        "mlp": {
            "gate": {"w": _np(sd[f"{prefix}.mlp.gate.weight"]).T},  # (hidden, E)
            "experts": {"gate_proj": experts_gate, "up_proj": experts_up, "down_proj": experts_down},
            "shared_experts": {
                "gate_proj": _lin(sd, f"{prefix}.mlp.shared_experts.gate_proj", bias=False),
                "up_proj": _lin(sd, f"{prefix}.mlp.shared_experts.up_proj", bias=False),
                "down_proj": _lin(sd, f"{prefix}.mlp.shared_experts.down_proj", bias=False),
            },
        },
    }
    if cfg.multi_gate:
        layer["mlp"]["image_gate"] = {"w": _np(sd[f"{prefix}.mlp.image_gate.weight"]).T}
        layer["mlp"]["audio_gate"] = {"w": _np(sd[f"{prefix}.mlp.audio_gate.weight"]).T}
    return layer


def bailing_moe_params_from_torch(sd: Mapping, cfg: BailingMoeConfig, root: str = "model"):
    """Reference BailingMoeForCausalLM state_dict -> our param pytree.

    Splits nothing: the fused query_key_value stays fused (our attention splits
    heads at runtime, same as the reference modeling_bailing_moe.py:680-684).
    """
    layers = _stack([_moe_layer(sd, f"{root}.layers.{i}", cfg) for i in range(cfg.num_hidden_layers)])
    params = {
        "word_embeddings": {"w": _np(sd[f"{root}.word_embeddings.weight"])},
        "layers": layers,
        "norm": {"w": _np(sd[f"{root}.norm.weight"])},
        "lm_head": _lin(sd, "lm_head", bias=False),
    }
    return params


# ---------------------------------------------------------------------------
# Rectified-flow head + vis_head + linear_proj
# ---------------------------------------------------------------------------


def rf_head_params_from_torch(sd: Mapping, cfg: RFHeadConfig, root: str = "diffloss.net"):
    blocks = _stack(
        [
            {
                "in_ln": _norm(sd, f"{root}.res_blocks.{i}.in_ln"),
                "mlp": {
                    "w12": _lin(sd, f"{root}.res_blocks.{i}.mlp.w12"),
                    "w3": _lin(sd, f"{root}.res_blocks.{i}.mlp.w3"),
                },
                "adaLN": _lin(sd, f"{root}.res_blocks.{i}.adaLN_modulation.1"),
            }
            for i in range(cfg.depth)
        ]
    )
    return {
        "time_embed": {
            "fc1": _lin(sd, f"{root}.time_embed.mlp.0"),
            "fc2": _lin(sd, f"{root}.time_embed.mlp.2"),
        },
        "cond_embed": _lin(sd, f"{root}.cond_embed"),
        "input_proj": _lin(sd, f"{root}.input_proj"),
        "res_blocks": blocks,
        "final_layer": {
            "adaLN": _lin(sd, f"{root}.final_layer.adaLN_modulation.1"),
            "linear": _lin(sd, f"{root}.final_layer.linear"),
        },
    }


def vis_head_params_from_torch(sd: Mapping, root: str = "vis_head"):
    # nn.Sequential(Linear, LayerNorm) — modeling_bailing_moe.py:1570-1573
    return {"linear": _lin(sd, f"{root}.0"), "norm": _norm(sd, f"{root}.1")}


def linear_proj_params_from_torch(sd: Mapping, mlp_depth: int, root: str = "linear_proj"):
    # nn.Sequential(Linear, [GELU, Linear]*) — modeling_bailingmm.py:111-115
    layers = []
    idx = 0
    for d in range(mlp_depth):
        layers.append(_lin(sd, f"{root}.{idx}"))
        idx += 2  # skip GELU
    return {"layers": layers}


# ---------------------------------------------------------------------------
# Omni towers: Whisper audio encoder (ming_lite.patch :1457-1510)
# ---------------------------------------------------------------------------


def _conv1d_from_torch(sd: Mapping, prefix: str):
    # torch Conv1d weight (out, in, k) — our conv1d uses the same OIH layout
    return {"w": _np(sd[f"{prefix}.weight"]), "b": _np(sd[f"{prefix}.bias"])}


def whisper_encoder_params_from_torch(sd: Mapping, n_layer: int, root: str = ""):
    """HF WhisperEncoder state_dict -> our audio_encoder tree.

    Whisper's k_proj carries no bias; the fused qkv gets zeros there (identical
    numerics). Layer names: layers.N.self_attn.{q,k,v,out}_proj,
    self_attn_layer_norm, fc1/fc2, final_layer_norm; trunk conv1/conv2,
    embed_positions.weight, layer_norm.
    """
    r = (root + ".") if root else ""

    def block(i):
        p = f"{r}layers.{i}"
        qw = _np(sd[f"{p}.self_attn.q_proj.weight"]).T
        kw = _np(sd[f"{p}.self_attn.k_proj.weight"]).T
        vw = _np(sd[f"{p}.self_attn.v_proj.weight"]).T
        qb = _np(sd[f"{p}.self_attn.q_proj.bias"])
        vb = _np(sd[f"{p}.self_attn.v_proj.bias"])
        return {
            "norm1": _norm(sd, f"{p}.self_attn_layer_norm"),
            "attn": {
                "qkv": {
                    "w": np.concatenate([qw, kw, vw], axis=1),
                    "b": np.concatenate([qb, np.zeros_like(qb), vb]),
                },
                "proj": _lin(sd, f"{p}.self_attn.out_proj"),
            },
            "norm2": _norm(sd, f"{p}.final_layer_norm"),
            "mlp": {"fc1": _lin(sd, f"{p}.fc1"), "fc2": _lin(sd, f"{p}.fc2")},
        }

    return {
        "conv1": _conv1d_from_torch(sd, f"{r}conv1"),
        "conv2": _conv1d_from_torch(sd, f"{r}conv2"),
        "pos_embed": _np(sd[f"{r}embed_positions.weight"]),
        "blocks": _stack([block(i) for i in range(n_layer)]),
        "norm": _norm(sd, f"{r}layer_norm"),
    }


# ---------------------------------------------------------------------------
# Omni towers: Qwen2.5-VL vision transformer (ming_lite.patch :1456-1476)
# ---------------------------------------------------------------------------


def qwen_vit_params_from_torch(sd: Mapping, depth: int, root: str = ""):
    """HF Qwen2_5_VisionTransformer state_dict -> our qwen_vit tree.

    patch_embed is a Conv3d whose kernel covers exactly one (t, p, p) patch:
    flattening its (d, C, t, p, p) weight gives the equivalent (in, d) linear.
    """
    r = (root + ".") if root else ""

    def block(i):
        p = f"{r}blocks.{i}"
        return {
            "norm1": {"w": _np(sd[f"{p}.norm1.weight"])},
            "attn": {
                "qkv": _lin(sd, f"{p}.attn.qkv"),
                "proj": _lin(sd, f"{p}.attn.proj"),
            },
            "norm2": {"w": _np(sd[f"{p}.norm2.weight"])},
            "mlp": {
                "gate_proj": _lin(sd, f"{p}.mlp.gate_proj"),
                "up_proj": _lin(sd, f"{p}.mlp.up_proj"),
                "down_proj": _lin(sd, f"{p}.mlp.down_proj"),
            },
        }

    pe = _np(sd[f"{r}patch_embed.proj.weight"])  # (d, C, t, p, p)
    return {
        "patch_embed": {"w": pe.reshape(pe.shape[0], -1).T},
        "blocks": _stack([block(i) for i in range(depth)]),
        "merger": {
            "ln_q": {"w": _np(sd[f"{r}merger.ln_q.weight"])},
            "fc1": _lin(sd, f"{r}merger.mlp.0"),
            "fc2": _lin(sd, f"{r}merger.mlp.2"),
        },
    }


# ---------------------------------------------------------------------------
# Talker: Qwen2 core + projection heads (modeling_bailing_talker.py:58-72)
# ---------------------------------------------------------------------------


def qwen2_params_from_torch(sd: Mapping, num_layers: int, root: str = "model"):
    """HF Qwen2ForCausalLM state_dict -> our talker/qwen2 tree."""
    r = (root + ".") if root else ""

    def layer(i):
        p = f"{r}model.layers.{i}"
        return {
            "input_layernorm": {"w": _np(sd[f"{p}.input_layernorm.weight"])},
            "attn": {
                "q_proj": _lin(sd, f"{p}.self_attn.q_proj"),
                "k_proj": _lin(sd, f"{p}.self_attn.k_proj"),
                "v_proj": _lin(sd, f"{p}.self_attn.v_proj"),
                "o_proj": _lin(sd, f"{p}.self_attn.o_proj"),
            },
            "post_attention_layernorm": {"w": _np(sd[f"{p}.post_attention_layernorm.weight"])},
            "mlp": {
                "gate_proj": _lin(sd, f"{p}.mlp.gate_proj"),
                "up_proj": _lin(sd, f"{p}.mlp.up_proj"),
                "down_proj": _lin(sd, f"{p}.mlp.down_proj"),
            },
        }

    out = {
        "embed_tokens": {"w": _np(sd[f"{r}model.embed_tokens.weight"])},
        "layers": _stack([layer(i) for i in range(num_layers)]),
        "norm": {"w": _np(sd[f"{r}model.norm.weight"])},
    }
    if f"{r}lm_head.weight" in sd:
        out["lm_head"] = {"w": _np(sd[f"{r}lm_head.weight"]).T}
    return out


def talker_params_from_torch(sd: Mapping, num_layers: int):
    """Full talker checkpoint (modeling_bailing_talker layout: model.* = Qwen2,
    thinker_to_talker_proj, vp_head) -> our talker tree."""
    return {
        "qwen2": qwen2_params_from_torch(sd, num_layers, root="model"),
        "thinker_to_talker_proj": _lin(sd, "thinker_to_talker_proj"),
        "vp_head": _conv1d_from_torch(sd, "vp_head"),
    }


# ---------------------------------------------------------------------------
# CosyVoice audio detokenizer: HiFTGenerator (talker/hift.py)
# ---------------------------------------------------------------------------


def _wn_weight(sd: Mapping, prefix: str):
    """Fold torch weight_norm on load: w = g * v / ||v|| (norm over all dims
    except 0, torch's default dim=0). Accepts old-style weight_g/weight_v keys,
    the torch>=2.1 parametrize naming, or an already-fused plain weight."""
    if f"{prefix}.weight_v" in sd:
        g, v = _np(sd[f"{prefix}.weight_g"]), _np(sd[f"{prefix}.weight_v"])
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    else:
        return _np(sd[f"{prefix}.weight"])
    norm = np.sqrt((v.reshape(v.shape[0], -1) ** 2).sum(axis=1))
    norm = norm.reshape((-1,) + (1,) * (v.ndim - 1))
    return g * v / np.maximum(norm, 1e-12)


def _wn_conv(sd: Mapping, prefix: str):
    return {"w": _wn_weight(sd, prefix), "b": _np(sd[f"{prefix}.bias"])}


def _hift_resblock_from_torch(sd: Mapping, prefix: str, n_dil: int):
    return {
        "convs1": [_wn_conv(sd, f"{prefix}.convs1.{i}") for i in range(n_dil)],
        "convs2": [_wn_conv(sd, f"{prefix}.convs2.{i}") for i in range(n_dil)],
        "alpha1": [_np(sd[f"{prefix}.activations1.{i}.alpha"]) for i in range(n_dil)],
        "alpha2": [_np(sd[f"{prefix}.activations2.{i}.alpha"]) for i in range(n_dil)],
    }


def hift_generator_params_from_torch(sd: Mapping, cfg):
    """CosyVoice HiFTGenerator state_dict -> talker/hift tree.

    cfg: talker.hift.HiFTGeneratorConfig. Weight-normed convs are folded;
    ConvTranspose1d weights keep torch's (in, out, k) layout (ops.conv
    conv1d_transpose expects it). Module names follow the public layout the
    reference's audio_detokenizer wheel serializes
    (modeling_bailing_talker.py:585 drives hift.inference)."""
    n_up = len(cfg.upsample_rates)
    nk = len(cfg.resblock_kernel_sizes)
    return {
        "f0_predictor": {
            # condnet is Sequential(conv, ELU, conv, ELU, ...) -> even indices
            "condnet": [_wn_conv(sd, f"f0_predictor.condnet.{2 * i}") for i in range(5)],
            "classifier": _lin(sd, "f0_predictor.classifier"),
        },
        "m_source": {"l_linear": _lin(sd, "m_source.l_linear")},
        "conv_pre": _wn_conv(sd, "conv_pre"),
        "ups": [_wn_conv(sd, f"ups.{i}") for i in range(n_up)],
        "source_downs": [_conv1d_from_torch(sd, f"source_downs.{i}") for i in range(n_up)],
        "source_resblocks": [
            _hift_resblock_from_torch(
                sd, f"source_resblocks.{i}", len(cfg.source_resblock_dilation_sizes[i])
            )
            for i in range(n_up)
        ],
        "resblocks": [
            _hift_resblock_from_torch(
                sd, f"resblocks.{i * nk + j}", len(cfg.resblock_dilation_sizes[j])
            )
            for i in range(n_up)
            for j in range(nk)
        ],
        "conv_post": _wn_conv(sd, "conv_post"),
    }


# ---------------------------------------------------------------------------
# CosyVoice audio detokenizer: CausalMaskedDiffWithXvec flow (talker/flow.py)
# ---------------------------------------------------------------------------


def _conformer_block_from_torch(sd: Mapping, prefix: str):
    return {
        "self_attn": {
            "linear_q": _lin(sd, f"{prefix}.self_attn.linear_q"),
            "linear_k": _lin(sd, f"{prefix}.self_attn.linear_k"),
            "linear_v": _lin(sd, f"{prefix}.self_attn.linear_v"),
            "linear_out": _lin(sd, f"{prefix}.self_attn.linear_out"),
            "linear_pos": _lin(sd, f"{prefix}.self_attn.linear_pos", bias=False),
            "pos_bias_u": _np(sd[f"{prefix}.self_attn.pos_bias_u"]),
            "pos_bias_v": _np(sd[f"{prefix}.self_attn.pos_bias_v"]),
        },
        "feed_forward": {
            "w_1": _lin(sd, f"{prefix}.feed_forward.w_1"),
            "w_2": _lin(sd, f"{prefix}.feed_forward.w_2"),
        },
        "norm_mha": _norm(sd, f"{prefix}.norm_mha"),
        "norm_ff": _norm(sd, f"{prefix}.norm_ff"),
    }


def _flow_embed_from_torch(sd: Mapping, prefix: str):
    # wenet LinearNoSubsampling: out = Sequential(Linear, LayerNorm, Dropout)
    return {"linear": _lin(sd, f"{prefix}.out.0"), "norm": _norm(sd, f"{prefix}.out.1")}


def _cfm_resnet_from_torch(sd: Mapping, prefix: str):
    return {
        "mlp": _lin(sd, f"{prefix}.mlp.1"),  # mlp = Sequential(Mish, Linear)
        "block1": {
            "conv": _conv1d_from_torch(sd, f"{prefix}.block1.block.0"),
            "norm": _norm(sd, f"{prefix}.block1.block.1"),
        },
        "block2": {
            "conv": _conv1d_from_torch(sd, f"{prefix}.block2.block.0"),
            "norm": _norm(sd, f"{prefix}.block2.block.1"),
        },
        "res_conv": _conv1d_from_torch(sd, f"{prefix}.res_conv"),
    }


def _cfm_transformer_from_torch(sd: Mapping, prefix: str):
    return {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "attn": {
            "to_q": _lin(sd, f"{prefix}.attn1.to_q", bias=False),
            "to_k": _lin(sd, f"{prefix}.attn1.to_k", bias=False),
            "to_v": _lin(sd, f"{prefix}.attn1.to_v", bias=False),
            "to_out": _lin(sd, f"{prefix}.attn1.to_out.0"),
        },
        "norm3": _norm(sd, f"{prefix}.norm3"),
        "ff": {
            "proj": _lin(sd, f"{prefix}.ff.net.0.proj"),
            "out": _lin(sd, f"{prefix}.ff.net.2"),
        },
    }


def _cfm_stage_from_torch(sd: Mapping, resnet_prefix: str, tf_prefix: str, n_blocks: int):
    return {
        "resnet": _cfm_resnet_from_torch(sd, resnet_prefix),
        "transformers": _stack(
            [_cfm_transformer_from_torch(sd, f"{tf_prefix}.{j}") for j in range(n_blocks)]
        ),
    }


def flow_params_from_torch(sd: Mapping, cfg):
    """CosyVoice2 CausalMaskedDiffWithXvec state_dict -> talker/flow tree.

    cfg: talker.flow.FlowConfig. Layout per the public CosyVoice2 modules the
    reference's audio_detokenizer wheel serializes (flow.inference is driven at
    modeling_bailing_talker.py:553-568): input_embedding / spk_embed_affine /
    UpsampleConformerEncoder / encoder_proj / decoder.estimator U-Net."""
    enc_cfg = cfg.encoder
    dec_cfg = cfg.decoder
    e = "encoder"
    encoder = {
        "embed": _flow_embed_from_torch(sd, f"{e}.embed"),
        "pre_lookahead": {
            "conv1": _conv1d_from_torch(sd, f"{e}.pre_lookahead_layer.conv1"),
            "conv2": _conv1d_from_torch(sd, f"{e}.pre_lookahead_layer.conv2"),
        },
        "encoders": _stack(
            [_conformer_block_from_torch(sd, f"{e}.encoders.{i}") for i in range(enc_cfg.num_blocks)]
        ),
        "up_layer": {"conv": _conv1d_from_torch(sd, f"{e}.up_layer.conv")},
        "up_embed": _flow_embed_from_torch(sd, f"{e}.up_embed"),
        "up_encoders": _stack(
            [
                _conformer_block_from_torch(sd, f"{e}.up_encoders.{i}")
                for i in range(enc_cfg.num_up_blocks)
            ]
        ),
        "after_norm": _norm(sd, f"{e}.after_norm"),
    }
    d = "decoder.estimator"
    decoder = {
        "time_mlp": {
            "linear_1": _lin(sd, f"{d}.time_mlp.linear_1"),
            "linear_2": _lin(sd, f"{d}.time_mlp.linear_2"),
        },
        "down": {
            **_cfm_stage_from_torch(sd, f"{d}.down_blocks.0.0", f"{d}.down_blocks.0.1", dec_cfg.n_blocks),
            "downsample": _conv1d_from_torch(sd, f"{d}.down_blocks.0.2"),
        },
        "mid": _stack(
            [
                _cfm_stage_from_torch(sd, f"{d}.mid_blocks.{i}.0", f"{d}.mid_blocks.{i}.1", dec_cfg.n_blocks)
                for i in range(dec_cfg.num_mid_blocks)
            ]
        ),
        "up": {
            **_cfm_stage_from_torch(sd, f"{d}.up_blocks.0.0", f"{d}.up_blocks.0.1", dec_cfg.n_blocks),
            "upsample": _conv1d_from_torch(sd, f"{d}.up_blocks.0.2"),
        },
        "final_block": {
            "conv": _conv1d_from_torch(sd, f"{d}.final_block.block.0"),
            "norm": _norm(sd, f"{d}.final_block.block.1"),
        },
        "final_proj": _conv1d_from_torch(sd, f"{d}.final_proj"),
    }
    return {
        "input_embedding": {"w": _np(sd["input_embedding.weight"])},
        "spk_embed_affine_layer": _lin(sd, "spk_embed_affine_layer"),
        "encoder": encoder,
        "encoder_proj": _lin(sd, "encoder_proj"),
        "decoder": decoder,
    }
