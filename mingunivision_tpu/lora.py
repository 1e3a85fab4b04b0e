"""Multi-LoRA serving support (the vLLM `SupportsLoRA` analog).

The reference registers its LLM as `BailingMoeForCausalLM(SupportsLoRA, ...)`
with `supported_lora_modules = [query_key_value, dense, dense_h_to_4h,
dense_4h_to_h, gate_up_proj, down_proj]` (reference vllm/ming_lite.patch
:901-940): vLLM attaches per-request low-rank deltas to the base weights and
batches requests with DIFFERENT adapters through one forward.

TPU-first design (not a port of vLLM's punica/SGMV CUDA kernels):
  - Adapters live in a depth-stacked BANK: each target's factors are
    (L, N, in, r) / (L, N, r, out) arrays where N counts adapters and row 0 is
    the reserved NULL adapter (all-zero B => exact base-model output). One
    compiled step serves every adapter mixture — swapping a slot's adapter is
    a host-side int, never a recompile.
  - Per-row application is two einsums: gather the rows' factors by
    `lora_ids` (B,) and compute x @ A_sel @ B_sel. At serving batch sizes the
    gathered factors are KB-scale next to the decode step's weight traffic;
    XLA fuses the whole delta into the surrounding matmul epilogue — a custom
    SGMV kernel buys nothing on this side of the roofline.
  - The bank rides the layer `lax.scan` as an xs operand (leading L axis), so
    the per-layer slice is free, and it is mesh-REPLICATED under sharding
    (rank-r factors are tiny; replication avoids a collective per target).

Targets: the attention projections and the shared-expert SwiGLU — the dense
(non-expert) linears of every decoder layer, matching the reference's
query_key_value / dense / gate-up / down coverage on its dense path. Per-expert
LoRA over the 64-entry routed tables is intentionally out of scope (the
reference's FusedMoE LoRA path); see ARCHITECTURE.md.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mingunivision_tpu.config import BailingMoeConfig

# target name -> (in_dim, out_dim) resolver; keys mirror the reference's
# supported_lora_modules (qkv fused, attention out, shared-expert SwiGLU)
LORA_TARGETS = (
    "query_key_value",
    "dense",
    "shared_gate_proj",
    "shared_up_proj",
    "shared_down_proj",
)


def target_dims(cfg: BailingMoeConfig, target: str):
    h = cfg.hidden_size
    sm = cfg.moe_intermediate_size * cfg.num_shared_experts
    return {
        "query_key_value": (h, cfg.qkv_out_dim),
        "dense": (cfg.num_attention_heads * cfg.head_dim, h),
        "shared_gate_proj": (h, sm),
        "shared_up_proj": (h, sm),
        "shared_down_proj": (sm, h),
    }[target]


def init_lora_adapter(
    key,
    cfg: BailingMoeConfig,
    rank: int = 8,
    alpha: float = 16.0,
    targets: Sequence[str] = LORA_TARGETS,
    dtype=jnp.bfloat16,
    b_zero: bool = True,
):
    """One adapter: {target: {"a": (L, in, r), "b": (L, r, out)}}.

    Standard LoRA init: A ~ N(0, 1/r), B = 0 (delta starts at zero). The
    alpha/rank scale is FOLDED INTO B so runtime application is exactly
    x @ A @ B with no extra multiply. Set b_zero=False for test adapters
    that need a nonzero delta."""
    L = cfg.num_hidden_layers
    out = {}
    keys = jax.random.split(key, 2 * len(targets))
    scale = alpha / rank
    for i, t in enumerate(targets):
        din, dout = target_dims(cfg, t)
        a = jax.random.normal(keys[2 * i], (L, din, rank), dtype) / rank
        if b_zero:
            b = jnp.zeros((L, rank, dout), dtype)
        else:
            b = scale * jax.random.normal(keys[2 * i + 1], (L, rank, dout), dtype) / rank
        out[t] = {"a": a, "b": b}
    return out


def make_lora_bank(adapters: Sequence[Dict], cfg: BailingMoeConfig, dtype=jnp.bfloat16):
    """Stack adapters into the serving bank. Index 0 is the NULL adapter
    (zero factors — requests without LoRA route here); adapter i from the
    input list lands at bank index i+1.

    All adapters must share rank and target set (pad host-side to the max
    rank with zero columns before calling if they differ — zero columns are
    mathematically inert)."""
    assert adapters, "empty adapter list"
    targets = list(adapters[0].keys())
    bank = {}
    for t in targets:
        a_rows = [jnp.zeros_like(adapters[0][t]["a"])] + [ad[t]["a"] for ad in adapters]
        b_rows = [jnp.zeros_like(adapters[0][t]["b"])] + [ad[t]["b"] for ad in adapters]
        bank[t] = {
            "a": jnp.stack(a_rows, axis=1).astype(dtype),  # (L, N+1, in, r)
            "b": jnp.stack(b_rows, axis=1).astype(dtype),  # (L, N+1, r, out)
        }
    return bank


def null_lora_ids(batch: int):
    return jnp.zeros((batch,), jnp.int32)


def lora_delta(x, layer_bank_entry, lora_ids):
    """Per-row low-rank delta for one target at one layer.

    x: (B, T, in); layer_bank_entry: {"a": (N, in, r), "b": (N, r, out)}
    (the layer-sliced bank rows); lora_ids: (B,) int32 bank row per batch
    element (0 = null). Returns (B, T, out) in x.dtype."""
    a = jnp.take(layer_bank_entry["a"], lora_ids, axis=0)  # (B, in, r)
    b = jnp.take(layer_bank_entry["b"], lora_ids, axis=0)  # (B, r, out)
    z = jnp.einsum("bti,bir->btr", x, a.astype(x.dtype), preferred_element_type=jnp.float32)
    d = jnp.einsum("btr,bro->bto", z.astype(x.dtype), b.astype(x.dtype), preferred_element_type=jnp.float32)
    return d.astype(x.dtype)


def load_peft_adapter(state_dict: Dict[str, np.ndarray], cfg: BailingMoeConfig, *,
                      rank: int, alpha: float, dtype=jnp.bfloat16):
    """Convert an HF peft LoRA state dict to our depth-stacked adapter.

    peft stores per-layer `...layers.{i}.<module>.lora_A.weight` as (r, in)
    and `lora_B.weight` as (out, r) torch-layout matrices
    (module names per the reference's supported_lora_modules,
    vllm/ming_lite.patch:913-920). We transpose to (in, r)/(r, out), stack
    over layers, and fold alpha/rank into B. Missing targets are zero-filled
    (an adapter that only tunes attention still serves)."""
    module_map = {
        "attention.query_key_value": "query_key_value",
        "attention.dense": "dense",
        "mlp.shared_experts.gate_proj": "shared_gate_proj",
        "mlp.shared_experts.up_proj": "shared_up_proj",
        "mlp.shared_experts.down_proj": "shared_down_proj",
    }
    L = cfg.num_hidden_layers
    scale = alpha / rank
    adapter = {}
    for mod, t in module_map.items():
        din, dout = target_dims(cfg, t)
        a = np.zeros((L, din, rank), np.float32)
        b = np.zeros((L, rank, dout), np.float32)
        found = False
        for i in range(L):
            ka = next((k for k in state_dict if f"layers.{i}.{mod}.lora_A" in k), None)
            kb = next((k for k in state_dict if f"layers.{i}.{mod}.lora_B" in k), None)
            if ka is None or kb is None:
                continue
            found = True
            a[i] = np.asarray(state_dict[ka], np.float32).T  # (r, in) -> (in, r)
            b[i] = scale * np.asarray(state_dict[kb], np.float32).T  # (out, r) -> (r, out)
        if found:
            adapter[t] = {"a": jnp.asarray(a, dtype), "b": jnp.asarray(b, dtype)}
    # zero-fill untuned targets so every adapter shares the bank's structure
    for t in LORA_TARGETS:
        if t not in adapter:
            din, dout = target_dims(cfg, t)
            adapter[t] = {
                "a": jnp.zeros((L, din, rank), dtype),
                "b": jnp.zeros((L, rank, dout), dtype),
            }
    return adapter


class LoRARegistry:
    """Host-side name -> bank-row map for the serving engines.

    Built once at engine construction (the bank is a static device array —
    adding adapters at runtime means rebuilding the bank, which the server's
    /lora/load endpoint does by draining and re-admitting)."""

    def __init__(self, names: Optional[List[str]] = None):
        self.names = {n: i + 1 for i, n in enumerate(names or [])}  # 0 = null

    def resolve(self, name: Optional[str]) -> int:
        if name is None:
            return 0
        if name not in self.names:
            raise KeyError(f"unknown LoRA adapter {name!r}; loaded: {list(self.names)}")
        return self.names[name]
