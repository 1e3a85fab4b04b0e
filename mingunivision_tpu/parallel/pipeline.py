"""Pipeline parallelism over a `stage` mesh axis (shard_map + ppermute ring).

The reference's serving stack supports PP through vLLM (`SupportsPP`,
`get_pp_group`, `make_layers`/`PPMissingLayer`, IntermediateTensors —
vllm/ming_lite.patch:901-1067). TPU-native equivalent: the depth-stacked layer
params are split into S contiguous stage chunks sharded over a 1-D `stage`
mesh; activations travel the stage ring with `lax.ppermute` inside a
`shard_map`. Two entry points:

  - `pipeline_decode_step`: one token step for inference. A single wave passes
    through the S stages in S ring steps; each stage's KV-cache chunk is
    written only on its own turn (masked update — SPMD devices run every step).
  - `pipeline_forward_microbatched`: GPipe-style forward over M microbatches —
    M + S - 1 ring steps, stages busy once the pipe fills (utilization
    M / (M + S - 1)); the building block for pipeline training.

This is the latency-oriented option for topologies where TP+EP saturates ICI
(ROADMAP P2); on a single v5e-8 slice TP/EP remains the default
(parallel/sharding.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mingunivision_tpu.config import BailingMoeConfig
from mingunivision_tpu.models.bailing_moe import LLMCache, decoder_layer_apply
from mingunivision_tpu.ops.rope import rope_cos_sin


def make_stage_mesh(n_stages: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())[:n_stages]
    return Mesh(np.asarray(devices), ("stage",))


def split_stage_params(params, n_stages: int):
    """Reshape every depth-stacked (L, ...) layer leaf to (S, L/S, ...).

    The per-stage chunk keeps layers CONTIGUOUS (stage s owns layers
    [s*L/S, (s+1)*L/S) — the reference's make_layers split)."""

    def reshape(x):
        L = x.shape[0]
        assert L % n_stages == 0, f"layers {L} not divisible by stages {n_stages}"
        return x.reshape(n_stages, L // n_stages, *x.shape[1:])

    return jax.tree_util.tree_map(reshape, params)


def shard_stage_params(stage_params, mesh: Mesh):
    """Place (S, L/S, ...) chunks with stage s's layers on device s."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("stage"))), stage_params
    )


def make_stage_cache(cfg: BailingMoeConfig, n_stages: int, batch: int, max_len: int, mesh: Mesh, dtype=jnp.bfloat16):
    """KV cache (S, L/S, B, Hkv, S_len, D), layer chunks sharded over `stage`."""
    Lps = cfg.num_hidden_layers // n_stages
    shape = (n_stages, Lps, batch, cfg.num_key_value_heads, max_len, cfg.head_dim)
    kv = NamedSharding(mesh, P("stage"))
    k = jax.device_put(jnp.zeros(shape, dtype), kv)
    v = jax.device_put(jnp.zeros(shape, dtype), kv)
    return LLMCache(k, v, jnp.zeros((), jnp.int32))


def _stage_chunk_forward(chunk_params, cfg, x, kc, vc, length, mask, cos, sin):
    """Run this stage's L/S layers (mirrors bailing_forward's scan body)."""
    experts_stacked = chunk_params["mlp"]["experts"]
    scanned = {**chunk_params, "mlp": {k: v for k, v in chunk_params["mlp"].items() if k != "experts"}}
    Lps = kc.shape[0]

    def body(carry, inp):
        h = carry
        p, li, k_l, v_l = inp
        h, nk, nv, _ = decoder_layer_apply(
            p, cfg, h, cos, sin, k_l, v_l, length, mask,
            None, None, experts_stacked=experts_stacked, layer_idx=li,
        )
        return h, (nk, nv)

    layer_ids = jnp.arange(Lps, dtype=jnp.int32)
    x, (nk, nv) = lax.scan(body, x, (scanned, layer_ids, kc, vc))
    return x, nk, nv


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_stages", "mesh"), donate_argnames=("cache",)
)
def pipeline_decode_step(stage_params, cfg: BailingMoeConfig, embeds, cache: LLMCache, mask, *, mesh: Mesh, n_stages: int):
    """One decode step through the stage ring.

    embeds: (B, 1, h); cache: stage-sharded LLMCache; mask: (B, S_len) bool
    (the new position must already be marked). Returns (hidden (B, 1, h),
    new_cache) — hidden is the LAST stage's output, delivered back to all
    stages by the final ppermute.
    """
    B, T, h = embeds.shape
    pos = jnp.sum(mask.astype(jnp.int32), axis=1)[:, None] - 1
    cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)

    def fn(p_local, x, k_local, v_local, length, mask, cos, sin):
        # p_local/k/v carry the leading (1, ...) stage-chunk axis
        p = jax.tree_util.tree_map(lambda a: a[0], p_local)
        kc, vc = k_local[0], v_local[0]
        s_idx = lax.axis_index("stage")
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def ring_step(i, carry):
            x, kc, vc = carry
            y, nk, nv = _stage_chunk_forward(p, cfg, x, kc, vc, length, mask, cos, sin)
            my_turn = i == s_idx
            # the valid wave is at stage i: only it forwards its output and
            # commits its cache writes; everyone else passes x through untouched
            out = jnp.where(my_turn, y, x)
            kc = jnp.where(my_turn, nk, kc)
            vc = jnp.where(my_turn, nv, vc)
            out = lax.ppermute(out, "stage", perm)
            return (out, kc, vc)

        x, kc, vc = lax.fori_loop(0, n_stages, ring_step, (x, kc, vc))
        # after S steps the final hidden sits at stage 0; broadcast via masked psum
        x = lax.psum(jnp.where(s_idx == 0, x, jnp.zeros_like(x)), "stage")
        return x, k_local.at[0].set(kc), v_local.at[0].set(vc)

    spec_p = jax.tree_util.tree_map(lambda _: P("stage"), stage_params)
    hidden, nk, nv = shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec_p, P(), P("stage"), P("stage"), P(), P(), P(), P()),
        out_specs=(P(), P("stage"), P("stage")),
        check_vma=False,
    )(stage_params, embeds, cache.k, cache.v, cache.length, mask, cos, sin)
    return hidden, LLMCache(nk, nv, cache.length + T)


@functools.partial(jax.jit, static_argnames=("cfg", "n_stages", "mesh"))
def pipeline_forward_microbatched(stage_params, cfg: BailingMoeConfig, embeds_mb, mask, *, mesh: Mesh, n_stages: int):
    """GPipe-style forward: M microbatches stream through S stages in
    M + S - 1 ring steps (stage s works on microbatch i at step s + i).

    embeds_mb: (M, B, T, h); mask: (B, T) shared. Returns (M, B, T, h) hidden
    states (pre final-norm — the caller composes norm + logits). Training-
    oriented: no KV caches (full-context attention inside each microbatch).
    """
    M, B, T, h = embeds_mb.shape
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    Lps = cfg.num_hidden_layers // n_stages

    def fn(p_local, xs, mask, cos, sin):
        p = jax.tree_util.tree_map(lambda a: a[0], p_local)
        s_idx = lax.axis_index("stage")
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        n_steps = M + n_stages - 1

        def chunk(x):
            kc = jnp.zeros((Lps, B, cfg.num_key_value_heads, T, cfg.head_dim), x.dtype)
            vc = jnp.zeros_like(kc)
            y, _, _ = _stage_chunk_forward(p, cfg, x, kc, vc, jnp.int32(0), mask, cos, sin)
            return y

        def step(i, carry):
            inflight, done = carry  # inflight: my current activation (B, T, h)
            mb_here = i - s_idx  # which microbatch this stage works on now
            active = (mb_here >= 0) & (mb_here < M)
            # stage 0 ingests microbatch i from the schedule
            feed = lax.dynamic_index_in_dim(xs, jnp.clip(i, 0, M - 1), keepdims=False)
            x_in = jnp.where(s_idx == 0, feed, inflight)
            y = chunk(x_in)
            y = jnp.where(active, y, x_in)
            # the last stage retires its finished microbatch into `done`
            retire = active & (s_idx == n_stages - 1)
            idx = jnp.clip(mb_here, 0, M - 1)
            done = lax.cond(
                retire,
                lambda d: lax.dynamic_update_index_in_dim(d, y, idx, axis=0),
                lambda d: d,
                done,
            )
            inflight = lax.ppermute(y, "stage", perm)
            return (inflight, done)

        inflight0 = jnp.zeros((B, T, h), xs.dtype)
        done0 = jnp.zeros((M, B, T, h), xs.dtype)
        _, done = lax.fori_loop(0, n_steps, step, (inflight0, done0))
        # `done` lives on the last stage; psum-or-broadcast it everywhere
        done = lax.psum(done, "stage") if n_stages > 1 else done
        return done

    spec_p = jax.tree_util.tree_map(lambda _: P("stage"), stage_params)
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec_p, P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(stage_params, embeds_mb, mask, cos, sin)
