"""Mesh / sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mingunivision_tpu.config import BailingMoeConfig, MeshConfig, tiny_llm_config
from mingunivision_tpu.models.bailing_moe import (
    LLMCache,
    bailing_forward,
    compute_logits,
    embed_tokens,
    init_bailing_moe_params,
)
from mingunivision_tpu.parallel.mesh import make_mesh
from mingunivision_tpu.parallel.sharding import llm_param_shardings, llm_param_spec, shard_llm_params

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def cfg8() -> BailingMoeConfig:
    return BailingMoeConfig(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=4,
        head_dim=16,
        moe_intermediate_size=32,
        num_experts=8,
        num_experts_per_tok=2,
        num_shared_experts=2,
        max_position_embeddings=128,
        mrope_section=(2, 3, 3),
    )


class TestShardingSpecs:
    def test_rule_lookup(self):
        class K:  # fake DictKey
            def __init__(self, key):
                self.key = key

        path = (K("layers"), K("attention"), K("query_key_value"), K("w"))
        assert llm_param_spec(path) == P(None, None, "model")
        path = (K("layers"), K("mlp"), K("experts"), K("down_proj"))
        assert llm_param_spec(path) == P(None, "expert", "model", None)
        path = (K("norm"), K("w"))
        assert llm_param_spec(path) == P()


class TestShardedForward:
    def test_tp_ep_forward_matches_single_device(self):
        cfg = cfg8()
        params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 8))
        mask = jnp.zeros((2, 16), bool).at[:, :8].set(True)

        def run(p, m=None):
            cache = LLMCache.create(cfg, 2, 16, jnp.float32)
            h, c2 = bailing_forward(p, cfg, embed_tokens(p, jnp.asarray(ids)), cache, mask)
            return np.asarray(compute_logits(p, cfg, h)), int(c2.length)

        want, _ = run(params)

        mesh = make_mesh(MeshConfig(data=2, expert=2, model=2))
        sharded = shard_llm_params(params, mesh)
        got, length = run(sharded)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
        assert length == 8

    def test_param_placement(self):
        cfg = cfg8()
        params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        mesh = make_mesh(MeshConfig(data=1, expert=2, model=4))
        sharded = shard_llm_params(params, mesh)
        qkv = sharded["layers"]["attention"]["query_key_value"]["w"]
        assert qkv.sharding.spec == P(None, None, "model")
        experts = sharded["layers"]["mlp"]["experts"]["gate_proj"]
        assert experts.sharding.spec == P(None, "expert", None, "model")


class TestShardedSession:
    def test_sharded_session_token_identity(self):
        """Mesh-aware MingUniVisionSession (the 16B serving path, VERDICT #2):
        identical tokens + images sharded vs single-device."""
        from tests.test_engine import tiny_mm
        from mingunivision_tpu.config import GenerationConfig, RuntimeConfig
        from mingunivision_tpu.engine.generate import init_linear_proj_params
        from mingunivision_tpu.engine.session import MingUniVisionSession
        from mingunivision_tpu.models.mingtok import init_mingtok_params
        from mingunivision_tpu.models.rf_head import init_rf_head_params, init_vis_head_params
        from mingunivision_tpu.parallel.sharding import shard_mm_params

        cfg = tiny_mm()
        ks = jax.random.split(jax.random.PRNGKey(0), 5)
        params = {
            "llm": init_bailing_moe_params(ks[0], cfg.llm, dtype=jnp.float32),
            "mingtok": init_mingtok_params(ks[1], cfg.mingtok, dtype=jnp.float32),
            "rf_head": init_rf_head_params(ks[2], cfg.rf_head, dtype=jnp.float32),
            "vis_head": init_vis_head_params(ks[3], cfg.llm.hidden_size, cfg.rf_head.z_channels, dtype=jnp.float32),
            "linear_proj": init_linear_proj_params(ks[4], cfg.mingtok.feature_dim, cfg.llm.hidden_size, cfg.mlp_depth, dtype=jnp.float32),
        }
        runtime = RuntimeConfig(max_seq_len=128, compute_dtype="float32")
        ids = np.random.default_rng(3).integers(0, 400, (1, 6))
        mask = np.ones((1, 6), np.int64)
        gen = GenerationConfig(max_new_tokens=6)

        ref = MingUniVisionSession(params, cfg, runtime, seed=0)
        out_ref = ref.generate(ids, mask, generation=gen)

        mesh = make_mesh(MeshConfig(data=2, expert=2, model=2))
        sharded = shard_mm_params(params, mesh)
        sess = MingUniVisionSession(sharded, cfg, runtime, seed=0, mesh=mesh)
        out = sess.generate(ids, mask, generation=gen)

        assert out.token_ids == out_ref.token_ids
        assert len(out.images) == len(out_ref.images)
        for a, b in zip(out.images, out_ref.images):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)

    def test_quantized_param_sharding(self):
        """Scale leaves of QuantizedArray have size-1 contraction dims; the
        fitted specs must replicate those axes instead of failing (ADVICE r1)."""
        from mingunivision_tpu.utils.quantize import QuantizedArray, quantize_tree

        cfg = cfg8()
        params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        qparams = quantize_tree(params, bits=8, min_size=1024)
        mesh = make_mesh(MeshConfig(data=1, expert=2, model=4))
        sharded = shard_llm_params(qparams, mesh)
        dp = sharded["layers"]["mlp"]["experts"]["down_proj"]
        assert isinstance(dp, QuantizedArray)
        assert dp.q.sharding.spec == P(None, "expert", "model", None)
        # scale (L, E, 1, h): the 'model' axis fell back to replication
        assert dp.s.sharding.spec in (P(None, "expert", None, None), P(None, "expert"))

    def test_16b_fits_v5e8(self):
        """Compile-free memory check: full 16B bf16 params + a 3-row KV cache
        sharded over (1, 2, 4) leave headroom on 16 GB v5e chips."""
        from mingunivision_tpu.config import BailingMoeConfig
        from mingunivision_tpu.parallel.sharding import cache_sharding, fit_spec, llm_param_spec

        cfg = BailingMoeConfig()  # real 16B shapes
        mesh = make_mesh(MeshConfig(data=1, expert=2, model=4))
        shapes = jax.eval_shape(lambda k: init_bailing_moe_params(k, cfg, dtype=jnp.bfloat16), jax.random.PRNGKey(0))

        def per_device_bytes(path, leaf):
            spec = fit_spec(llm_param_spec(path), leaf.shape, mesh)
            ways = 1
            for name in spec:
                if name is not None:
                    names = name if isinstance(name, tuple) else (name,)
                    for n in names:
                        ways *= mesh.shape[n]
            return leaf.size * leaf.dtype.itemsize // ways

        total = sum(
            jax.tree_util.tree_leaves(jax.tree_util.tree_map_with_path(per_device_bytes, shapes))
        )
        # KV cache: 3 CFG rows, 4096 ctx, kv-heads over model(4)
        cache_shape = jax.eval_shape(lambda: LLMCache.create(cfg, 3, 4096, jnp.bfloat16))
        kv_bytes = 2 * cache_shape.k.size * 2 // 4
        gib = (total + kv_bytes) / 2**30
        assert gib < 12.0, f"16B sharded footprint {gib:.1f} GiB/chip won't serve on 16 GB v5e"


class TestGraftEntry:
    def test_dryrun_multichip_8(self):
        import importlib.util, os

        spec = importlib.util.spec_from_file_location(
            "graft_entry", os.path.join(os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)


class TestPipelineParallel:
    """PP over a `stage` mesh (the reference's vLLM SupportsPP analog,
    parallel/pipeline.py): ring decode + GPipe microbatch forward."""

    def test_pipeline_decode_matches_single_device(self):
        from mingunivision_tpu.parallel.pipeline import (
            make_stage_cache,
            make_stage_mesh,
            pipeline_decode_step,
            shard_stage_params,
            split_stage_params,
        )

        cfg = cfg8()  # 2 layers
        params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        S = 2
        mesh = make_stage_mesh(S)
        stage_params = shard_stage_params(split_stage_params(params["layers"], S), mesh)

        B, Smax = 2, 32
        ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (B, 3))
        # reference run: plain bailing_forward, token by token
        cache_ref = LLMCache.create(cfg, B, Smax, jnp.float32)
        mask = jnp.zeros((B, Smax), bool)
        hs_ref = []
        for t in range(3):
            mask = mask.at[:, t].set(True)
            e = embed_tokens(params, jnp.asarray(ids[:, t : t + 1]))
            h, cache_ref = bailing_forward(params, cfg, e, cache_ref, mask)
            hs_ref.append(np.asarray(h))

        cache_pp = make_stage_cache(cfg, S, B, Smax, mesh, dtype=jnp.float32)
        mask = jnp.zeros((B, Smax), bool)
        for t in range(3):
            mask = mask.at[:, t].set(True)
            e = embed_tokens(params, jnp.asarray(ids[:, t : t + 1]))
            h_pp, cache_pp = pipeline_decode_step(stage_params, cfg, e, cache_pp, mask, mesh=mesh, n_stages=S)
            # pipeline output is PRE final-norm; bailing_forward applies norm
            from mingunivision_tpu.ops.norms import rms_norm

            h_pp = rms_norm(h_pp, params["norm"]["w"], eps=cfg.rms_norm_eps)
            np.testing.assert_allclose(np.asarray(h_pp), hs_ref[t], rtol=2e-3, atol=2e-3)

    def test_microbatched_forward_matches_plain(self):
        from mingunivision_tpu.parallel.pipeline import (
            make_stage_mesh,
            pipeline_forward_microbatched,
            shard_stage_params,
            split_stage_params,
        )

        cfg = cfg8()
        params = init_bailing_moe_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
        S, M, B, T = 2, 3, 2, 6
        mesh = make_stage_mesh(S)
        stage_params = shard_stage_params(split_stage_params(params["layers"], S), mesh)
        rng = np.random.default_rng(2)
        ids = rng.integers(0, cfg.vocab_size, (M, B, T))
        mask = jnp.ones((B, T), bool)

        embeds = jnp.stack([embed_tokens(params, jnp.asarray(ids[m])) for m in range(M)])
        got = pipeline_forward_microbatched(stage_params, cfg, embeds, mask, mesh=mesh, n_stages=S)

        from mingunivision_tpu.ops.norms import rms_norm

        for m in range(M):
            cache = LLMCache.create(cfg, B, T, jnp.float32)
            want, _ = bailing_forward(params, cfg, embeds[m], cache, mask)
            # un-norm: bailing_forward normed; pipeline returns pre-norm
            got_m = rms_norm(got[m], params["norm"]["w"], eps=cfg.rms_norm_eps)
            np.testing.assert_allclose(np.asarray(got_m), np.asarray(want), rtol=2e-3, atol=2e-3)

    def test_pipeline_decode_quantized_tables(self):
        """PP stage chunks carry int8 QuantizedArray tables (reshape through
        split_stage_params) and still match the single-device forward."""
        from mingunivision_tpu.ops.norms import rms_norm
        from mingunivision_tpu.parallel.pipeline import (
            make_stage_cache,
            make_stage_mesh,
            pipeline_decode_step,
            shard_stage_params,
            split_stage_params,
        )
        from mingunivision_tpu.utils.quantize import quantize_tree

        cfg = cfg8()
        params = init_bailing_moe_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
        qparams = dict(params)
        qparams["layers"] = quantize_tree(params["layers"], bits=8, min_size=1024)
        S = 2
        mesh = make_stage_mesh(S)
        stage_params = shard_stage_params(split_stage_params(qparams["layers"], S), mesh)

        B, Smax = 1, 16
        ids = np.random.default_rng(4).integers(0, cfg.vocab_size, (B, 2))
        cache_ref = LLMCache.create(cfg, B, Smax, jnp.float32)
        cache_pp = make_stage_cache(cfg, S, B, Smax, mesh, dtype=jnp.float32)
        mask = jnp.zeros((B, Smax), bool)
        for t in range(2):
            mask = mask.at[:, t].set(True)
            e = embed_tokens(qparams, jnp.asarray(ids[:, t : t + 1]))
            h_ref, cache_ref = bailing_forward(qparams, cfg, e, cache_ref, mask)
            h_pp, cache_pp = pipeline_decode_step(stage_params, cfg, e, cache_pp, mask, mesh=mesh, n_stages=S)
            h_pp = rms_norm(h_pp, qparams["norm"]["w"], eps=cfg.rms_norm_eps)
            np.testing.assert_allclose(np.asarray(h_pp), np.asarray(h_ref), rtol=2e-3, atol=2e-3)


class TestAOT16BLower:
    """VERDICT r2 #7: AOT-compile the REAL sharded 16B decode graph (no
    execution, no weights — abstract args with (1, 2, 4) shardings on the
    virtual 8-device mesh). This is the check that would have caught the
    round-1 2.4 GB layout-copy OOM class: giant XLA temps show up in the
    compiled memory analysis even though nothing runs."""

    def test_16b_decode_step_lowers_and_compiles(self):
        from mingunivision_tpu.models.bailing_moe import bailing_forward
        from mingunivision_tpu.parallel.sharding import cache_sharding

        import dataclasses

        # real 16B shapes (h=2048, 28L, E=64); dispatch forced to masked-dense
        # so the CPU lowering matches the sharded TPU serving graph instead of
        # the CPU-only gather path (which all-gathers expert tables: ~8.6 GiB
        # of temps that the TPU graph never allocates)
        cfg = dataclasses.replace(BailingMoeConfig(), moe_force_dispatch="dense")
        mesh = make_mesh(MeshConfig(data=1, expert=2, model=4))
        B, S = 3, 4096  # CFG rows, serving context

        params_sh = jax.eval_shape(
            lambda k: init_bailing_moe_params(k, cfg, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
        )
        param_shardings = llm_param_shardings(params_sh, mesh)
        params_abs = jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            params_sh,
            param_shardings,
        )
        cache_sh = jax.eval_shape(lambda: LLMCache.create(cfg, B, S, jnp.bfloat16))
        csh = cache_sharding(mesh, cache_sh)
        cache_abs = jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh), cache_sh, csh
        )
        repl = NamedSharding(mesh, P())
        embeds = jax.ShapeDtypeStruct((B, 1, cfg.hidden_size), jnp.bfloat16, sharding=repl)
        mask = jax.ShapeDtypeStruct((B, S), jnp.bool_, sharding=repl)

        @jax.jit
        def decode_step(params, embeds, cache, mask):
            hidden, cache = bailing_forward(params, cfg, embeds, cache, mask)
            return hidden, cache

        lowered = decode_step.lower(params_abs, embeds, cache_abs, mask)
        compiled = lowered.compile()  # would raise on layout/sharding blowups
        try:
            ma = compiled.memory_analysis()
        except Exception:
            return  # backend without memory analysis: compile success is the gate
        # per-device ARGUMENT bytes prove the (1, 2, 4) sharding really divides
        # the 31 GiB bf16 16B tree 8 ways (~4.1 GiB/device)
        arg_gib = ma.argument_size_in_bytes / 2**30
        assert 3.5 < arg_gib < 5.0, f"sharded 16B args {arg_gib:.2f} GiB/device"
        # TEMP baseline measured on the CPU backend: 8.5 GiB — XLA:CPU hoists
        # an fp32 upcast of every scanned layer's bf16 expert tables out of the
        # scan (~0.30 GiB x 28L; the TPU MXU consumes bf16 directly, so the
        # TPU graph never allocates these). The bound is set one layout-copy
        # regression above that CPU baseline: the round-1 class of bug
        # (+2.4 GiB table-layout copies) trips it
        temp_gib = ma.temp_size_in_bytes / 2**30
        assert temp_gib < 10.5, f"decode-step XLA temps {temp_gib:.2f} GiB/device (CPU baseline 8.5)"

    def test_16b_prefill_step_lowers_and_compiles(self):
        """The OTHER serving-critical 16B graph: a 4096-token prefill append
        (flash path off: the CPU lowering must match the GSPMD masked-dense
        dispatch the sharded TPU graph uses, as in the decode test above)."""
        from mingunivision_tpu.models.bailing_moe import bailing_forward
        from mingunivision_tpu.parallel.sharding import cache_sharding

        import dataclasses

        cfg = dataclasses.replace(BailingMoeConfig(), moe_force_dispatch="dense")
        mesh = make_mesh(MeshConfig(data=1, expert=2, model=4))
        B, S, T = 1, 4096, 4096

        params_sh = jax.eval_shape(
            lambda k: init_bailing_moe_params(k, cfg, dtype=jnp.bfloat16), jax.random.PRNGKey(0)
        )
        param_shardings = llm_param_shardings(params_sh, mesh)
        params_abs = jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            params_sh,
            param_shardings,
        )
        cache_sh = jax.eval_shape(lambda: LLMCache.create(cfg, B, S, jnp.bfloat16))
        csh = cache_sharding(mesh, cache_sh)
        cache_abs = jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh), cache_sh, csh
        )
        repl = NamedSharding(mesh, P())
        embeds = jax.ShapeDtypeStruct((B, T, cfg.hidden_size), jnp.bfloat16, sharding=repl)
        mask = jax.ShapeDtypeStruct((B, S), jnp.bool_, sharding=repl)

        @jax.jit
        def prefill_step(params, embeds, cache, mask):
            return bailing_forward(params, cfg, embeds, cache, mask)

        compiled = prefill_step.lower(params_abs, embeds, cache_abs, mask).compile()
        try:
            ma = compiled.memory_analysis()
        except Exception:
            return
        arg_gib = ma.argument_size_in_bytes / 2**30
        assert 3.5 < arg_gib < 5.0, f"sharded 16B prefill args {arg_gib:.2f} GiB/device"
        # prefill temps are dominated by the 4096-token activations plus the
        # same CPU-only fp32 expert-table upcast as the decode test; bound one
        # layout-copy regression above the measured CPU baseline
        temp_gib = ma.temp_size_in_bytes / 2**30
        assert temp_gib < 14.0, f"prefill-step XLA temps {temp_gib:.2f} GiB/device"
