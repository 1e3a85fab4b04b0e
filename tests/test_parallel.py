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


class TestGraftEntry:
    def test_dryrun_multichip_8(self):
        import importlib.util, os

        spec = importlib.util.spec_from_file_location(
            "graft_entry", os.path.join(os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)
