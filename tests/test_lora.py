"""Multi-LoRA serving (lora.py): delta math, null-adapter identity, batched
mixed-adapter parity, paged-engine integration + prefix-cache salting, peft
conversion, and sharded-mesh parity with a nonzero adapter (the vLLM
SupportsLoRA analog — reference vllm/ming_lite.patch:901-940)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.config import MeshConfig, tiny_llm_config
from mingunivision_tpu.engine.batch_engine import ContinuousBatchingEngine
from mingunivision_tpu.engine.paged import PagedBatchingEngine
from mingunivision_tpu.lora import (
    LORA_TARGETS,
    LoRARegistry,
    init_lora_adapter,
    load_peft_adapter,
    make_lora_bank,
    target_dims,
)
from mingunivision_tpu.models.bailing_moe import (
    LLMCache,
    bailing_forward,
    embed_tokens,
    init_bailing_moe_params,
)


@pytest.fixture(scope="module")
def llm():
    cfg = tiny_llm_config()
    params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    return cfg, params


def _forward(cfg, params, ids, lora_bank=None, lora_ids=None):
    B, T = ids.shape
    cache = LLMCache.create(cfg, B, 64, jnp.float32)
    mask = jnp.zeros((B, 64), bool).at[:, :T].set(True)
    x = embed_tokens(params, jnp.asarray(ids)).astype(jnp.float32)
    h, _ = bailing_forward(params, cfg, x, cache, mask, lora_bank=lora_bank, lora_ids=lora_ids)
    return np.asarray(h)


def _materialize(params, adapter):
    """Fold an adapter into the base weights: W' = W + A @ B per target/layer
    — the mathematical definition the batched runtime path must match."""
    import copy

    p = jax.tree_util.tree_map(lambda x: x, params)  # shallow structural copy
    p = copy.deepcopy(jax.device_get(p))
    layers = p["layers"]

    def fold(node, key, t):
        node[key] = {
            **node[key],
            "w": node[key]["w"] + np.einsum("lir,lro->lio", np.asarray(adapter[t]["a"], np.float64), np.asarray(adapter[t]["b"], np.float64)).astype(node[key]["w"].dtype),
        }

    fold(layers["attention"], "query_key_value", "query_key_value")
    fold(layers["attention"], "dense", "dense")
    se = layers["mlp"]["shared_experts"]
    fold(se, "gate_proj", "shared_gate_proj")
    fold(se, "up_proj", "shared_up_proj")
    fold(se, "down_proj", "shared_down_proj")
    return jax.tree_util.tree_map(jnp.asarray, p)


class TestLoRAMath:
    def test_null_adapter_matches_base(self, llm):
        """Bank row 0 (zero factors) must reproduce the base model exactly."""
        cfg, params = llm
        ad = init_lora_adapter(jax.random.PRNGKey(1), cfg, rank=4, dtype=jnp.float32, b_zero=False)
        bank = make_lora_bank([ad], cfg, dtype=jnp.float32)
        ids = np.asarray([[5, 9, 22, 301]])
        base = _forward(cfg, params, ids)
        nulled = _forward(cfg, params, ids, lora_bank=bank, lora_ids=jnp.zeros((1,), jnp.int32))
        np.testing.assert_allclose(nulled, base, rtol=1e-6, atol=1e-6)

    def test_b_zero_init_is_identity(self, llm):
        """Standard LoRA init (B = 0): the freshly initialized adapter is a
        no-op even at row > 0."""
        cfg, params = llm
        ad = init_lora_adapter(jax.random.PRNGKey(2), cfg, rank=4, dtype=jnp.float32)  # b_zero
        bank = make_lora_bank([ad], cfg, dtype=jnp.float32)
        ids = np.asarray([[5, 9, 22, 301]])
        base = _forward(cfg, params, ids)
        got = _forward(cfg, params, ids, lora_bank=bank, lora_ids=jnp.ones((1,), jnp.int32))
        np.testing.assert_allclose(got, base, rtol=1e-6, atol=1e-6)

    def test_delta_matches_materialized_weights(self, llm):
        """x @ W + (x @ A) @ B == x @ (W + A @ B): the batched delta path must
        match an adapter FOLDED into the base weights (up to fp association)."""
        cfg, params = llm
        ad = init_lora_adapter(jax.random.PRNGKey(3), cfg, rank=4, dtype=jnp.float32, b_zero=False)
        bank = make_lora_bank([ad], cfg, dtype=jnp.float32)
        ids = np.asarray([[17, 401, 3, 77, 240]])
        got = _forward(cfg, params, ids, lora_bank=bank, lora_ids=jnp.ones((1,), jnp.int32))
        want = _forward(cfg, _materialize(params, ad), ids)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_per_row_adapters_are_independent(self, llm):
        """A batch mixing (null, ad1, ad2) rows must equal the three solo
        forwards — rows must never see each other's adapters."""
        cfg, params = llm
        ads = [
            init_lora_adapter(jax.random.PRNGKey(4), cfg, rank=4, dtype=jnp.float32, b_zero=False),
            init_lora_adapter(jax.random.PRNGKey(5), cfg, rank=4, dtype=jnp.float32, b_zero=False),
        ]
        bank = make_lora_bank(ads, cfg, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 500, (3, 6))
        mixed = _forward(cfg, params, ids, lora_bank=bank, lora_ids=jnp.asarray([0, 1, 2], jnp.int32))
        for row, lid in enumerate([0, 1, 2]):
            solo = _forward(cfg, params, ids[row : row + 1], lora_bank=bank,
                            lora_ids=jnp.full((1,), lid, jnp.int32))
            np.testing.assert_allclose(mixed[row], solo[0], rtol=1e-5, atol=1e-5)


class TestLoRAEngines:
    def test_batched_engine_mixed_adapters(self, llm):
        """Continuous batching with per-request adapters: each request's tokens
        match its solo run (same seed) — the vLLM multi-LoRA batching contract."""
        cfg, params = llm
        ads = [init_lora_adapter(jax.random.PRNGKey(6 + i), cfg, rank=4, dtype=jnp.float32, b_zero=False)
               for i in range(2)]
        bank = make_lora_bank(ads, cfg, dtype=jnp.float32)
        rng = np.random.default_rng(1)
        prompts = [rng.integers(0, 400, (n,)) for n in (7, 12, 9)]
        loras = [None, "ad1", "ad2"]

        def solo(ids, lora):
            e = ContinuousBatchingEngine(params, cfg, slots=1, max_len=128, dtype=jnp.float32,
                                         seed=0, lora_bank=bank, lora_names=["ad1", "ad2"])
            r = e.add_request(ids, 8, lora=lora)
            e.run_to_completion(64)
            return r.tokens

        want = [solo(p, lo) for p, lo in zip(prompts, loras)]
        eng = ContinuousBatchingEngine(params, cfg, slots=3, max_len=128, dtype=jnp.float32,
                                       seed=0, lora_bank=bank, lora_names=["ad1", "ad2"])
        reqs = [eng.add_request(p, 8, lora=lo) for p, lo in zip(prompts, loras)]
        eng.run_to_completion(64)
        for r, w in zip(reqs, want):
            assert r.tokens == w
        # adapters must actually change the output (nonzero B)
        base = solo(prompts[1], None)
        assert want[1] != base or want[2] != base

    def test_unknown_adapter_rejected(self, llm):
        cfg, params = llm
        ad = init_lora_adapter(jax.random.PRNGKey(8), cfg, rank=4, dtype=jnp.float32)
        bank = make_lora_bank([ad], cfg, dtype=jnp.float32)
        eng = ContinuousBatchingEngine(params, cfg, slots=1, max_len=64, dtype=jnp.float32,
                                       lora_bank=bank, lora_names=["ad1"])
        with pytest.raises(KeyError):
            eng.add_request(np.asarray([1, 2, 3]), 4, lora="nope")

    def test_paged_engine_matches_dense_engine_with_lora(self, llm):
        """Paged pool + adapter: bit-identical to the dense pool with the same
        adapter (the paged tier keeps the parity contract under LoRA)."""
        cfg, params = llm
        ad = init_lora_adapter(jax.random.PRNGKey(9), cfg, rank=4, dtype=jnp.float32, b_zero=False)
        bank = make_lora_bank([ad], cfg, dtype=jnp.float32)
        rng = np.random.default_rng(2)
        ids = rng.integers(0, 400, (20,))
        dense = ContinuousBatchingEngine(params, cfg, slots=2, max_len=128, dtype=jnp.float32,
                                         seed=0, lora_bank=bank, lora_names=["ad1"])
        paged = PagedBatchingEngine(params, cfg, slots=2, max_len=128, page_size=32,
                                    dtype=jnp.float32, seed=0, lora_bank=bank, lora_names=["ad1"])
        rd = dense.add_request(ids, 8, lora="ad1")
        rp = paged.add_request(ids, 8, lora="ad1")
        dense.run_to_completion(64)
        paged.run_to_completion(64)
        assert rp.tokens == rd.tokens

    def test_prefix_cache_salted_by_adapter(self, llm):
        """KV computed under adapter X must never serve a base-model request:
        the same prompt under a different adapter is a prefix-cache MISS."""
        cfg, params = llm
        ad = init_lora_adapter(jax.random.PRNGKey(10), cfg, rank=4, dtype=jnp.float32, b_zero=False)
        bank = make_lora_bank([ad], cfg, dtype=jnp.float32)
        rng = np.random.default_rng(3)
        ids = rng.integers(0, 400, (70,))  # 2 full pages at page 32
        eng = PagedBatchingEngine(params, cfg, slots=2, max_len=256, page_size=32,
                                  num_pages=16, dtype=jnp.float32, prefix_cache=True,
                                  lora_bank=bank, lora_names=["ad1"])
        eng.add_request(ids, 4)  # base model, caches 2 pages
        eng.run_to_completion(64)
        assert eng.prefix.cached_pages == 2
        eng.add_request(ids, 4, lora="ad1")  # same tokens, different adapter
        eng.run_to_completion(64)
        assert eng.prefix_hit_tokens == 0  # salted: no cross-adapter hit
        r3 = eng.add_request(ids, 4, lora="ad1")  # same adapter: NOW it hits
        eng.run_to_completion(64)
        assert eng.prefix_hit_tokens == 64
        assert r3.done


class TestLoRAShardedParity:
    def test_mesh_parity_with_nonzero_adapter(self, llm):
        """VERDICT r3 done-criterion: virtual-mesh engine with a nonzero
        adapter emits the same tokens as the single-device engine."""
        cfg, params = llm
        from mingunivision_tpu.parallel.mesh import make_mesh
        from mingunivision_tpu.parallel.sharding import shard_llm_params

        ad = init_lora_adapter(jax.random.PRNGKey(11), cfg, rank=4, dtype=jnp.float32, b_zero=False)
        bank = make_lora_bank([ad], cfg, dtype=jnp.float32)
        rng = np.random.default_rng(4)
        ids = rng.integers(0, 400, (11,))

        solo = ContinuousBatchingEngine(params, cfg, slots=2, max_len=128, dtype=jnp.float32,
                                        seed=0, lora_bank=bank, lora_names=["ad1"])
        rs = solo.add_request(ids, 8, lora="ad1")
        solo.run_to_completion(64)

        mesh = make_mesh(MeshConfig(data=2, expert=2, model=2))
        sharded = shard_llm_params(params, mesh)
        eng = ContinuousBatchingEngine(sharded, cfg, slots=2, max_len=128, dtype=jnp.float32,
                                       seed=0, mesh=mesh, lora_bank=bank, lora_names=["ad1"])
        rm = eng.add_request(ids, 8, lora="ad1")
        eng.run_to_completion(64)
        assert rm.tokens == rs.tokens
        assert rs.tokens  # nonzero generation happened


class TestPeftConversion:
    def test_load_peft_adapter_roundtrip(self, llm):
        """A synthetic peft state dict (torch (r,in)/(out,r) layouts) converts
        to factors whose folded delta matches alpha/r * B @ A per layer."""
        cfg, params = llm
        rng = np.random.default_rng(5)
        r, alpha = 4, 8.0
        sd = {}
        for i in range(cfg.num_hidden_layers):
            for mod, t in [("attention.query_key_value", "query_key_value"),
                           ("attention.dense", "dense")]:
                din, dout = target_dims(cfg, t)
                sd[f"base_model.model.model.layers.{i}.{mod}.lora_A.weight"] = rng.normal(size=(r, din)).astype(np.float32)
                sd[f"base_model.model.model.layers.{i}.{mod}.lora_B.weight"] = rng.normal(size=(dout, r)).astype(np.float32)
        ad = load_peft_adapter(sd, cfg, rank=r, alpha=alpha, dtype=jnp.float32)
        assert set(ad) == set(LORA_TARGETS)
        # tuned targets: folded scale; untuned ones zero-filled
        for i in range(cfg.num_hidden_layers):
            a_t = sd[f"base_model.model.model.layers.{i}.attention.dense.lora_A.weight"]
            b_t = sd[f"base_model.model.model.layers.{i}.attention.dense.lora_B.weight"]
            want = (alpha / r) * (b_t @ a_t).T  # (in, out)
            got = np.asarray(ad["dense"]["a"][i]) @ np.asarray(ad["dense"]["b"][i])
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        assert np.all(np.asarray(ad["shared_gate_proj"]["b"]) == 0)

    def test_registry(self):
        reg = LoRARegistry(["x", "y"])
        assert reg.resolve(None) == 0
        assert reg.resolve("x") == 1 and reg.resolve("y") == 2
        with pytest.raises(KeyError):
            reg.resolve("z")
