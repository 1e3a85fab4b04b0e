"""Golden tests: JAX flow (talker/flow.py + flow_encoder.py) vs torch oracle.

The oracle (tools/cosyvoice_oracle.py) recreates the public CosyVoice2
CausalMaskedDiffWithXvec the reference's audio_detokenizer wheel serializes
(modeling_bailing_talker.py:553-568 drives flow.inference). Covers the rel-pos
conformer encoder (espnet rel-shift, pre-lookahead, 2x upsample), the matcha
causal U-Net estimator, the CFG Euler solver, and the streaming chunk masks.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")

torch = pytest.importorskip("torch")

from mingunivision_tpu.talker.flow import (  # noqa: E402
    CFMDecoderConfig,
    FlowConfig,
    cfm_inference,
    estimator_apply,
    flow_inference,
    init_flow_params,
)
from mingunivision_tpu.talker.flow_encoder import (  # noqa: E402
    UpsampleConformerConfig,
    upsample_conformer_forward,
)
from mingunivision_tpu.utils.convert import flow_params_from_torch  # noqa: E402


def _tiny_cfg():
    return FlowConfig(
        vocab_size=50,
        input_size=32,
        output_size=8,
        spk_embed_dim=12,
        encoder=UpsampleConformerConfig(
            input_size=32,
            output_size=32,
            attention_heads=2,
            linear_units=48,
            num_blocks=2,
            num_up_blocks=2,
            pre_lookahead_len=3,
            up_stride=2,
            static_chunk_size=4,
        ),
        decoder=CFMDecoderConfig(
            in_channels=32,  # x + mu + spks + cond = 4 * output_size
            out_channels=8,
            channels=(16,),
            attention_head_dim=8,
            n_blocks=2,
            num_mid_blocks=3,
            num_heads=2,
            static_chunk_size=4,
        ),
        n_timesteps=4,
    )


def _oracle(cfg: FlowConfig):
    from cosyvoice_oracle import (
        CausalConditionalCFM,
        CausalConditionalDecoder,
        CausalMaskedDiffWithXvec,
        UpsampleConformerEncoder,
    )

    torch.manual_seed(0)
    ec = cfg.encoder
    dc = cfg.decoder
    encoder = UpsampleConformerEncoder(
        input_size=ec.input_size,
        output_size=ec.output_size,
        attention_heads=ec.attention_heads,
        linear_units=ec.linear_units,
        num_blocks=ec.num_blocks,
        num_up_blocks=ec.num_up_blocks,
        pre_lookahead_len=ec.pre_lookahead_len,
        up_stride=ec.up_stride,
        static_chunk_size=ec.static_chunk_size,
    )
    estimator = CausalConditionalDecoder(
        in_channels=dc.in_channels,
        out_channels=dc.out_channels,
        channels=dc.channels,
        attention_head_dim=dc.attention_head_dim,
        n_blocks=dc.n_blocks,
        num_mid_blocks=dc.num_mid_blocks,
        num_heads=dc.num_heads,
        static_chunk_size=dc.static_chunk_size,
    )
    decoder = CausalConditionalCFM(estimator, inference_cfg_rate=cfg.inference_cfg_rate)
    return CausalMaskedDiffWithXvec(
        input_size=cfg.input_size,
        output_size=cfg.output_size,
        spk_embed_dim=cfg.spk_embed_dim,
        vocab_size=cfg.vocab_size,
        encoder=encoder,
        decoder=decoder,
        pre_lookahead_len=cfg.pre_lookahead_len,
        n_timesteps=cfg.n_timesteps,
    ).eval()


@pytest.fixture(scope="module")
def setup():
    cfg = _tiny_cfg()
    oracle = _oracle(cfg)
    params = flow_params_from_torch(oracle.state_dict(), cfg)
    return cfg, oracle, params


def test_encoder_matches_oracle(setup):
    cfg, oracle, params = setup
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 9, cfg.input_size)).astype(np.float32)
    with torch.inference_mode():
        ref = oracle.encoder(torch.from_numpy(x)).numpy()
    got = np.asarray(upsample_conformer_forward(params["encoder"], cfg.encoder, jnp.asarray(x)))
    assert got.shape == ref.shape == (1, 18, cfg.encoder.output_size)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_encoder_streaming_and_context(setup):
    cfg, oracle, params = setup
    rng = np.random.default_rng(1)
    La = cfg.pre_lookahead_len
    x = rng.standard_normal((1, 8, cfg.input_size)).astype(np.float32)
    ctx = rng.standard_normal((1, La, cfg.input_size)).astype(np.float32)
    with torch.inference_mode():
        ref = oracle.encoder(torch.from_numpy(x), context=torch.from_numpy(ctx), streaming=True).numpy()
    got = np.asarray(
        upsample_conformer_forward(
            params["encoder"], cfg.encoder, jnp.asarray(x), context=jnp.asarray(ctx), streaming=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_estimator_matches_oracle(setup):
    cfg, oracle, params = setup
    dc = cfg.decoder
    rng = np.random.default_rng(2)
    B, C, T = 2, cfg.output_size, 10
    x = rng.standard_normal((B, C, T)).astype(np.float32)
    mu = rng.standard_normal((B, C, T)).astype(np.float32)
    spks = rng.standard_normal((B, C)).astype(np.float32)
    cond = rng.standard_normal((B, C, T)).astype(np.float32)
    t = np.array([0.3, 0.7], np.float32)
    mask = np.ones((B, 1, T), np.float32)
    est = oracle.decoder.estimator
    with torch.inference_mode():
        ref = est(
            torch.from_numpy(x),
            torch.from_numpy(mask),
            torch.from_numpy(mu),
            torch.from_numpy(t),
            torch.from_numpy(spks),
            torch.from_numpy(cond),
        ).numpy()
    got = np.asarray(
        estimator_apply(
            params["decoder"], dc, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(mu),
            jnp.asarray(t), jnp.asarray(spks), jnp.asarray(cond),
        )
    )
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_full_flow_inference_matches_oracle(setup):
    cfg, oracle, params = setup
    rng = np.random.default_rng(3)
    token = rng.integers(0, cfg.vocab_size, (1, 6)).astype(np.int64)
    prompt_token = rng.integers(0, cfg.vocab_size, (1, 3)).astype(np.int64)
    prompt_feat = rng.standard_normal((1, 6, cfg.output_size)).astype(np.float32)
    embedding = rng.standard_normal((1, cfg.spk_embed_dim)).astype(np.float32)
    noise = rng.standard_normal((1, cfg.output_size, 64)).astype(np.float32)

    ref = oracle.inference(
        torch.from_numpy(token),
        torch.from_numpy(prompt_token),
        torch.from_numpy(prompt_feat),
        torch.from_numpy(embedding),
        torch.from_numpy(noise),
    ).numpy()
    got = np.asarray(
        flow_inference(
            params, cfg, jnp.asarray(token), jnp.asarray(prompt_token),
            jnp.asarray(prompt_feat), jnp.asarray(embedding), jnp.asarray(noise),
        )
    )
    assert got.shape == ref.shape == (1, cfg.output_size, 12)  # (3+6)*2 - 6 prompt frames
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_streaming_chunk_flow_matches_oracle(setup):
    """finalize=False splits lookahead context; streaming applies chunk masks."""
    cfg, oracle, params = setup
    rng = np.random.default_rng(4)
    token = rng.integers(0, cfg.vocab_size, (1, 8)).astype(np.int64)
    prompt_token = rng.integers(0, cfg.vocab_size, (1, 2)).astype(np.int64)
    prompt_feat = rng.standard_normal((1, 4, cfg.output_size)).astype(np.float32)
    embedding = rng.standard_normal((1, cfg.spk_embed_dim)).astype(np.float32)
    noise = rng.standard_normal((1, cfg.output_size, 64)).astype(np.float32)

    ref = oracle.inference(
        torch.from_numpy(token),
        torch.from_numpy(prompt_token),
        torch.from_numpy(prompt_feat),
        torch.from_numpy(embedding),
        torch.from_numpy(noise),
        streaming=True,
        finalize=False,
    ).numpy()
    got = np.asarray(
        flow_inference(
            params, cfg, jnp.asarray(token), jnp.asarray(prompt_token),
            jnp.asarray(prompt_feat), jnp.asarray(embedding), jnp.asarray(noise),
            streaming=True, finalize=False,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_random_init_jit_compiles():
    cfg = _tiny_cfg()
    params = init_flow_params(jax.random.PRNGKey(0), cfg)
    token = jnp.zeros((1, 4), jnp.int32)
    prompt_token = jnp.zeros((1, 2), jnp.int32)
    prompt_feat = jnp.zeros((1, 4, cfg.output_size), jnp.float32)
    emb = jnp.ones((1, cfg.spk_embed_dim), jnp.float32)
    noise = jnp.zeros((1, cfg.output_size, 32), jnp.float32)
    fn = jax.jit(
        lambda p, a, b, c, d, n: flow_inference(p, cfg, a, b, c, d, n),
    )
    out = fn(params, token, prompt_token, prompt_feat, emb, noise)
    assert out.shape == (1, cfg.output_size, 8)
