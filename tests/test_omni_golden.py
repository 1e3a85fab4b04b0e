"""Golden parity for the omni towers against their public torch implementations.

The omni checkpoint loads its towers via trust_remote_code classes whose
architectures are the public HF ones (ming_lite.patch :1456 `qwen2_5_vit` =
Qwen2.5-VL vision tower; :1458 `modeling_whisper_encoder` = Whisper encoder,
whisper_config geometry config.json:195-293). transformers provides
checkpoint-identical modules — build them tiny with random weights, convert,
compare activations (same methodology as tests/test_llm_golden.py).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))


class TestWhisperEncoderGolden:
    @pytest.fixture(scope="class")
    def pair(self):
        from transformers import WhisperConfig
        from transformers.models.whisper.modeling_whisper import WhisperEncoder

        from mingunivision_tpu.models.audio_encoder import AudioEncoderConfig
        from mingunivision_tpu.utils.convert import whisper_encoder_params_from_torch

        cfg = AudioEncoderConfig(n_mels=16, n_state=32, n_layer=2, n_head=2, n_ctx=64)
        torch.manual_seed(0)
        hf_cfg = WhisperConfig(
            num_mel_bins=cfg.n_mels,
            d_model=cfg.n_state,
            encoder_layers=cfg.n_layer,
            encoder_attention_heads=cfg.n_head,
            encoder_ffn_dim=cfg.n_state * 4,
            max_source_positions=cfg.n_ctx,
            activation_function="gelu",
        )
        ref = WhisperEncoder(hf_cfg).eval()
        # non-trivial positional table (HF inits sinusoids only at from_pretrained)
        with torch.no_grad():
            ref.embed_positions.weight.normal_(std=0.1)
        params = whisper_encoder_params_from_torch(ref.state_dict(), cfg.n_layer)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        return ref, params, cfg

    def test_trunk_activations(self, pair):
        from mingunivision_tpu.models.audio_encoder import whisper_encode

        ref, params, cfg = pair
        # HF requires mel length == 2 * max_source_positions
        mel = np.random.default_rng(0).standard_normal((2, cfg.n_mels, 2 * cfg.n_ctx)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.tensor(mel)).last_hidden_state.numpy()
        got = np.asarray(whisper_encode(params, cfg, jnp.asarray(mel)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_audio_proj_matches_torch_sequential(self, pair):
        """linear_proj_audio parity: Conv1d(ds) + [GELU + Linear] with the
        patch's transpose plumbing (ming_lite.patch :1496-1510)."""
        from mingunivision_tpu.models.audio_encoder import audio_proj_apply, init_audio_proj_params
        from mingunivision_tpu.utils.convert import _conv1d_from_torch, _lin

        _, _, cfg = pair
        torch.manual_seed(1)
        conv = torch.nn.Conv1d(cfg.n_state, cfg.out_dim, kernel_size=cfg.ds_kernel_size, stride=cfg.ds_stride, padding=cfg.ds_kernel_size // 2)
        fc = torch.nn.Linear(cfg.out_dim, cfg.out_dim)
        x = torch.randn(2, 11, cfg.n_state)
        with torch.no_grad():
            y = conv(x.transpose(-1, -2)).transpose(-1, -2)
            want = fc(torch.nn.functional.gelu(y)).numpy()

        sd = {"ds.weight": conv.weight.detach(), "ds.bias": conv.bias.detach(), "fc1.weight": fc.weight.detach(), "fc1.bias": fc.bias.detach()}
        params = {"ds_conv": _conv1d_from_torch(sd, "ds"), "fc1": _lin(sd, "fc1")}
        params = jax.tree_util.tree_map(jnp.asarray, params)
        got = np.asarray(audio_proj_apply(params, cfg, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestQwenViTGolden:
    @pytest.fixture(scope="class")
    def pair(self):
        from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLVisionConfig
        from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
            Qwen2_5_VisionTransformerPretrainedModel,
        )

        from mingunivision_tpu.models.qwen_vit import QwenViTConfig

        cfg = QwenViTConfig(
            patch_size=4,
            temporal_patch_size=2,
            spatial_merge_size=2,
            embed_dim=32,
            depth=3,
            num_heads=2,
            intermediate_size=48,
            out_dim=16,
            window_size=16,  # merger window = 16/2/4 = 2 groups per side
            fullatt_block_indexes=(1,),
        )
        hf_cfg = Qwen2_5_VLVisionConfig(
            depth=cfg.depth,
            hidden_size=cfg.embed_dim,
            intermediate_size=cfg.intermediate_size,
            num_heads=cfg.num_heads,
            in_channels=cfg.in_chans,
            patch_size=cfg.patch_size,
            temporal_patch_size=cfg.temporal_patch_size,
            spatial_merge_size=cfg.spatial_merge_size,
            window_size=cfg.window_size,
            fullatt_block_indexes=list(cfg.fullatt_block_indexes),
            out_hidden_size=cfg.out_dim,
            hidden_act="silu",
        )
        torch.manual_seed(0)
        ref = Qwen2_5_VisionTransformerPretrainedModel(hf_cfg).eval()
        from mingunivision_tpu.utils.convert import qwen_vit_params_from_torch

        params = qwen_vit_params_from_torch(ref.state_dict(), cfg.depth)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        return ref, params, cfg

    @pytest.mark.parametrize("grid", [(1, 8, 8), (1, 8, 12)])
    def test_tower_activations(self, pair, grid):
        """Full tower incl. window attention, fullatt layer, rotary order,
        merger and inverse window permutation."""
        from mingunivision_tpu.models.qwen_vit import qwen_vit_apply

        ref, params, cfg = pair
        t, h, w = grid
        n = t * h * w
        rows = np.random.default_rng(1).standard_normal((n, cfg.patch_input_dim)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.tensor(rows), grid_thw=torch.tensor([[t, h, w]])).numpy()
        got = np.asarray(qwen_vit_apply(params, cfg, jnp.asarray(rows), (t, h, w)))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    def test_multi_image(self, pair):
        from mingunivision_tpu.models.qwen_vit import qwen_vit_apply

        ref, params, cfg = pair
        grids = [(1, 8, 8), (1, 4, 8)]
        n = sum(t * h * w for t, h, w in grids)
        rows = np.random.default_rng(2).standard_normal((n, cfg.patch_input_dim)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.tensor(rows), grid_thw=torch.tensor(list(grids))).numpy()
        got = np.asarray(qwen_vit_apply(params, cfg, jnp.asarray(rows), grids))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


class TestTalkerGolden:
    """Talker core parity. The reference class itself hard-requires CUDA at
    __init__ (modeling_bailing_talker.py:96-112 creates torch.cuda.Stream), so
    the golden oracle is its exact composition re-run on CPU: transformers
    Qwen2ForCausalLM (:58-62) + summed audio/text embeddings (:217-220) +
    vp_head Conv1d insertion (:66-72, :175-181) + thinker_to_talker_proj
    insertion (:182-195)."""

    @pytest.fixture(scope="class")
    def pair(self):
        from transformers import Qwen2Config as HFQwen2Config
        from transformers import Qwen2ForCausalLM

        from mingunivision_tpu.talker.model import TalkerConfig
        from mingunivision_tpu.talker.qwen2 import Qwen2Config
        from mingunivision_tpu.utils.convert import talker_params_from_torch

        qcfg = Qwen2Config(
            vocab_size=256,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            intermediate_size=128,
            tie_word_embeddings=False,
        )
        cfg = TalkerConfig(qwen2=qcfg, text_vocab_size=128, audio_vocab_size=128, qa_model_hidden_size=32, vp_feature_size=8)
        torch.manual_seed(0)
        hf = Qwen2ForCausalLM(
            HFQwen2Config(
                vocab_size=qcfg.vocab_size,
                hidden_size=qcfg.hidden_size,
                num_hidden_layers=qcfg.num_hidden_layers,
                num_attention_heads=qcfg.num_attention_heads,
                num_key_value_heads=qcfg.num_key_value_heads,
                head_dim=qcfg.head_dim,
                intermediate_size=qcfg.intermediate_size,
                rope_theta=qcfg.rope_theta,
                rms_norm_eps=qcfg.rms_norm_eps,
                tie_word_embeddings=False,
                attn_implementation="eager",
            )
        ).eval()
        proj = torch.nn.Linear(cfg.qa_model_hidden_size, qcfg.hidden_size)
        vp = torch.nn.Conv1d(cfg.vp_feature_size, qcfg.hidden_size, kernel_size=cfg.vp_kernel_size, stride=cfg.vp_stride, padding=cfg.vp_kernel_size // 2)
        sd = {f"model.{k}": v for k, v in hf.state_dict().items()}
        sd.update({f"thinker_to_talker_proj.{k}": v for k, v in proj.state_dict().items()})
        sd.update({f"vp_head.{k}": v for k, v in vp.state_dict().items()})
        params = jax.tree_util.tree_map(jnp.asarray, talker_params_from_torch(sd, qcfg.num_hidden_layers))
        return (hf, proj, vp), params, cfg

    def test_prefix_forward_logits(self, pair):
        from mingunivision_tpu.talker.model import compose_prefix_embeds
        from mingunivision_tpu.talker.qwen2 import make_qwen2_cache, qwen2_forward, qwen2_logits

        (hf, proj, vp), params, cfg = pair
        rng = np.random.default_rng(0)
        T = 7
        audio_ids = rng.integers(0, 255, (1, T))
        text_ids = rng.integers(0, 127, (1, T))
        vp_emb = rng.standard_normal((1, 1, cfg.vp_feature_size)).astype(np.float32)
        th = rng.standard_normal((1, 2, cfg.qa_model_hidden_size)).astype(np.float32)
        vp_loc, th_loc = 1, 3

        # reference composition (modeling_bailing_talker.forward :214-229)
        with torch.no_grad():
            emb = hf.get_input_embeddings()(torch.tensor(audio_ids)) + hf.get_input_embeddings()(torch.tensor(text_ids))
            vp_enc = vp(torch.tensor(vp_emb).transpose(-1, -2)).transpose(-1, -2)
            emb[0, vp_loc : vp_loc + 1] = vp_enc[0]
            emb[0, th_loc : th_loc + 2] = proj(torch.tensor(th))[0]
            want = hf(inputs_embeds=emb).logits.numpy()

        embeds = compose_prefix_embeds(
            params,
            cfg,
            jnp.asarray(audio_ids),
            jnp.asarray(text_ids),
            vp_emb=jnp.asarray(vp_emb),
            vp_insert_loc=vp_loc,
            thinker_hidden=jnp.asarray(th),
            thinker_insert_loc=th_loc,
        )
        cache = make_qwen2_cache(cfg.qwen2, 1, 16, jnp.float32)
        mask = jnp.zeros((1, 16), bool).at[:, :T].set(True)
        h, _ = qwen2_forward(params["qwen2"], cfg.qwen2, embeds.astype(jnp.float32), cache, mask)
        got = np.asarray(qwen2_logits(params["qwen2"], cfg.qwen2, h))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
