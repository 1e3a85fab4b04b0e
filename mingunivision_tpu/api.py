"""Public inference API — the `MingUniVisionInfer` equivalent.

Parity with reference mingunivision/mingunivisioninfer.py:28-120:
  `MingUniVisionInfer(model_path).generate(messages, max_new_tokens,
  output_image_prefix, for_edit)` — template -> process_vision_info -> processor
  -> session.generate -> trim -> decode; generated images saved as
  `{prefix}.png` with collision-avoiding suffixes.

Construction paths:
  - from a converted HF checkpoint directory (safetensors + tokenizer files)
  - from explicit (params, config) for tests / programmatic use
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from mingunivision_tpu.config import (
    GenerationConfig,
    ImageGenConfig,
    MingUniVisionConfig,
    RuntimeConfig,
)
from mingunivision_tpu.engine.session import MingUniVisionSession
from mingunivision_tpu.processing.image_ops import save_image_with_suffix
from mingunivision_tpu.processing.processor import BailingMMProcessor


class MingUniVisionInfer:
    def __init__(
        self,
        model_path: Optional[str] = None,
        *,
        params=None,
        config: Optional[MingUniVisionConfig] = None,
        runtime: Optional[RuntimeConfig] = None,
        tokenizer=None,
        processor: Optional[BailingMMProcessor] = None,
        seed: int = 0,
        mesh=None,
    ):
        """`mesh`: optional jax.sharding.Mesh — shards the 16B LLM TP/EP over it
        (parallel/sharding.py rules) and the KV cache with it; required to serve
        bf16 16B on 16 GB chips (reference bar: vLLM TP, patch :468-661)."""
        self.config = config or MingUniVisionConfig()
        self.runtime = runtime or RuntimeConfig()
        self.mesh = mesh
        if not getattr(self.runtime, "moe_int_dots", True):
            # restore the exact-dequant decode kernels (golden/debug tier)
            import mingunivision_tpu.ops.kernels.moe_stream as _ms

            _ms.INT_DOT_STREAM = _ms.INT_DOT_STREAM_INT8 = False
        if self.runtime.pixdec_matmul_precision is not None:
            from mingunivision_tpu.config import with_pixdec_precision

            # serving-tier pixel decode (RuntimeConfig docstring / BENCHMARKS
            # "Pixel-decoder precision tiers"); golden/quality paths keep the
            # model default ("high", fp32-class)
            self.config = with_pixdec_precision(self.config, self.runtime.pixdec_matmul_precision)
        if mesh is not None and mesh.shape.get("expert", 1) * mesh.shape.get("model", 1) > 1:
            import dataclasses

            # sharded expert tables: decode dispatches the shard_map stream
            # wrapper (parallel/moe_shard.py; local-shard Pallas + psum) when
            # eligible, else masked-dense (GSPMD-partitioned) — never the
            # plain stream kernel, which would imply a table all-gather
            self.config = dataclasses.replace(
                self.config,
                llm=dataclasses.replace(
                    self.config.llm, expert_tables_sharded=True, expert_mesh=mesh
                ),
            )
        if params is None:
            if model_path is None:
                raise ValueError("need model_path or params")
            params, tokenizer = self._load_checkpoint(model_path, tokenizer)
        if mesh is not None:
            from mingunivision_tpu.parallel.sharding import shard_mm_params

            params = shard_mm_params(params, mesh)
        self.params = params
        if processor is not None:
            self.processor = processor
        else:
            if tokenizer is None:
                raise ValueError("need a tokenizer or processor")
            self.processor = BailingMMProcessor(tokenizer)
        self.session = MingUniVisionSession(self.params, self.config, self.runtime, seed=seed, mesh=mesh)

    # -- checkpoint loading ---------------------------------------------------

    def _load_checkpoint(self, model_path: str, tokenizer):
        from mingunivision_tpu.utils.checkpoint import load_torch_state_dict
        from mingunivision_tpu.utils.convert import (
            bailing_moe_params_from_torch,
            linear_proj_params_from_torch,
            mingtok_params_from_torch,
            rf_head_params_from_torch,
            vis_head_params_from_torch,
        )

        sd = load_torch_state_dict(model_path)
        # the composed HF checkpoint prefixes: vision.* / model.* / linear_proj.*
        def sub(prefix):
            plen = len(prefix)
            return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}

        params = {
            "mingtok": mingtok_params_from_torch(sub("vision."), self.config.mingtok),
            "llm": bailing_moe_params_from_torch(sub("model."), self.config.llm, root="model"),
            "rf_head": rf_head_params_from_torch(sub("model."), self.config.rf_head, root="diffloss.net"),
            "vis_head": vis_head_params_from_torch(sub("model."), root="vis_head"),
            "linear_proj": linear_proj_params_from_torch(sd, self.config.mlp_depth, root="linear_proj"),
        }
        _TIER_BITS = {"int8": 8, "int4": 4, "int4-nf4": 4}
        quant_bits = _TIER_BITS.get(self.runtime.param_dtype)
        # "int4-nf4" = the reference's EXACT int4 numerics (bnb NormalFloat4
        # codebook, mingunivisioninfer.py:47-56) on the XLA dequant paths;
        # plain "int4" = linear-symmetric, integer-MXU kernel tier (faster —
        # deviation between the two is bounded in BENCHMARKS "int4 quality").
        scheme = "nf4" if str(self.runtime.param_dtype).endswith("nf4") else "linear"
        dtype = jnp.float32 if self.runtime.param_dtype == "float32" else jnp.bfloat16
        if self.mesh is None:
            params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)
            if quant_bits:
                # weight-only quant tiers (reference int8 Quanto / int4 NF4,
                # mingunivisioninfer.py:46-78): LLM + RF head carry the memory;
                # MingTok stays bf16 (recon parity)
                from mingunivision_tpu.utils.quantize import quantize_tree

                rf_tier = self.runtime.rf_param_dtype or self.runtime.param_dtype
                rf_bits = _TIER_BITS.get(rf_tier, quant_bits)
                rf_scheme = "nf4" if str(rf_tier).endswith("nf4") else "linear"
                params["llm"] = quantize_tree(params["llm"], bits=quant_bits, scheme=scheme)
                params["rf_head"] = quantize_tree(params["rf_head"], bits=rf_bits, scheme=rf_scheme)
        else:
            # sharded load: keep leaves on the HOST (ml_dtypes bf16 numpy) so the
            # 33 GB bf16 16B tree never materializes on one 16 GB chip — __init__'s
            # shard_mm_params device_puts each leaf shard-wise onto the mesh.
            import contextlib

            import ml_dtypes
            import numpy as np

            np_dt = np.float32 if dtype == jnp.float32 else ml_dtypes.bfloat16
            params = jax.tree_util.tree_map(lambda x: np.asarray(x).astype(np_dt), params)
            if quant_bits:
                from mingunivision_tpu.utils.quantize import quantize_tree

                # same tier resolution as the unsharded branch: rf_param_dtype
                # may pin the RF head to a different width than the LLM
                rf_tier = self.runtime.rf_param_dtype or self.runtime.param_dtype
                rf_bits = _TIER_BITS.get(rf_tier, quant_bits)
                rf_scheme = "nf4" if str(rf_tier).endswith("nf4") else "linear"
                try:
                    cpus = jax.local_devices(backend="cpu") if jax.default_backend() != "cpu" else []
                except RuntimeError:
                    cpus = []
                ctx = jax.default_device(cpus[0]) if cpus else contextlib.nullcontext()
                # int4 + mesh: pack expert down_proj tables SHARD-LOCALLY so the
                # Pallas kernels stay eligible under the shard_map wrappers
                mp = self.mesh.shape.get("model", 1)
                with ctx:  # quantize on host, off the accelerator
                    params["llm"] = quantize_tree(params["llm"], bits=quant_bits, model_shards=mp, scheme=scheme)
                    params["rf_head"] = quantize_tree(params["rf_head"], bits=rf_bits, scheme=rf_scheme)
        if tokenizer is None:
            try:
                from transformers import AutoTokenizer

                tokenizer = AutoTokenizer.from_pretrained(model_path, trust_remote_code=False)
            except Exception:
                tokenizer = None
        return params, tokenizer

    # -- main entry -----------------------------------------------------------

    def generate(
        self,
        messages: List[dict],
        max_new_tokens: int = 512,
        output_image_prefix: str = "output",
        for_edit: bool = False,
        image_gen_temperature: float = 1.0,
        image_gen_text_cfg: float = 3.0,
        image_gen_image_cfg: float = 1.1,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_k: int = 0,
        top_p: float = 1.0,
        n_images: int = 1,
    ) -> str:
        text = self.processor.apply_chat_template(messages, add_generation_prompt=True)
        images = self.processor.process_vision_info(messages)
        batch = self.processor(text=text, images=images, for_edit=for_edit)
        gen = GenerationConfig(
            max_new_tokens=max_new_tokens,
            do_sample=do_sample,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            eos_token_id=self.config.llm.eos_token_id,
        )
        igen = ImageGenConfig(
            num_image_tokens=self.config.image_gen.num_image_tokens,
            text_cfg=image_gen_text_cfg,
            image_cfg=image_gen_image_cfg,
            temperature=image_gen_temperature,
            cfg_schedule=self.config.image_gen.cfg_schedule,
            cfg_renorm_type=self.config.image_gen.cfg_renorm_type,
            time_shifting_factor=self.config.image_gen.time_shifting_factor,
        )
        out = self.session.generate(
            batch.input_ids,
            batch.attention_mask,
            uncond_attention_mask=batch.uncond_attention_mask,
            text_uncond_attention_mask=batch.text_uncond_attention_mask,
            pixel_values=batch.pixel_values,
            generation=gen,
            n_images=n_images,
            image_gen=igen,
        )
        self.last_images = out.images  # programmatic access (serving layer)
        for img in out.images:
            save_image_with_suffix(img, output_image_prefix)
        # trim trailing eos, decode
        ids = out.token_ids
        if ids and ids[-1] == self.config.llm.eos_token_id:
            ids = ids[:-1]
        return self.processor.decode(ids)

    def reset_inner_state(self):
        self.session.reset_inner_state()

    # -- audio hook (reference modeling_bailingmm.py:140-150) -------------------

    def extract_audio_feature(self, audio_feats, audio_feats_lengths):
        """SANM audio-encoder hook. The reference wrapper carries this method
        (funasr SANMEncoder import, modeling_bailingmm.py:22) but the
        UniVision checkpoint never constructs the tower — here it is live
        whenever `self.audio = (params, SANMConfig)` has been attached (e.g.
        by an omni-family loader); otherwise it raises like the reference's
        unbuilt `self.audio` would."""
        if getattr(self, "audio", None) is None:
            raise AttributeError("no audio tower attached (set self.audio = (params, SANMConfig))")
        from mingunivision_tpu.models.sanm import extract_audio_feature

        a_params, a_cfg = self.audio
        return extract_audio_feature(a_params, a_cfg, audio_feats, audio_feats_lengths)

    # -- query-adaptive video frame scoring ------------------------------------

    def make_frame_scorer(self, batch_size: int = 8):
        """Cross-modal video-frame relevance scorer — the LongVU slot.

        The reference's `select_frames_based_on_query` (bailingmm_utils.py:
        307-360) delegates to an EXTERNAL LongVU VLM it does not ship, noting it
        "can also be replaced with other text/visual encoders". Here the
        encoders are this checkpoint's own: `linear_proj(MingTok features)`
        lives in the LLM's input-embedding space (prefill scatters those rows
        among word embeddings — modeling_bailingmm.py:152-204), so cosine
        similarity between a frame's mean projected feature and the mean word
        embedding of the query is a *trained* cross-modal relevance — no extra
        checkpoint.

        Returns `scorer(frames, query) -> (T,) float scores`, pluggable into
        `processing.media.select_frames_by_relevance` / `adaptive_frame_rows` /
        `VideoReader.load(sample="adaptive", scorer=...)`. With a falsy query,
        frames are scored by distinctiveness (distance from the mean frame
        feature), so the selector still prefers visually informative moments.
        """
        import numpy as np

        from mingunivision_tpu.models.bailing_moe import embed_tokens
        from mingunivision_tpu.processing.image_ops import preprocess_generation

        def scorer(frames: np.ndarray, query=None) -> np.ndarray:
            pix = np.stack(
                [preprocess_generation(f, self.processor.gen_image_size) for f in np.asarray(frames)]
            )  # (T, 3, S, S)
            feats = []
            for i in range(0, len(pix), batch_size):  # bound device memory
                chunk = pix[i : i + batch_size]
                f = self.session.extract_image_features(chunk)  # (n*N, hidden)
                f = f.reshape(len(chunk), -1, f.shape[-1]).mean(axis=1)
                feats.append(np.asarray(f, np.float32))
            fv = np.concatenate(feats)  # (T, hidden)
            if not query:
                return np.linalg.norm(fv - fv.mean(0, keepdims=True), axis=-1)
            ids = self.processor.tokenizer.encode(str(query), add_special_tokens=False)
            qe = np.asarray(
                embed_tokens(self.params["llm"], jnp.asarray([ids])), np.float32
            )[0].mean(axis=0)
            fn = fv / np.maximum(np.linalg.norm(fv, axis=-1, keepdims=True), 1e-8)
            return fn @ (qe / max(float(np.linalg.norm(qe)), 1e-8))

        return scorer
