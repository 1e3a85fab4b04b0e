"""Omni query-token image-gen surface (models/omni_imggen.py) — the vLLM
omni diffusion-path analog (vllm/ming_lite.patch:1511-1527, :1687-1745,
:1939-1990): multiscale query-token runs, scatter, MRoPE grids, and the
gen-position hidden-state conditioning interface."""

import numpy as np

import jax
import jax.numpy as jnp

from mingunivision_tpu.config import tiny_llm_config
from mingunivision_tpu.models.bailing_moe import init_bailing_moe_params
from mingunivision_tpu.models.omni_imggen import (
    append_multiscale_gen_tokens,
    init_query_tokens,
    multiscale_grid_thw,
    omni_gen_hidden,
    query_tokens_from_torch,
    scatter_query_tokens,
)

SCALES = (2, 4)  # tiny analog of the reference 4/8/16


class TestSequenceAssembly:
    def test_append_runs_and_mask(self):
        ids = np.asarray([[5, 6, 7, 0, 0]])  # right-padded prompt
        out, gen = append_multiscale_gen_tokens(ids, SCALES, 101, 102, 100)
        want = [5, 6, 7, 101] + [100] * 4 + [102, 101] + [100] * 16 + [102]
        assert out.reshape(-1).tolist() == want
        # gen mask marks exactly the patch positions
        assert gen.sum() == 4 + 16
        assert (out[gen] == 100).all()

    def test_strip_tail(self):
        ids = np.asarray([[5, 6, 7, 8, 9]])
        out, _ = append_multiscale_gen_tokens(ids, (2,), 101, 102, 100, strip_tail=2)
        assert out.reshape(-1).tolist()[:3] == [5, 6, 7]

    def test_grid_rows(self):
        np.testing.assert_array_equal(
            multiscale_grid_thw((4, 8, 16)),
            [[1, 2, 32], [1, 2, 128], [1, 2, 512]],
        )


class TestQueryTokens:
    def test_init_normalized_and_converter(self):
        q = init_query_tokens(jax.random.PRNGKey(0), 32, SCALES)
        assert set(q) == {"2x2", "4x4"}
        norms = np.linalg.norm(np.asarray(q["4x4"]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        sd = {f"query_tokens_dict.{s}x{s}": np.ones((s * s, 32), np.float32) for s in SCALES}
        qc = query_tokens_from_torch(sd, SCALES)
        assert qc["2x2"].shape == (4, 32)

    def test_scatter_order_and_edit_prepend(self):
        ids = np.asarray([[5, 101] + [100] * 4 + [102, 101] + [100] * 16 + [102]])
        h = 8
        embeds = jnp.zeros((1, ids.shape[1], h))
        q = {
            "2x2": jnp.full((4, h), 1.0),
            "4x4": jnp.full((16, h), 2.0),
        }
        out, is_patch = scatter_query_tokens(embeds, jnp.asarray(ids), q, 100)
        out = np.asarray(out)[0]
        # scale order is numeric (2 before 4), positions in appearance order
        assert (out[2:6] == 1.0).all() and (out[8:24] == 2.0).all()
        assert (out[0] == 0).all()
        # EDIT: image features fill the FIRST patch positions
        img = jnp.full((4, h), 9.0)
        out2, _ = scatter_query_tokens(embeds, jnp.asarray(ids), {"2x2": q["2x2"]}, 100, image_embeds=img)
        out2 = np.asarray(out2)[0]
        assert (out2[2:6] == 9.0).all()


class TestGenHidden:
    def test_hidden_conditioning_interface(self):
        import dataclasses

        # tiny vocab: the class-default special ids (126346+) would gather OOB
        cfg = dataclasses.replace(tiny_llm_config(), image_patch_token=100, image_start_token=101, video_start_token=103)
        params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        q = init_query_tokens(jax.random.PRNGKey(1), cfg.hidden_size, SCALES)
        ids = np.asarray([[5, 6, 7]])
        hidden, gen_mask = omni_gen_hidden(params, cfg, ids, q, scales=SCALES, dtype=jnp.float32)
        n_gen = sum(s * s for s in SCALES)
        assert hidden.shape == (n_gen, cfg.hidden_size)
        assert np.isfinite(np.asarray(hidden)).all()
        # conditioning depends on the query tokens (not just ids)
        q2 = init_query_tokens(jax.random.PRNGKey(2), cfg.hidden_size, SCALES)
        hidden2, _ = omni_gen_hidden(params, cfg, ids, q2, scales=SCALES, dtype=jnp.float32)
        assert not np.allclose(np.asarray(hidden), np.asarray(hidden2))
