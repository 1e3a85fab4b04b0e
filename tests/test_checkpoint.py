"""Checkpoint IO tests: orbax save/restore, torch-format loading paths."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mingunivision_tpu.config import tiny_llm_config
from mingunivision_tpu.models.bailing_moe import init_bailing_moe_params
from mingunivision_tpu.utils.checkpoint import (
    load_safetensors_dir,
    load_torch_state_dict,
    restore_pytree,
    save_pytree,
)


class TestOrbax:
    def test_save_restore_roundtrip(self, tmp_path):
        cfg = tiny_llm_config()
        params = init_bailing_moe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        path = str(tmp_path / "ckpt")
        save_pytree(path, params)
        restored = restore_pytree(path, template=params)
        for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTorchFormats:
    def test_safetensors_native_and_python_paths_agree(self, tmp_path):
        from safetensors.numpy import save_file

        rng = np.random.default_rng(0)
        tensors = {"a": rng.standard_normal((32, 16)).astype(np.float32), "b": rng.standard_normal((8,)).astype(np.float32)}
        d = tmp_path / "m"
        d.mkdir()
        save_file(tensors, str(d / "model.safetensors"))
        nat = load_safetensors_dir(str(d), use_native=True)
        py = load_safetensors_dir(str(d), use_native=False)
        for k in tensors:
            np.testing.assert_array_equal(nat[k], tensors[k])
            np.testing.assert_array_equal(py[k], tensors[k])

    def test_torch_bin_with_model_key_and_target_backbone_filter(self, tmp_path):
        torch = pytest.importorskip("torch")

        sd = {
            "model": {
                "encoder.w": torch.randn(4, 4),
                "target_backbone.x": torch.randn(2),  # must be filtered (mingtok raw ckpt)
            }
        }
        p = tmp_path / "ckpt.pt"
        torch.save(sd, str(p))
        out = load_torch_state_dict(str(p))
        assert "encoder.w" in out and "target_backbone.x" not in out


class TestAsyncCheckpointer:
    def test_async_save_restore_roundtrip(self, tmp_path):
        import jax.numpy as jnp

        from mingunivision_tpu.utils.checkpoint import AsyncTrainCheckpointer

        state = {"w": jnp.arange(12.0).reshape(3, 4), "step": jnp.int32(7)}
        ck = AsyncTrainCheckpointer()
        ck.save(str(tmp_path / "step7"), state)
        ck.wait()  # join the background write
        restored = ck.restore(str(tmp_path / "step7"), template=state)
        np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(state["w"]))
        assert int(restored["step"]) == 7
        ck.close()
