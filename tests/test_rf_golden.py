"""Golden parity: rectified-flow head vs reference diff_loss_rf_swiglu (CPU)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference snapshot not mounted"
)

from mingunivision_tpu.config import RFHeadConfig  # noqa: E402
from mingunivision_tpu.models.rf_head import rf_net_apply, rf_sample, timestep_embedding  # noqa: E402
from mingunivision_tpu.utils.convert import rf_head_params_from_torch  # noqa: E402


def tiny_cfg() -> RFHeadConfig:
    return RFHeadConfig(
        target_channels=8, z_channels=48, width=48, depth=2, mlp_mult=4, num_sampling_steps=4
    )


@pytest.fixture(scope="module")
def ref_and_params():
    import refutil

    rfmod = refutil.import_reference_rf()
    torch.manual_seed(0)
    cfg = tiny_cfg()
    ref = rfmod.RectifiedFlowLoss(
        target_channels=cfg.target_channels,
        z_channels=cfg.z_channels,
        depth=cfg.depth,
        width=cfg.width,
        num_sampling_steps=str(cfg.num_sampling_steps),
        mlp_mult=cfg.mlp_mult,
    ).eval()
    # make the zero-initialized final layer non-trivial for a meaningful test
    with torch.no_grad():
        torch.nn.init.normal_(ref.net.final_layer.linear.weight, std=0.1)
        torch.nn.init.normal_(ref.net.final_layer.linear.bias, std=0.1)
        for blk in ref.net.res_blocks:
            torch.nn.init.normal_(blk.adaLN_modulation[-1].weight, std=0.1)
        torch.nn.init.normal_(ref.net.final_layer.adaLN_modulation[-1].weight, std=0.1)
    params = rf_head_params_from_torch(ref.state_dict(), cfg, root="net")
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return ref, params, cfg


class TestNetParity:
    def test_timestep_embedding(self, ref_and_params):
        ref, params, cfg = ref_and_params
        t = np.array([0.0, 0.25, 500.0, 1000.0], np.float32)
        got = np.asarray(timestep_embedding(jnp.asarray(t), cfg.freq_embed_size))
        want = ref.net.time_embed.timestep_embedding(torch.tensor(t), cfg.freq_embed_size).numpy()
        # large t*freq phases (t=1000) amplify fp32 ULP differences in the freq
        # table through cos/sin — bound absolutely, not relatively
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-3)

    def test_velocity_field(self, ref_and_params):
        ref, params, cfg = ref_and_params
        rng = np.random.default_rng(0)
        x = rng.standard_normal((3, cfg.target_channels)).astype(np.float32)
        t = rng.uniform(0, 1, (3,)).astype(np.float32)
        z = rng.standard_normal((3, cfg.z_channels)).astype(np.float32)
        with torch.no_grad():
            want = ref.net(torch.tensor(x), torch.tensor(t) * 1000.0 / 1000.0, torch.tensor(z)).numpy()
        got = np.asarray(rf_net_apply(params, cfg, jnp.asarray(x), jnp.asarray(t), jnp.asarray(z)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestSamplerParity:
    def _run_both(self, ref, params, cfg, B, text_cfg, image_cfg, renorm=None, shift=None):
        rng = np.random.default_rng(1)
        z = rng.standard_normal((B, cfg.z_channels)).astype(np.float32)
        torch.manual_seed(7)
        with torch.no_grad():
            want = ref.sample(
                torch.tensor(z),
                temperature=0.9,
                text_cfg=text_cfg,
                image_cfg=image_cfg,
                cfg_renorm_type=renorm,
                time_shifting_factor=shift,
            ).numpy()
        # replay the reference's noise draw for an apples-to-apples ODE comparison
        torch.manual_seed(7)
        if text_cfg != 1.0:
            noise = torch.randn(1, cfg.target_channels).numpy()
        else:
            noise = torch.randn(B, cfg.target_channels).numpy()
        got = np.asarray(
            rf_sample(
                params,
                cfg,
                jnp.asarray(z),
                key=None,
                temperature=0.9,
                text_cfg=text_cfg,
                image_cfg=image_cfg,
                cfg_renorm_type=renorm,
                time_shifting_factor=shift,
                noise=noise,
            )
        )
        return got, want

    def test_three_way_cfg(self, ref_and_params):
        ref, params, cfg = ref_and_params
        got, want = self._run_both(ref, params, cfg, 3, 3.0, 1.1)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_two_way_cfg_with_renorm(self, ref_and_params):
        ref, params, cfg = ref_and_params
        got, want = self._run_both(ref, params, cfg, 2, 2.0, 1.0, renorm="channel")
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_time_shifted_schedule(self, ref_and_params):
        ref, params, cfg = ref_and_params
        got, want = self._run_both(ref, params, cfg, 3, 3.0, 1.1, shift=3.0)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_uncond_single_row(self, ref_and_params):
        ref, params, cfg = ref_and_params
        got, want = self._run_both(ref, params, cfg, 1, 1.0, 1.0)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


class TestRenormAndLoss:
    def test_three_way_cfg_with_renorm(self, ref_and_params):
        """Pin the channel cfg-renorm epsilon/clamp semantics on the 3-way path
        (reference :148-156: scale = clamp(norm(v_c)/norm(v) + 1e-8, 0, 1))."""
        ref, params, cfg = ref_and_params
        got, want = TestSamplerParity()._run_both(ref, params, cfg, 3, 3.0, 1.1, renorm="channel")
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_rf_loss_matches_torch_pipeline(self, ref_and_params):
        """Velocity-matching loss parity: with shared (data, z, t, noise), our
        rf_loss equals MSE(ref.net(x_t, t, z), data - noise) computed in torch.
        (The reference ships no training forward — the net eval and the v-target
        convention derived from its sampler ODE are what this pins.)"""
        from mingunivision_tpu.engine.train import rf_loss

        ref, params, cfg = ref_and_params
        rng = np.random.default_rng(5)
        N = 6
        data = rng.standard_normal((N, cfg.target_channels)).astype(np.float32)
        z = rng.standard_normal((N, cfg.z_channels)).astype(np.float32)
        t = rng.uniform(0.0, 1.0, (N,)).astype(np.float32)
        noise = rng.standard_normal((N, cfg.target_channels)).astype(np.float32)

        with torch.no_grad():
            x_t = torch.tensor(t)[:, None] * torch.tensor(noise) + (1 - torch.tensor(t))[:, None] * torch.tensor(data)
            v_pred = ref.net(x_t, torch.tensor(t), torch.tensor(z))
            want = torch.mean((v_pred - (torch.tensor(data) - torch.tensor(noise))) ** 2).item()

        got = float(
            rf_loss(
                params,
                cfg,
                jnp.asarray(data),
                jnp.asarray(z),
                jax.random.PRNGKey(0),
                t=jnp.asarray(t),
                noise=jnp.asarray(noise),
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
