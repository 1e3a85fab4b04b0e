"""Golden tests for the MoE router auxiliary losses vs the reference torch
implementations (modeling_utils.py:395-560). The reference's distributed
all_reduces become identities single-process (stubbed); GSPMD arrays are
logically global so our token-axis means are the same reduction."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")

torch = pytest.importorskip("torch")

from mingunivision_tpu.models.bailing_moe import (  # noqa: E402
    router_balance_loss,
    router_group_balance_loss,
    router_z_loss,
)


@pytest.fixture(scope="module")
def ref_utils(request):
    import types

    import refutil

    # modeling_utils imports `whisper.model.AudioEncoder` at module scope;
    # the openai-whisper package is not in this image — stub it (unused here)
    if "whisper" not in sys.modules:
        whisper = types.ModuleType("whisper")
        whisper_model = types.ModuleType("whisper.model")
        whisper_model.AudioEncoder = object
        whisper.model = whisper_model
        sys.modules["whisper"] = whisper
        sys.modules["whisper.model"] = whisper_model

    p = f"{refutil.REFERENCE_ROOT}/mingunivision"
    if p not in sys.path:
        sys.path.insert(0, p)
    import modeling_utils as mu

    # single-process stand-ins for the atorch expert group
    mu.parallel_group = lambda name: None
    mu.parallel_group_size = lambda name: 4
    orig = torch.distributed.all_reduce
    torch.distributed.all_reduce = lambda *a, **k: None
    request.addfinalizer(lambda: setattr(torch.distributed, "all_reduce", orig))
    return mu


def test_group_balance_loss_matches_reference(ref_utils):
    rng = np.random.default_rng(0)
    L, B, S, E, k, G = 1, 2, 16, 8, 3, 4
    logits = rng.standard_normal((L, B, S, E)).astype(np.float32)
    probs = torch.softmax(torch.from_numpy(logits), dim=-1)
    idx = torch.from_numpy(rng.integers(0, E, (L, B, S, k)))

    ref = float(ref_utils.group_level_device_balancing_loss_func(probs, idx))
    got = float(
        router_group_balance_loss(
            jnp.asarray(probs.numpy().reshape(L * B, S, E)),
            jnp.asarray(idx.numpy().reshape(L * B, S, k)),
            E,
            G,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_z_loss_matches_reference(ref_utils):
    rng = np.random.default_rng(1)
    L, B, S, E = 1, 2, 16, 8
    logits = rng.standard_normal((L, B, S, E)).astype(np.float32)
    labels = torch.zeros((B, S), dtype=torch.long)  # no -100 masking
    ref = float(ref_utils.router_z_loss_func(torch.from_numpy(logits), labels))
    got = float(router_z_loss(jnp.asarray(logits.reshape(-1, E))))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_balance_loss_behaves():
    """Concentrated routing WITH concentrated router probs costs more than
    uniform routing with uniform probs (Switch loss couples mask and probs)."""
    E, N, k = 8, 64, 1
    probs_u = jnp.full((N, E), 1.0 / E, jnp.float32)
    idx_uniform = jnp.arange(N, dtype=jnp.int32).reshape(N, k) % E
    probs_c = jnp.full((N, E), 0.01, jnp.float32).at[:, 0].set(0.93)
    idx_conc = jnp.zeros((N, k), jnp.int32)
    lu = float(router_balance_loss(probs_u, idx_uniform, E))
    lc = float(router_balance_loss(probs_c, idx_conc, E))
    assert lc > lu
    g_u = float(router_group_balance_loss(probs_u, idx_uniform, E, 4))
    g_c = float(router_group_balance_loss(probs_c, idx_conc, E, 4))
    assert g_c > g_u
