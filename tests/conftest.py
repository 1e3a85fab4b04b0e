"""Test harness: force an 8-device virtual CPU mesh so all sharding/pjit paths are
exercised without real multi-chip hardware (SURVEY §4)."""

import os
import sys

# FORCE cpu — the driver environment pre-sets JAX_PLATFORMS=axon (the real TPU
# tunnel) via a sitecustomize that overrides the env var; only a post-import
# config update wins. Without this every unit-test compile rides the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
