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

# Persistent compile cache for the suite, keyed by the HOST's CPU-feature
# fingerprint (the VM migrates between hosts; CPU AOT artifacts from another
# host load with machine-feature mismatch and can SIGILL — CLAUDE.md). A warm
# cache cuts the 1-core suite time sharply and shrinks the in-process compile
# load (one observed XLA:CPU compiler SIGSEGV mid-suite was compile-time).
from __graft_entry__ import _host_fingerprint  # noqa: E402

_cache_dir = f"/tmp/jax_cache_pytest_{_host_fingerprint()}"
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
