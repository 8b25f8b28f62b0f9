"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

All kernel/sharding tests run on the CPU backend with 8 virtual devices
(SURVEY §4 "Implication for the TPU build"). Real-TPU behavior is exercised by
bench.py and __graft_entry__ on hardware.
"""
import os

# The host environment pre-sets JAX_PLATFORMS=axon and a sitecustomize registers the
# (exclusive, single-chip) TPU tunnel backend at interpreter start — concurrent test
# runs would deadlock on the chip. Env vars alone lose to that registration, so force
# the platform through jax.config before any backend is touched.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _fresh_llm_singleton():
    """Each test gets a clean global LLM manager (no cross-test fake backends)."""
    from ahrag_tpu.utils.llm import reset_llm_manager
    reset_llm_manager()
    yield
    reset_llm_manager()


@pytest.fixture
def fake_llm():
    """Install a deterministic fake LLM backend; yields a recorder dict."""
    from ahrag_tpu.utils import llm as llm_mod

    calls = {"n": 0, "responses": [], "default": '{"ok": true}'}

    def backend(model, messages, temperature, max_tokens):
        calls["n"] += 1
        if calls["responses"]:
            return calls["responses"].pop(0)
        return calls["default"]

    llm_mod.get_llm_manager().set_backend(backend)
    yield calls
    llm_mod.get_llm_manager().set_backend(None)
