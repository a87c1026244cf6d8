"""Test config: run everything on an 8-device virtual CPU mesh.

This is the JAX-native way to exercise mesh/pjit logic without TPU hardware
(the reference has no distributed tests at all — SURVEY.md §4).
"""

import os
import sys

# Hard override: the container environment pins JAX_PLATFORMS=axon (remote
# TPU tunnel); tests must run on local virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
# Spurious XLA:CPU AOT feature-check ERROR spam on every persistent-cache
# load: silencing requires TF_CPP_MIN_LOG_LEVEL=3 in the EXEC-TIME env
# (the container preimports jax at interpreter startup, so os.environ
# writes here are too late — utils/platform.maybe_reexec_quiet_cpp_logs).
# Re-exec pytest once with the fixed env.
if os.environ.get("TF_CPP_MIN_LOG_LEVEL") != "3" and \
        not os.environ.get("DFTPU_NO_REEXEC"):
    os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
    os.environ["DFTPU_NO_REEXEC"] = "1"
    # argv[0] under `-m pytest` points at a module path that may not be
    # directly executable; rebuild the canonical -m invocation instead
    os.execv(sys.executable,
             [sys.executable, "-m", "pytest"] + sys.argv[1:])
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
