"""Test config: run everything on an 8-device virtual CPU mesh.

This is the JAX-native way to exercise mesh/pjit logic without TPU hardware
(the reference has no distributed tests at all — SURVEY.md §4).
"""

import os

# Hard override: the container environment pins JAX_PLATFORMS=axon (remote
# TPU tunnel); tests must run on local virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
# Spurious XLA:CPU AOT feature-check ERROR spam on every persistent-cache
# load: truly silencing it needs TF_CPP_MIN_LOG_LEVEL=3 in the EXEC-TIME
# env (the container preimports jax at interpreter startup, so the
# setdefault below is too late for C++ logging — see
# utils/platform.maybe_reexec_quiet_cpp_logs, which the CLI entry points
# use).  Do NOT re-exec from here: by conftest-import time pytest's
# fd-level capture has redirected fd1/fd2 into capture temp files, so the
# re-exec'd run's entire output vanishes while still exiting 0 — a silent
# false-green (measured).  Cosmetic spam in test logs is the lesser evil;
# run `TF_CPP_MIN_LOG_LEVEL=3 pytest ...` for clean output.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
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
