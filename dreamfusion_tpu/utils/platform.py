"""Platform forcing shared by every CPU-capable entry point.

The container environment pins a TPU PJRT plugin ("axon") that wins platform
resolution even when ``JAX_PLATFORMS=cpu`` is in the environment — the env
var alone loses that fight (CLAUDE.md gotcha #1); ``jax.config.update`` after
import is also required.  Round-1's driver multi-chip dryrun failed exactly
because one entry point hand-rolled this stanza incompletely
(MULTICHIP_r01.json rc=1).  Every entry point (tests/conftest.py, bench.py
--smoke, guidance CLIs, viewer, __graft_entry__.dryrun_multichip) now goes
through this one helper.
"""

from __future__ import annotations

import os
import re

_COUNT_OPT = "--xla_force_host_platform_device_count"


def maybe_reexec_quiet_cpp_logs(module: str | None = None) -> None:
    """Re-exec the interpreter once with TF_CPP_MIN_LOG_LEVEL=3 in the
    PROCESS environment (VERDICT r4 item 6).

    Why a re-exec: this container's site startup preimports jax through
    the axon PJRT plugin — jaxlib's C++ logging is initialized before ANY
    user Python runs, so `os.environ` writes (what force_cpu used to do)
    can never silence the spurious XLA:CPU AOT feature-mismatch ERROR
    spam; only the env at exec time counts (verified:
    `TF_CPP_MIN_LOG_LEVEL=3 python x.py` = 0 errors, setting it first
    thing inside x.py = 6 errors).

    ONLY call this from our own `__main__` entry points.  Library code —
    especially __graft_entry__.dryrun_multichip, which the driver calls
    IN-PROCESS — must never re-exec (it would replace the caller's
    process).  `module` restores `python -m pkg.mod` semantics (argv[0]
    alone would re-run the file without package context)."""
    import sys
    cur = os.environ.get("TF_CPP_MIN_LOG_LEVEL")
    if cur not in (None, "1") or os.environ.get("DFTPU_NO_REEXEC"):
        # Respect an explicit user level (e.g. 0 to SEE the C++ logs) —
        # but the axon site preimport itself injects
        # TF_CPP_MIN_LOG_LEVEL=1 into os.environ at interpreter startup
        # (verified: a shell with it unset reads "1" inside python), so
        # "1" is indistinguishable from the platform default and is
        # overridden; any other value is treated as user intent.
        return
    if cur == "1":
        print("[platform] TF_CPP_MIN_LOG_LEVEL=1 (the site shim's "
              "injected default) -> re-exec with 3 to silence spurious "
              "XLA:CPU AOT errors; export DFTPU_NO_REEXEC=1 or any other "
              "level to keep it", file=sys.stderr)
    os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
    os.environ["DFTPU_NO_REEXEC"] = "1"   # belt + braces against loops
    argv = [sys.executable]
    if module is not None:
        argv += ["-m", module] + sys.argv[1:]
    else:
        argv += sys.argv
    os.execv(sys.executable, argv)


def force_cpu(n_devices: int | None = None) -> None:
    """Force JAX onto the local CPU backend, optionally with ``n_devices``
    virtual devices (the JAX-native way to test Mesh/pjit logic without a
    TPU pod — SURVEY.md §4).

    Safe to call before or after ``import jax``; if a backend was already
    initialized on the wrong platform (or with too few virtual devices),
    it is torn down and re-resolved.
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    # Silence XLA:CPU's spurious AOT feature-mismatch ERROR spam: the
    # persistent compile cache stores CPU executables as AOT results whose
    # compile-feature list includes TUNING pseudo-features
    # (+prefer-no-gather/-scatter) that the loader's host-feature
    # enumeration never contains — so every same-machine cache load logs a
    # full-page "could lead to SIGILL" error and then runs fine.  Verified
    # same-boot, same-process-writes-then-reads (round 4); the real
    # cross-machine hazard is handled by the boot-scoped cache dir
    # (dreamfusion_tpu/__init__._host_fingerprint).  Level 3 filters
    # non-fatal C++ logs only; Python-side warnings/exceptions unaffected.
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    if n_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if _COUNT_OPT in flags:
            flags = re.sub(_COUNT_OPT + r"=\d+",
                           f"{_COUNT_OPT}={n_devices}", flags)
        else:
            flags = (flags + f" {_COUNT_OPT}={n_devices}").strip()
        os.environ["XLA_FLAGS"] = flags

    import jax

    jax.config.update("jax_platforms", "cpu")
    if not _backend_ok(jax, n_devices):
        # A backend already came up (possibly the TPU plugin, or CPU with
        # the wrong virtual-device count): drop it and re-resolve under the
        # new env/config.
        try:
            jax.extend.backend.clear_backends()
        except Exception:  # pragma: no cover - older/newer jax API surface
            jax.clear_backends()
    assert jax.default_backend() == "cpu", jax.default_backend()
    if n_devices is not None:
        assert jax.device_count() >= n_devices, (
            f"wanted {n_devices} virtual CPU devices, got "
            f"{jax.device_count()} (backend initialized before force_cpu?)")


def _backend_ok(jax, n_devices) -> bool:
    try:
        if jax.default_backend() != "cpu":
            return False
        return n_devices is None or jax.device_count() >= n_devices
    except Exception:
        return False


def honor_cpu_env() -> None:
    """CLI-style forcing: only force CPU when the user asked via
    ``JAX_PLATFORMS=cpu`` (otherwise leave the real TPU backend alone)."""
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        force_cpu()
