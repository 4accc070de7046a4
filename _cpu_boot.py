"""Early pytest plugin: re-exec the test session onto the pure-CPU JAX
backend.

Loaded via ``addopts = -p _cpu_boot`` in ``pytest.ini`` so its
``pytest_load_initial_conftests`` hook actually runs (conftest files
cannot implement that hook — they are loaded *by* it).

Why this exists: the environment's ``sitecustomize`` registers and
eagerly initializes a TPU PJRT plugin in every Python process before
pytest starts, and the backend cannot be switched in-process.  Tests
must run on pure CPU (fast, deterministic, 8 virtual devices for the
fake mesh — SURVEY.md section 4.2), so the first invocation re-execs
pytest once with a scrubbed environment.  Global capture is stopped
first so the child's output reaches the real stdout.
"""

import os
import sys

_SENTINEL = "PWSTABLE_TESTS_CPU"


def pytest_load_initial_conftests(early_config, parser, args):
    if os.environ.get(_SENTINEL) == "1":
        return
    capman = early_config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
        capman.stop_global_capturing()
    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # gate: skip TPU plugin registration
    # Persistent XLA compilation cache: the suite's dominant cost is
    # jit-compiling near-identical tiny train/inference programs (fresh
    # jit closures per test recompile the same HLO); the cache converts
    # those, and full re-runs, into disk hits.
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"),
    )
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        env,
    )
