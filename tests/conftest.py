"""Tests package conftest.

The CPU re-exec lives in the repo-root ``conftest.py`` (it must run at
initial-conftest load, before pytest's capture starts).  Here we only
assert the contract so a mis-launched session fails loudly instead of
silently compiling every test on a remote TPU.
"""

import os


def pytest_sessionstart(session):
    assert os.environ.get("JAX_PLATFORMS") == "cpu", (
        "tests must run on the CPU backend; the root conftest re-exec "
        "should have set JAX_PLATFORMS=cpu"
    )
