"""Test harness: force an 8-device virtual CPU mesh so distributed behaviour
(shard_map / pjit DP, psum loss means, BN stat sync, gather-based eval) is
exercised without TPU hardware — SURVEY.md §4 test plan item (c).

Note: the environment may pin JAX_PLATFORMS to a TPU plugin via
sitecustomize; `jax.config.update` takes precedence, so tests always run on
the virtual CPU mesh (fast, deterministic, 8 devices)."""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_parallel_contexts():
    """Trainer construction publishes global mesh contexts (tensor + data);
    reset them per test so kernel-dispatch state never leaks across tests."""
    yield
    from video_rep_learning_tpu.parallel.sharding import (set_data_context,
                                                          set_tensor_context)

    set_data_context(None)
    set_tensor_context(None, None)

# The environment's relay-backed TPU plugin registers background threads that
# can crash the interpreter during shutdown AFTER all tests have passed,
# corrupting the exit code. Report the true pytest status and skip the
# crashing teardown.
_exitstatus = {"code": 0}


def pytest_sessionfinish(session, exitstatus):
    _exitstatus["code"] = int(exitstatus)


def pytest_unconfigure(config):
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(_exitstatus["code"])
