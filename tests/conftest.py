"""Test harness configuration.

All tests run on a virtual 8-device CPU mesh so that every sharding /
collective code path is exercised without TPU hardware (mirrors the
reference's strategy of testing distribution logic without real GPUs,
see SURVEY.md §4).

IMPORTANT: env vars must be set before jax is imported anywhere.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Force CPU for the unit suite (the real chip is exercised by bench.py and
# tpu-marked tests only; set MORPHIK_TPU_TESTS=1 to run on hardware).
# NOTE: the environment may preimport jax with JAX_PLATFORMS=axon (TPU
# tunnel), so the env var alone is not enough — reconfigure post-import,
# before first backend use.
if not os.environ.get("MORPHIK_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    """A 2x4 (replica x model) mesh over the 8 virtual CPU devices."""
    from morphik_core_tpu.parallel.mesh import make_mesh

    return make_mesh((2, 4), ("data", "model"))


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


def run_once(coro):
    """Run a coroutine on a fresh loop and CLEAN UP properly: shuts down
    async generators and closes the loop. The bare
    asyncio.new_event_loop().run_until_complete(...) pattern abandons its
    loop — async generators GC'd later schedule aclose() on it and
    surface as flaky 'Task was destroyed but it is pending!' warnings at
    interpreter exit."""
    import asyncio as _aio

    loop = _aio.new_event_loop()
    try:
        return loop.run_until_complete(coro)
    finally:
        try:
            loop.run_until_complete(loop.shutdown_asyncgens())
        finally:
            loop.close()
