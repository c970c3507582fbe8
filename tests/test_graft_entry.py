"""Driver-contract tests for __graft_entry__.

The driver invokes dryrun_multichip(8) on the single-chip tunnel
(jax.devices() == 1 real TPU). Round 1 recorded MULTICHIP_r01.json
ok=false because the function assumed 8 pre-provisioned devices; it now
self-bootstraps a virtual CPU mesh in a subprocess. This test replays
the driver scenario: a parent process with ONE visible device calling
dryrun_multichip(8) must succeed.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_bootstraps_from_single_device():
    env = dict(os.environ)
    # Parent sees exactly one CPU device (like the 1-chip tunnel).
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("_MORPHIK_DRYRUN_CHILD", None)
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n" % REPO
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multichip OK" in proc.stdout


def test_entry_compiles_single_device():
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.ndim == 3
