"""Driver-entry contract tests.

``dryrun_multichip`` must work from an *unprepared* interpreter — one with a
single JAX device and no ``xla_force_host_platform_device_count`` — because
that is exactly how the driver invokes it (one real TPU chip via the axon
relay). The entry self-configures by re-exec'ing in a virtual 8-device CPU
child (see ``__graft_entry__._dryrun_in_subprocess``).
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_dryrun_multichip_from_unprepared_interpreter(repo_root):
    """Simulates the driver: 1-device parent, no multi-device env vars."""
    env = dict(os.environ)
    # A clean single-device CPU interpreter (stands in for the driver's
    # 1-TPU axon process without touching the serialized TPU relay).
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    env["PYTHONPATH"] = ""
    env.pop("_CLM_DRYRUN_CHILD", None)
    code = (
        "import sys\n"
        f"sys.path.insert(0, {repo_root!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert jax.device_count() == 1, jax.device_count()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=repo_root,
        capture_output=True,
        text=True,
        # the dry run is ~7.75 min on a quiet 1-core host (DP + topk + index
        # + grad-accum + TP + PP + SP + full-geometry step) and slower under
        # suite memory pressure; match the entry's own 1500 s child cap
        timeout=1500,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "dryrun_multichip ok: 8 devices" in res.stdout, res.stdout


@pytest.mark.slow
def test_dryrun_multichip_inline_on_prepared_mesh():
    """With 8 virtual devices already present (conftest), runs in-process."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    g.dryrun_multichip(8)
