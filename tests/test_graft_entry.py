"""Driver-contract tests for __graft_entry__.py.

`dryrun_multichip` must self-provision its virtual device mesh: the driver
invokes it in a FRESH interpreter with no JAX_PLATFORMS / XLA_FLAGS set (on
this box that interpreter has the single-chip TPU platform pre-selected by
the sitecustomize). Round 1 failed exactly here (MULTICHIP_r01.json rc=1), so
this test reproduces the driver environment: a subprocess WITHOUT conftest's
env mutations.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_driver_environment():
    env = dict(os.environ)
    # undo conftest's provisioning so the subprocess sees what the driver sees
    env.pop("JAX_PLATFORMS", None)
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    if flags:
        env["XLA_FLAGS"] = " ".join(flags)
    else:
        env.pop("XLA_FLAGS", None)
    env.pop("_GRAFT_DRYRUN_CHILD", None)

    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, f"stderr tail:\n{r.stderr[-2000:]}"
    assert "sharded train step OK" in r.stdout
    assert "AOT-compiled OK" in r.stdout
