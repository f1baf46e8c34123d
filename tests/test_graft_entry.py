"""Driver-mode tests for __graft_entry__.dryrun_multichip.

Round-1 regression: the suite's conftest forces the CPU platform
process-wide, so a dryrun that only worked under that env passed the tests
but crashed when the driver imported the module directly (MULTICHIP_r01).
These tests spawn FRESH subprocesses *without* conftest's platform forcing,
mirroring exactly what the driver does.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def test_dryrun_multichip_driver_mode():
    # the driver does: import __graft_entry__; __graft_entry__.dryrun_multichip(8)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=_clean_env(), capture_output=True, text=True,
        timeout=900)
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "OK" in proc.stdout, proc.stdout
    assert "dp=4 tp=2" in proc.stdout, proc.stdout


def test_dryrun_subprocess_never_touches_tpu():
    # the child must end up on the CPU platform with 8 devices even when the
    # parent env says nothing about platforms
    code = (
        "import os\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "ds = jax.devices()\n"
        "assert len(ds) == 8 and ds[0].platform == 'cpu', ds\n"
        "print('cpu8 OK')\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          env=_clean_env(), capture_output=True, text=True,
                          timeout=300)
    assert proc.returncode == 0, proc.stderr
    assert "cpu8 OK" in proc.stdout
