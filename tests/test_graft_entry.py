"""Driver-facing entry points: the multichip gate must stay green.

Round 1's driver gate failed (MULTICHIP_r01.json ok=false) because
``dryrun_multichip`` asserted the device count instead of forcing the virtual
CPU mesh. These tests pin the fixed behavior in both environments the driver
can present: backend already initialized with enough devices (in-process run)
and a fresh interpreter where the axon sitecustomize pinned a 1-device platform
(subprocess re-exec / config forcing).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_ensure_devices_with_initialized_backend():
    import __graft_entry__ as g
    # conftest already initialized an 8-device CPU backend; the config updates
    # inside raise RuntimeError and must be swallowed, leaving the check green.
    assert g._ensure_devices(8) is True


def test_dryrun_multichip_inprocess():
    import __graft_entry__ as g
    g.dryrun_multichip(8)  # raises on any non-finite metric / compile failure


def test_dryrun_multichip_fresh_interpreter():
    """Simulate the driver: fresh python, platform env pinned to a non-cpu value."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # stand-in for the axon pin without the tunnel;
    # the child still must force jax_num_cpu_devices/XLA_FLAGS itself
    env.pop("XLA_FLAGS", None)
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip ok" in proc.stdout
