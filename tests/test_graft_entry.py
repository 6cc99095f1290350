"""Driver-hook regression tests.

Round 1's only red driver signal was dryrun_multichip failing under the real
bench environment (one axon TPU device, MULTICHIP_r01.json rc=1). The hook now
self-provisions a virtual CPU mesh via subprocess re-exec; this test runs that
exact path: a fresh process with NO fake-device XLA flag sees one CPU device,
must respawn itself onto a virtual 2-device mesh, and succeed.

Cold-cache cost: the dry run pays four train-step compiles (two at flagship
d=512/L=8) on one CPU core — measured 263 s cold, 67 s with the persistent
compile cache __graft_entry__ enables. The subprocess timeout covers the
cold case plus the parent's 90 s device-query timeout (a wedged axon tunnel
blocks jax.devices() indefinitely; the hook now times out and respawns).
"""
import pytest
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_virtual_mesh():
    env = dict(os.environ)
    # Strip the conftest's fake-device flag so the child sees ONE device and
    # must take the respawn path (mirrors the driver's axon environment).
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", "")).strip()
    env.pop("_POLY_DRYRUN_CHILD", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(2)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip small ok: 2 devices" in r.stdout, r.stdout
    # round 3: the dryrun also proves numerical equivalence with the
    # single-device step (small + flagship shapes) and reports max diffs
    assert "dryrun_multichip flagship ok: d=512 L=8" in r.stdout, r.stdout
    assert "loss_maxdiff=" in r.stdout
