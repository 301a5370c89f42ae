"""Production-kernel lowering on the real TPU chip (VERDICT r4 item 1).

The suite pins itself to a virtual CPU mesh (conftest), so these tests
shell out WITHOUT ``JAX_PLATFORMS=cpu``: the child runs the batched
shard_map pass with the production ``pallas`` backend at B=2 (the local
``lax.map`` slice path that replaced ``vmap``) on the live backend and
must lower + execute — Mosaic rejecting a block spec, the round-4
regression, fails the child with a traceback.  Skips when no TPU is
reachable from this box.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _child_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # drop the virtual-device flag the conftest forces on the suite
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f)
    return env


def test_batched_pallas_pass_lowers_on_tpu():
    p = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "tpu_batched_smoke.py")],
        capture_output=True, text=True, timeout=1500, env=_child_env(),
        cwd=REPO)
    if "SKIP_NO_TPU" in p.stdout:
        pytest.skip("no TPU reachable; pallas lowering needs the real chip")
    assert p.returncode == 0, (
        f"batched pallas pass failed on the live backend\n"
        f"stdout:\n{p.stdout[-2000:]}\nstderr:\n{p.stderr[-4000:]}")
    assert "TPU_BATCHED_OK pallas" in p.stdout, p.stdout[-2000:]
