"""Multi-controller (jax.distributed) runtime test.

Two OS processes x 4 virtual CPU devices each register one campaign pair
over a global 8-device mesh; the per-iteration psum/all_gather collectives
cross the process boundary over the gRPC backend — the hardware-free DCN
stand-in (SURVEY.md §5, §7 step 5; VERDICT r3 missing #3).  The launcher
asserts both controllers see the full mesh and produce the IDENTICAL
transform.
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(ROOT, "eval", "distributed_demo.py")


@pytest.mark.slow
def test_two_process_multicontroller_pair():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run([sys.executable, DEMO], env=env, timeout=590,
                         capture_output=True, text=True, cwd=ROOT)
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-2000:]
    report = json.loads(
        open(os.path.join(ROOT, "eval", "distributed_report.json")).read())
    assert report["ok"]
    assert report["cross_process_param_diff"] < 1e-9
    for w in report["workers"]:
        assert w["process_count"] == 2
        assert w["global_devices"] == 8
        assert w["mean_residual_mm"] < 2.0
