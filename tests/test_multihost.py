"""Multi-host (multi-process) distributed-GBA dryrun.

Launches scripts/dryrun_multihost.py: two OS processes, each with 4
virtual CPU devices, join one jax.distributed runtime (gloo collectives
standing in for DCN) and run the landmark-sharded GBA over the 8-device
global mesh (SURVEY.md §2.3 multi-host mapping; BASELINE north star:
2+ host scale-out)."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_twin_process_global_ba():
    env = {k: v for k, v in os.environ.items() if k != "_MH_RANK"}
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts",
                                      "dryrun_multihost.py")],
        capture_output=True, text=True, timeout=500, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines()
            if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["processes"] == 2 and res["devices"] == 8
    assert res["ok"], res
    assert res["cross_vs_local_t_m"] < 1e-3, res
