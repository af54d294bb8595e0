"""Smoke the evidence-run drivers so they can't rot.

The docs/evidence/ artifacts cite ``scripts/fedopt_grid.py`` (and its
``--fedavg-baseline`` / ``--combo`` append modes) as their reproduce
path; this drives all three modes end-to-end at toy scale in a
subprocess, exactly as a user would, and checks the JSON they leave
behind.  Marked slow: it pays real jit compiles in a fresh process.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(out, *extra):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fedopt_grid.py"),
         "--smoke", "--rounds", "2", "--out", out, *extra],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    with open(out) as f:
        return json.load(f)


@pytest.mark.slow
def test_fedopt_grid_smoke_all_modes(tmp_path):
    out = str(tmp_path / "grid.json")

    d = _run(out)                      # 2-combo grid
    assert len(d["runs"]) == 2
    assert all("2" in r["evals"] for r in d["runs"])

    d = _run(out, "--fedavg-baseline")  # baseline row appends, not clobbers
    assert "fedavg_baseline" in d and len(d["runs"]) == 2
    assert "2" in d["fedavg_baseline"]["evals"]

    d = _run(out, "--combo", "0.01", "1e-2", "0")
    (ext,) = d["extended_runs"]
    assert ext["server_lr"] == 0.01 and ext["rounds"] == 2

    # a second baseline keys into extended_runs instead of overwriting
    d = _run(out, "--fedavg-baseline")
    assert len(d["extended_runs"]) == 2
    assert d["extended_runs"][1]["algorithm"] == "fedavg"
