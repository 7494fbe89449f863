"""Real-hardware checks, opt-in via DEFLICKER_TPU_TESTS=1.

The suite pins the CPU backend (conftest.py), so TPU-only paths (the
Pallas kernels under shard_map) run in a SUBPROCESS with a fresh jax that
keeps the machine's default TPU platform.  Skipped by default: the chip is
single-tenant and CI must not contend with benchmarks for it.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.skipif(os.environ.get("DEFLICKER_TPU_TESTS") != "1",
                    reason="real-TPU test; set DEFLICKER_TPU_TESTS=1")
def test_shardmap_pallas_corr_compiles_on_tpu():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)       # let the TPU plugin win
    # python puts the SCRIPT's dir on sys.path, not cwd — add the repo
    # (and keep the existing entries: the TPU plugin lives on PYTHONPATH)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                       if p])
    out = subprocess.run(
        [sys.executable, str(REPO / "tests" / "tpu"
                             / "shardmap_pallas_corr.py")],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd=str(REPO))
    assert out.returncode == 0, out.stdout + out.stderr
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    rec = json.loads(last[-1])
    assert rec.get("skipped") or rec["ok"], rec
