"""Smoke the fastest example scripts end-to-end (the public-surface spec).

Only the sub-second-per-iteration configs run here; the slower examples are
exercised piecewise by the fitter tests (PARITY.md C14).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("script", ["example_gsm.py", "example_gsm_numpy.py"])
def test_example_runs_and_recovers(script):
    env = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)],
        capture_output=True, text=True, timeout=600, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "mean error" in out.stdout
