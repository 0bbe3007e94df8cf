"""Driver contract: entry() jits and runs; dryrun_multichip works on the
virtual CPU mesh."""

import os
import sys

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def graft():
    # Repo root from __file__, not cwd: the driver-contract tests must work
    # from any invocation directory.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    try:
        import __graft_entry__ as g
        yield g
    finally:
        sys.path.remove(repo)


def test_entry_compiles_and_runs(graft):
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    mean, cov, chol, key = out
    assert np.isfinite(np.asarray(mean)).all()
    assert np.isfinite(np.asarray(cov)).all()


def test_dryrun_multichip(graft, eight_devices):
    graft.dryrun_multichip(8)
