"""Pallas fused kernels vs jnp reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gsmvi_tpu.ops.gsm import gsm_update
from gsmvi_tpu.ops.pallas.gsm_step import gsm_update_fused, pallas_supported


@pytest.mark.parametrize("b,d", [(2, 64), (8, 128), (32, 256), (5, 96)])
def test_fused_gsm_matches_jnp(rng, b, d):
    mu0 = rng.normal(size=d).astype(np.float32)
    l = (0.2 * rng.normal(size=(d, d))).astype(np.float32)
    s0 = (l @ l.T + np.eye(d)).astype(np.float32)
    x = rng.normal(size=(b, d)).astype(np.float32)
    v = rng.normal(size=(b, d)).astype(np.float32)
    mu_ref, s_ref = gsm_update(x, v, mu0, s0)
    mu, s = gsm_update_fused(x, v, mu0, s0, interpret=True)
    scale = float(np.abs(np.asarray(s_ref)).max())
    np.testing.assert_allclose(mu, mu_ref, atol=1e-5)
    np.testing.assert_allclose(s, s_ref, atol=1e-5 * max(scale, 1.0))


def test_fused_output_symmetric(rng):
    b, d = 8, 128
    mu0 = rng.normal(size=d).astype(np.float32)
    s0 = np.eye(d, dtype=np.float32)
    x = rng.normal(size=(b, d)).astype(np.float32)
    v = rng.normal(size=(b, d)).astype(np.float32)
    _, s = gsm_update_fused(x, v, mu0, s0, interpret=True)
    assert float(jnp.max(jnp.abs(s - s.T))) == 0.0


def test_supported_gating():
    assert pallas_supported(32, 256)
    assert not pallas_supported(4096, 4096)  # far beyond VMEM
