"""Gaussian targets — the reference examples' model family, plus hard variants.

``dense_gaussian`` reproduces the construction used by every reference example
(``examples/example_gsm.py:17-24``): random mean, covariance ``L L^T + 1e-3 I``
with normal ``L``.  ``ill_conditioned_gaussian`` is the BASELINE "D>=512
ill-conditioned target" — log-spaced spectrum with a random rotation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..distributions import mvn_logpdf, mvn_sample, safe_cholesky
from .base import Target, make_target


def _gaussian_target(mean, cov, name: str) -> Target:
    mean = jnp.asarray(mean)
    cov = jnp.asarray(cov)
    chol = safe_cholesky(cov)
    t = make_target(lambda x: mvn_logpdf(x, mean, chol), mean.shape[-1],
                    name=name, mean=mean, cov=cov)
    t.sample = lambda key, n: mvn_sample(key, mean, chol, n)
    return t


def dense_gaussian(key, d: int, scale: float = 1.0) -> Target:
    """Random dense-covariance MVN (reference ``setup_model``,
    ``examples/example_gsm.py:17-24``)."""
    key_m, key_l = jax.random.split(key)
    mean = jax.random.uniform(key_m, (d,))
    l = scale * jax.random.normal(key_l, (d, d))
    cov = l @ l.T + 1e-3 * jnp.eye(d)
    return _gaussian_target(mean, cov, f"dense_gaussian_d{d}")


def ill_conditioned_gaussian(key, d: int, condition: float = 1e4) -> Target:
    """MVN with log-spaced eigenvalues spanning ``condition`` and a random
    rotation (BASELINE.json config 5)."""
    key_m, key_q = jax.random.split(key)
    mean = jax.random.normal(key_m, (d,))
    evals = jnp.logspace(0.0, jnp.log10(condition), d)
    q, _ = jnp.linalg.qr(jax.random.normal(key_q, (d, d)))
    cov = (q * evals) @ q.T
    cov = 0.5 * (cov + cov.T)
    return _gaussian_target(mean, cov, f"ill_gaussian_d{d}_k{condition:g}")
