"""Adapter for numpyro models (optional dependency).

The reference examples hand-build ``lp``/``lp_g`` from numpyro distributions
(``examples/example_gsm.py:34-35``); this adapter does it for any object with a
``log_prob`` method, and for full numpyro models via ``log_density``.
Import-guarded: the core framework never requires numpyro.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .base import Target, make_target


def from_distribution(dist, d: int, name: str = "numpyro_dist") -> Target:
    """Wrap any object exposing ``log_prob((B, D)) -> (B,)`` (numpyro
    distributions qualify) into a Target."""
    t = make_target(lambda x: dist.log_prob(x), d, name=name)
    if hasattr(dist, "sample"):
        t.sample = lambda key, n: dist.sample(key, (n,))
    if hasattr(dist, "loc"):
        t.mean = jnp.asarray(dist.loc)
    if hasattr(dist, "covariance_matrix"):
        t.cov = jnp.asarray(dist.covariance_matrix)
    return t


def from_numpyro_model(model: Callable, d: int, model_args=(),
                       model_kwargs=None, name: str = "numpyro_model",
                       flatten: Optional[Callable] = None) -> Target:
    """Wrap a numpyro model function via ``numpyro.infer.util.log_density``.

    ``flatten`` maps a flat (D,) vector to the model's site dict; defaults to
    a single site named "x".  Raises ImportError if numpyro is missing.
    """
    from numpyro.infer.util import log_density  # noqa: deferred import

    model_kwargs = model_kwargs or {}
    if flatten is None:
        flatten = lambda v: {"x": v}

    def single_lp(v):
        ld, _ = log_density(model, model_args, model_kwargs, flatten(v))
        return ld

    def log_prob(x):
        return jax.vmap(single_lp)(x)

    return make_target(log_prob, d, name=name)
