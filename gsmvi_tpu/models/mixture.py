"""Gaussian-mixture target (multi-modal benchmark)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..distributions import mvn_logpdf
from .base import Target, make_target


def gaussian_mixture(key, d: int, n_components: int = 3,
                     separation: float = 3.0) -> Target:
    """Equal-weight mixture of ``n_components`` spherical Gaussians.

    Component means are drawn at ``separation`` scale; log-prob is a stable
    logsumexp over component densities.
    """
    means = separation * jax.random.normal(key, (n_components, d))
    chol = jnp.eye(d)

    def log_prob(x):
        # (B, K) component log-densities
        comp = jax.vmap(lambda m: mvn_logpdf(x, m, chol))(means)  # (K, B)
        return jax.scipy.special.logsumexp(comp, axis=0) - jnp.log(n_components)

    # Analytic moments of an equal-weight mixture with identity components.
    mix_mean = jnp.mean(means, axis=0)
    dev = means - mix_mean
    mix_cov = jnp.eye(d) + dev.T @ dev / n_components

    t = make_target(log_prob, d, name=f"gmm_d{d}_k{n_components}",
                    mean=mix_mean, cov=mix_cov)

    # In-kernel analytic score for the fully-fused Pallas step: pad K to a
    # sublane multiple (repeat row 0, masked to zero weight via -1e30 logits)
    # so the (B, K) tiles stay Mosaic-friendly
    # (ops/pallas/fused_step.py:mixture_score_kernel).
    from ..ops.pallas.fused_step import mixture_score_kernel
    k_pad = max(8, -(-n_components // 8) * 8)
    means_pad = jnp.concatenate(
        [means, jnp.broadcast_to(means[:1], (k_pad - n_components, d))])
    logmask = jnp.where(jnp.arange(k_pad) < n_components, 0.0,
                        -1e30)[None, :]
    t.pallas_score = (mixture_score_kernel, (means_pad, logmask))

    def sample(key, n):
        kc, kz = jax.random.split(key)
        idx = jax.random.randint(kc, (n,), 0, n_components)
        z = jax.random.normal(kz, (n, d))
        return means[idx] + z

    t.sample = sample
    return t
