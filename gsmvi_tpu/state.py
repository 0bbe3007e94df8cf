"""Functional variational state threaded through compiled fit loops.

The reference fitters keep (mean, cov) as loose Python locals mutated by a
host loop (``gsmvi/gsm.py:107-129``).  Here the full algorithm state is a
single immutable pytree so one jitted step (or a ``lax.scan`` over steps) owns
everything: no host round-trips for sampling, goodness checks, or RNG.

The Cholesky factor rides along with the covariance: it is needed every
iteration for on-device sampling, and its finiteness doubles as the validity
("goodness") check the reference performs with a host ``np.linalg.cholesky``
per iteration (``gsmvi/gsm.py:136-150``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .distributions import safe_cholesky


class VIState(NamedTuple):
    """State for GSM/BaM fits: q = N(mean, cov), cov = chol @ chol.T."""

    mean: jax.Array      # (D,)
    cov: jax.Array       # (D, D)
    chol: jax.Array      # (D, D) lower Cholesky factor of cov
    key: jax.Array       # jax PRNG key
    step: jax.Array      # i32 iteration counter
    n_accepted: jax.Array  # i32 count of accepted updates
    n_rejected: jax.Array  # i32 count of reverted updates


def init_state(key, d: int, mean=None, cov=None, dtype=None) -> VIState:
    """Build an initial ``VIState`` (defaults mean=0, cov=I, as the reference's
    ``fit`` does at ``gsmvi/gsm.py:100-103``)."""
    if dtype is None:
        dtype = jnp.zeros(0).dtype  # respects jax_enable_x64
    mean = jnp.zeros(d, dtype) if mean is None else jnp.asarray(mean, dtype)
    cov = jnp.eye(d, dtype=dtype) if cov is None else jnp.asarray(cov, dtype)
    chol = safe_cholesky(cov)
    zero = jnp.zeros((), jnp.int32)
    return VIState(mean, cov, chol, key, zero, zero, zero)


def accept_or_revert(state: VIState, mean_new, cov_new, key,
                     chol_fn=None) -> VIState:
    """On-device goodness check + revert.

    A proposed (mean, cov) is accepted iff its Cholesky factor is finite —
    the pure-functional equivalent of the reference's host-side
    try/``np.linalg.cholesky``/isnan check and revert (``gsmvi/gsm.py:125-129``).
    The factor is reused for the next iteration's sampling, so the check is
    free.  ``chol_fn`` swaps the factorization (default XLA cholesky) — the
    sharded large-D path passes ``parallel.chol.blocked_cholesky`` so the
    O(D^3) work stays partitioned instead of gathering Σ every step.
    """
    chol_new = (chol_fn or jnp.linalg.cholesky)(cov_new)
    good = jnp.all(jnp.isfinite(chol_new))
    mean = jnp.where(good, mean_new, state.mean)
    cov = jnp.where(good, cov_new, state.cov)
    chol = jnp.where(good, chol_new, state.chol)
    return VIState(
        mean, cov, chol, key,
        state.step + 1,
        state.n_accepted + good.astype(jnp.int32),
        state.n_rejected + (1 - good.astype(jnp.int32)),
    )
