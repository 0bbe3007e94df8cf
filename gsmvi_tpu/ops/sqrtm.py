"""On-device matrix square roots (TPU-native replacement for host callbacks).

The reference dispatches ``sqrtm`` by backend and *raises on TPU* (reference
``gsmvi/bam.py:19-28``: GPU -> ``jax.pure_callback`` to ``scipy.linalg.sqrtm``,
CPU -> ``jax.scipy.linalg.sqrtm``, else raise).  Both escapes break jit fusion
and force a host round trip inside the update.  Every matrix BaM actually needs
a square root of is symmetric positive (semi)definite after the similarity
reformulation in ``ops/bam.py``, so we only need SPD square roots, which are
cheap and robust on device:

- ``spd_sqrtm``          — eigendecomposition route: M = Q diag(l) Q^T,
  sqrt(M) = Q diag(sqrt(max(l,0))) Q^T.  Robust for any conditioning; eigh is
  well supported by XLA:TPU.
- ``spd_sqrtm_newton``   — scaled Newton–Schulz iteration (matmul-only, MXU
  speed-of-light, differentiable, great for well-conditioned M such as
  I + PSD).  Coupled iteration: Y <- Y (3I - Z Y)/2, Z <- (3I - Z Y)/2 Z on
  the trace-normalized matrix (arXiv:2006.11267 surveys these schemes).
- ``spd_sqrtm_and_inv``  — returns (sqrt(M), sqrt(M)^{-1}) from one eigh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def spd_sqrtm(mat, eps: float = 0.0):
    """Symmetric PSD square root via eigendecomposition.

    Eigenvalues are clipped at ``eps`` (default 0) so slightly-indefinite
    inputs produced by floating-point noise still yield a real PSD root.
    """
    w, q = jnp.linalg.eigh(mat)
    w = jnp.maximum(w, eps)
    return (q * jnp.sqrt(w)) @ q.T


def spd_sqrtm_and_inv(mat, eps: float = 1e-30):
    """(sqrt(M), inv(sqrt(M))) for SPD ``M`` from a single eigh."""
    w, q = jnp.linalg.eigh(mat)
    w = jnp.maximum(w, eps)
    sw = jnp.sqrt(w)
    return (q * sw) @ q.T, (q / sw) @ q.T


@partial(jax.jit, static_argnums=(1,))
def spd_sqrtm_newton(mat, num_iters: int = 20):
    """Scaled Newton–Schulz SPD square root: matmuls only (MXU-friendly).

    Normalizes by the Frobenius norm so the spectrum lies in (0, 1], where the
    coupled Newton–Schulz iteration converges quadratically.  Accuracy degrades
    for condition numbers >> 1e6; BaM's similarity-transformed target
    ``I + 4 L^T U L`` has eigenvalues >= 1, for which this is typically
    accurate to ~1e-6 in f32 within 15-25 iterations.
    """
    d = mat.shape[-1]
    eye = jnp.eye(d, dtype=mat.dtype)
    norm = jnp.sqrt(jnp.sum(mat * mat))
    y = mat / norm
    z = eye

    def body(_, yz):
        y, z = yz
        t = 0.5 * (3.0 * eye - z @ y)
        return (y @ t, t @ z)

    y, z = jax.lax.fori_loop(0, num_iters, body, (y, z))
    return y * jnp.sqrt(norm)
