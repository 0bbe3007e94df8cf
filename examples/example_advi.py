"""Fit a Gaussian target with ADVI / ELBO maximization (TPU-native).

Mirrors the reference examples/example_advi.py: D=4, adam(1e-2), batch 16.

Run: python examples/example_advi.py
"""

import jax
import numpy as np
import optax

from gsmvi_tpu import ADVI
from gsmvi_tpu.models import dense_gaussian

if __name__ == "__main__":
    D = 4
    target = dense_gaussian(jax.random.PRNGKey(7), D)

    niter = 10_000
    key = jax.random.PRNGKey(99)
    opt = optax.adam(learning_rate=1e-2)
    advi = ADVI(D=D, lp=target.lp)
    mean_fit, cov_fit, losses = advi.fit(key, opt, batch_size=16, niter=niter)

    print("\nTrue mean : ", np.asarray(target.mean))
    print("Fit mean  : ", np.asarray(mean_fit))
    print("neg-ELBO  : ", losses[0], "->", losses[-1])
