"""Fit every target-zoo family through the one-kernel fused GSM path.

Every zoo constructor attaches ``target.pallas_score`` — an analytic,
Pallas-traceable score — so on TPU the ENTIRE GSM iteration (on-chip PRNG,
sampling, score, rank-2B update, exact PD check, select) runs as one
VMEM-resident kernel (``ops/pallas/fused_step.py``).  Off-TPU the same
``FactorGSM`` call transparently uses the XLA eps path, so this example
runs anywhere:

  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/example_zoo.py

No reference equivalent: the reference's examples are numpyro-model MVNs
only (``/root/reference/examples/example_gsm.py:20-35``).
"""

import jax
import numpy as np

from gsmvi_tpu import FactorGSM
from gsmvi_tpu.models import (banana, dense_gaussian, funnel,
                              gaussian_mixture, logistic_regression,
                              student_t)

if __name__ == "__main__":
    D, B, NITER = 32, 32, 2000
    targets = [
        dense_gaussian(jax.random.PRNGKey(1), D),
        funnel(D),
        banana(D),
        student_t(jax.random.PRNGKey(2), D, df=6.0),
        gaussian_mixture(jax.random.PRNGKey(3), D, n_components=3),
        logistic_regression(jax.random.PRNGKey(4), D, n_data=128),
    ]
    for t in targets:
        fg = FactorGSM(D=D, lp=t.lp, lp_g=t.lp_g,
                       pallas_score=t.pallas_score)
        mean, cov = fg.fit(jax.random.PRNGKey(0), niter=NITER, batch_size=B,
                           verbose=False)
        m = np.asarray(mean)
        pd = bool(np.all(np.linalg.eigvalsh(np.asarray(cov)) > 0))
        line = f"{t.name:24s} finite={bool(np.isfinite(m).all())} PD={pd}"
        if t.mean is not None:
            line += f"  max|mean err|={float(np.max(np.abs(m - np.asarray(t.mean)))):.4f}"
        print(line)
