"""K independent fits in one compiled program (vmapped replicas).

No reference equivalent: this is TPU-native batching of whole fits — K
random-restart replicas (or per-replica warm starts) whose small per-step
matmuls batch into MXU-filling ops.

On TPU the GSM class delegates this to ``FactorGSM.fit_batch`` (the
batched eps-coordinate step); ``FactorGSM.fit_batch(small_solver="fused",
pallas_score=...)`` additionally offers the K-replica fused Pallas kernel,
whose replicas are bit-identical to same-key single fused fits (the
trajectory-exact batched option — see docs/BENCHMARKS.md round 5 for the
measured throughput trade).

Run: python examples/example_fit_batch.py
"""

import jax
import numpy as np

from gsmvi_tpu import GSM
from gsmvi_tpu.models import dense_gaussian

if __name__ == "__main__":
    D, K = 16, 8
    target = dense_gaussian(jax.random.PRNGKey(3), D)

    gsm = GSM(D=D, lp=target.lp, lp_g=target.lp_g)
    keys = jax.random.split(jax.random.PRNGKey(99), K)
    means, covs = gsm.fit_batch(keys, niter=500, batch_size=8)

    errs = np.abs(np.asarray(means) - np.asarray(target.mean)).max(axis=1)
    print(f"{K} replicas fit in one compiled program")
    print("per-replica max |mean error|:", np.round(errs, 5))
    print("replica spread (MC noise)   :", float(errs.std()))
