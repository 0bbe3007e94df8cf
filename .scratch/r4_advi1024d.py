"""Mechanism test: does pilot-L preconditioning unstick D=1024 ADVI?

Phase 1: 4M fused analytic bulk @1e-2 on the raw target (cov_err ~0.50).
Phase 2: rebuild the target in pilot-whitened coordinates
         z = L1^{-1}(x - loc1) (still Gaussian, so the same analytic
         pallas_score family applies — this is a MECHANISM test; the
         generic version composes A inside the kernel), fit 1M from
         identity, map back.  If the whitened fit collapses the error,
         build in-kernel preconditioning.
Phase 3: second precondition round from the phase-2 result.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gsmvi_tpu import ADVI
from gsmvi_tpu.models import dense_gaussian
from gsmvi_tpu.models.gaussian import _gaussian_target

D, B = 1024, 32
t = dense_gaussian(jax.random.PRNGKey(3), D)
cov64 = np.asarray(t.cov, np.float64)
mean64 = np.asarray(t.mean, np.float64)


def errs(loc, cov):
    em = float(np.max(np.abs(np.asarray(loc) - mean64)))
    sc = max(1.0, float(np.abs(cov64).max()))
    ec = float(np.max(np.abs(np.asarray(cov, np.float64) - cov64))) / sc
    return round(em, 5), round(ec, 5)


t_all = time.time()
g = ADVI(D=D, lp=t.lp, pallas_score=t.pallas_score)
st = None
for i in range(4):
    st, _ = g.fit_fused(jax.random.PRNGKey(i), learning_rate=1e-2,
                        niter=1_000_000, batch_size=B, verbose=False,
                        state=st, return_state=True)
loc1 = np.asarray(st.loc, np.float64)
l1 = np.asarray(st.l, np.float64)
print(json.dumps({"phase": "pilot_4M", "errs": errs(loc1, l1 @ l1.T),
                  "wall": round(time.time() - t_all, 1)}), flush=True)

for rnd in (2, 3):
    # Whitened-coordinate target: z = L1^{-1}(x - loc1); x = loc1 + L1 z.
    l1inv = np.linalg.inv(l1)
    mean_z = l1inv @ (mean64 - loc1)
    cov_z = l1inv @ cov64 @ l1inv.T
    cov_z = 0.5 * (cov_z + cov_z.T)
    print(json.dumps({"phase": f"round{rnd}_kappa_z", "kappa": float(
        np.linalg.cond(cov_z))}), flush=True)
    tz = _gaussian_target(jnp.asarray(mean_z, jnp.float32),
                          jnp.asarray(cov_z, jnp.float32), "whitened")
    gz = ADVI(D=D, lp=tz.lp, pallas_score=tz.pallas_score)
    stz = None
    t0 = time.time()
    stz, _ = gz.fit_fused(jax.random.PRNGKey(100 + rnd), learning_rate=1e-2,
                          niter=1_000_000, batch_size=B, verbose=False,
                          state=stz, return_state=True)
    loc_z = np.asarray(stz.loc, np.float64)
    lz = np.asarray(stz.l, np.float64)
    loc1 = loc1 + l1 @ loc_z
    l1 = l1 @ lz
    print(json.dumps({"phase": f"precond_round{rnd}_1M",
                      "errs": errs(loc1, l1 @ l1.T),
                      "wall": round(time.time() - t0, 1),
                      "wall_total": round(time.time() - t_all, 1)}),
          flush=True)
print("DONE", flush=True)
