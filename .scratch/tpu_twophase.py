"""All-fused two-phase at D=256: analytic bulk -> long fused-STL polish."""
import json, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from bench import _errs
from gsmvi_tpu import ADVI
from gsmvi_tpu.models import dense_gaussian

B, d = 32, 256
t = dense_gaussian(jax.random.PRNGKey(3), d)
g = ADVI(D=d, lp=t.lp, pallas_score=t.pallas_score)
t0 = time.time()
st, _ = g.fit_fused(jax.random.PRNGKey(0), learning_rate=1e-2,
                    niter=1_500_000, batch_size=B, verbose=False,
                    return_state=True)
em, ec = _errs(st.loc, g.scales_to_cov(st.l), t)
print(json.dumps({"phase": "bulk_fused_analytic", "iters": 1500000,
                  "mean_err": em, "cov_err": ec,
                  "wall_s": round(time.time() - t0, 1)}), flush=True)
for niter, lr in ((1_000_000, 3e-3), (2_000_000, 1e-3)):
    t0 = time.time()
    st, _ = g.fit_fused(jax.random.PRNGKey(1), learning_rate=lr,
                        niter=niter, batch_size=B, verbose=False,
                        state=st, return_state=True, estimator="stl")
    em, ec = _errs(st.loc, g.scales_to_cov(st.l), t)
    print(json.dumps({"phase": f"stl_fused_polish_lr{lr}", "iters": niter,
                      "mean_err": em, "cov_err": ec,
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
