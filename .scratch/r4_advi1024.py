import time, json
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from gsmvi_tpu import ADVI
from gsmvi_tpu.models import dense_gaussian

D, B = 1024, 32
t = dense_gaussian(jax.random.PRNGKey(3), D)
g = ADVI(D=D, lp=t.lp, pallas_score=t.pallas_score)

def errs(m, c):
    em = float(np.max(np.abs(np.asarray(m) - np.asarray(t.mean))))
    sc = max(1.0, float(np.abs(np.asarray(t.cov)).max()))
    ec = float(np.max(np.abs(np.asarray(c) - np.asarray(t.cov)))) / sc
    return round(em, 5), round(ec, 5)

t0 = time.time()
st, _ = g.fit_fused(jax.random.PRNGKey(0), learning_rate=1e-2, niter=400_000,
                    batch_size=B, verbose=False, return_state=True)
m, c = st.loc, g.scales_to_cov(st.l)
print(json.dumps({"phase": "bulk_analytic_1e-2_400k", "wall": round(time.time()-t0,1),
                  "errs": errs(m, c)}), flush=True)
for (lr, n, tag) in ((3e-3, 60_000, "stl_3e-3_60k"), (1e-3, 120_000, "stl_1e-3_120k")):
    t0 = time.time()
    st, _ = g.fit_fused(jax.random.PRNGKey(1), learning_rate=lr, niter=n,
                        batch_size=B, verbose=False, state=st,
                        return_state=True, estimator="stl")
    m = st.loc
    c = g.scales_to_cov(st.l if hasattr(st, "l") else st.scales)
    print(json.dumps({"phase": tag, "wall": round(time.time()-t0,1),
                      "errs": errs(m, c)}), flush=True)
print("DONE", flush=True)
