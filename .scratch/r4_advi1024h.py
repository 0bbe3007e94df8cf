"""Final validation of the exact advi_twophase D=1024 bench-cell recipe:
2.25M fused analytic iters @ B=512 lr 1e-2, then 204k XLA-STL @ B=32
lr 1e-3.  Expect cov_err ~0.04, wall ~5.5 min."""
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gsmvi_tpu import ADVI
from gsmvi_tpu.models import dense_gaussian

D = 1024
t = dense_gaussian(jax.random.PRNGKey(3), D)
g = ADVI(D=D, lp=t.lp, pallas_score=t.pallas_score)


def errs(st):
    m = st.loc
    c = g.scales_to_cov(st.l if hasattr(st, "l") else st.scales)
    em = float(np.max(np.abs(np.asarray(m) - np.asarray(t.mean))))
    sc = max(1.0, float(np.abs(np.asarray(t.cov)).max()))
    ec = float(np.max(np.abs(np.asarray(c) - np.asarray(t.cov)))) / sc
    return round(em, 5), round(ec, 5)


n = 2_250_000
t0 = time.perf_counter()
st, _ = g.fit_fused(jax.random.PRNGKey(0), learning_rate=1e-2, niter=n,
                    batch_size=512, verbose=False, return_state=True,
                    max_steps_per_call=400_000)
e_bulk = errs(st)
w_bulk = time.perf_counter() - t0
print(json.dumps({"phase": "bulk_B512_2.25M", "errs": e_bulk,
                  "wall": round(w_bulk, 1)}), flush=True)
t0 = time.perf_counter()
st, _ = g.fit_fused(jax.random.PRNGKey(2), learning_rate=1e-3,
                    niter=max(2, n // 11), batch_size=32, verbose=False,
                    state=st, return_state=True, estimator="stl")
e = errs(st)
print(json.dumps({"phase": "stl_polish_204k", "errs": e,
                  "wall": round(time.perf_counter() - t0, 1)}), flush=True)
print("DONE", flush=True)
