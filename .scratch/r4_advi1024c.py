"""Full D=1024 two-phase recipe validation: 8M bulk @1e-2 + 4M @3e-3
(fused analytic) + 200k XLA-STL polish @1e-3.  Errs per segment."""
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gsmvi_tpu import ADVI
from gsmvi_tpu.models import dense_gaussian

D, B = 1024, 32
t = dense_gaussian(jax.random.PRNGKey(3), D)
g = ADVI(D=D, lp=t.lp, pallas_score=t.pallas_score)


def errs(st):
    m = st.loc
    c = g.scales_to_cov(st.l if hasattr(st, "l") else st.scales)
    em = float(np.max(np.abs(np.asarray(m) - np.asarray(t.mean))))
    sc = max(1.0, float(np.abs(np.asarray(t.cov)).max()))
    ec = float(np.max(np.abs(np.asarray(c) - np.asarray(t.cov)))) / sc
    return round(em, 5), round(ec, 5)


st = None
t_all = time.time()
for i in range(12):
    lr = 1e-2 if i < 8 else 3e-3
    st, _ = g.fit_fused(jax.random.PRNGKey(i), learning_rate=lr,
                        niter=1_000_000, batch_size=B, verbose=False,
                        state=st, return_state=True)
    e = errs(st)  # syncs
    print(json.dumps({"seg": i, "lr": lr, "errs": e,
                      "wall_total": round(time.time() - t_all, 1)}),
          flush=True)
t0 = time.time()
st, _ = g.fit_fused(jax.random.PRNGKey(99), learning_rate=1e-3,
                    niter=200_000, batch_size=B, verbose=False, state=st,
                    return_state=True, estimator="stl")
e = errs(st)
print(json.dumps({"seg": "stl_polish_200k_1e-3", "errs": e,
                  "wall": round(time.time() - t0, 1),
                  "wall_total": round(time.time() - t_all, 1)}), flush=True)
print("DONE", flush=True)
