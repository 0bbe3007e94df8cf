"""B=512 sample-law + rate probe at D=1024.

If cov_err tracks TOTAL SAMPLES (as measured between B=32 and B=128) and
the per-sample cost at B=512 is ~4x lower (the D^2 per-iteration overhead
amortizes), the 0.05 recipe drops from ~40 min (B=32) to ~10 min.
6 segments x 250k iters @ B=512 = 48M B32-equivalent iterations."""
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gsmvi_tpu import ADVI
from gsmvi_tpu.models import dense_gaussian

D, B = 1024, 512
t = dense_gaussian(jax.random.PRNGKey(3), D)
g = ADVI(D=D, lp=t.lp, pallas_score=t.pallas_score)


def errs(st):
    m, c = st.loc, g.scales_to_cov(st.l)
    em = float(np.max(np.abs(np.asarray(m) - np.asarray(t.mean))))
    sc = max(1.0, float(np.abs(np.asarray(t.cov)).max()))
    ec = float(np.max(np.abs(np.asarray(c) - np.asarray(t.cov)))) / sc
    return round(em, 5), round(ec, 5)


st = None
t_all = time.time()
for i in range(6):
    t0 = time.time()
    st, _ = g.fit_fused(jax.random.PRNGKey(i), learning_rate=1e-2,
                        niter=250_000, batch_size=B, verbose=False,
                        state=st, return_state=True)
    e = errs(st)  # syncs
    print(json.dumps({"seg": i, "b32_equiv_M": (i + 1) * 4, "errs": e,
                      "seg_wall": round(time.time() - t0, 1),
                      "wall_total": round(time.time() - t_all, 1)}),
          flush=True)
print("DONE", flush=True)
