"""D=1024 ADVI recipe exploration: which knob unsticks the plateau?

(1) long segmented bulk at lr 1e-2 (is it just iterations?)
(2) lr 3e-2 bulk (is it traverse speed?)
(3) B=128 bulk (is it MC noise?)
Each prints (mean_err, cov_err) per 1M-iter segment (worker-crash safe).
"""
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


def errs(m, c):
    em = float(np.max(np.abs(np.asarray(m) - np.asarray(t.mean))))
    sc = max(1.0, float(np.abs(np.asarray(t.cov)).max()))
    ec = float(np.max(np.abs(np.asarray(c) - np.asarray(t.cov)))) / sc
    return round(em, 5), round(ec, 5)


def bulk(tag, lr, batch, segments, seg_iters=1_000_000):
    g = ADVI(D=D, lp=t.lp, pallas_score=t.pallas_score)
    st = None
    for i in range(segments):
        t0 = time.time()
        st, _ = g.fit_fused(jax.random.PRNGKey(i), learning_rate=lr,
                            niter=seg_iters, batch_size=batch,
                            verbose=False, state=st, return_state=True)
        m, c = st.loc, g.scales_to_cov(st.l)
        print(json.dumps({"tag": tag, "seg": i,
                          "wall": round(time.time() - t0, 1),
                          "errs": errs(m, c)}), flush=True)
    return st


bulk("lr1e-2_B32", 1e-2, 32, 4)
bulk("lr3e-2_B32", 3e-2, 32, 2)
bulk("lr1e-2_B128", 1e-2, 128, 1, 500_000)
print("DONE", flush=True)
