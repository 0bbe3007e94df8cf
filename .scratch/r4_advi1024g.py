"""lr sensitivity at B=512 (noise 16x lower than B=32 — does lr bind now?)
Plus a cosine-ish annealed schedule leg."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

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


def run(tag, lr, nseg=3):
    st = None
    t_all = time.time()
    for i in range(nseg):
        t0 = time.time()
        st, _ = g.fit_fused(jax.random.PRNGKey(i), learning_rate=lr,
                            niter=250_000, batch_size=B, verbose=False,
                            state=st, return_state=True)
        e = errs(st)
        print(json.dumps({"tag": tag, "seg": i, "b32_equiv_M": (i + 1) * 4,
                          "errs": e, "seg_wall": round(time.time() - t0, 1),
                          "wall_total": round(time.time() - t_all, 1)}),
              flush=True)
    return st


run("lr3e-2", 3e-2)
run("lr1e-1", 1e-1)
print("DONE", flush=True)
