"""Polyak tail-averaging test at D=1024: does averaging the (loc, L)
iterate stream beat the plain trajectory at equal sample budget?

Pilot 8M @1e-2, then a 2M tail at constant 1e-2 in 16 x 125k segments with
a running average of (loc, l) across segment boundaries; then 2M more at
3e-3 with a fresh average.  Compare averaged errs vs the final-state errs
(the 12M plain run measured cov_err 0.223)."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gsmvi_tpu import ADVI
from gsmvi_tpu.models import dense_gaussian

D, B = 1024, 32
t = dense_gaussian(jax.random.PRNGKey(3), D)
g = ADVI(D=D, lp=t.lp, pallas_score=t.pallas_score)


def errs(loc, cov):
    em = float(np.max(np.abs(np.asarray(loc) - np.asarray(t.mean))))
    sc = max(1.0, float(np.abs(np.asarray(t.cov)).max()))
    ec = float(np.max(np.abs(np.asarray(cov) - np.asarray(t.cov)))) / sc
    return round(em, 5), round(ec, 5)


add = jax.jit(lambda a, x: a + x)
cov_of = jax.jit(lambda l: l @ l.T)

t_all = time.time()
st = None
for i in range(8):
    st, _ = g.fit_fused(jax.random.PRNGKey(i), learning_rate=1e-2,
                        niter=1_000_000, batch_size=B, verbose=False,
                        state=st, return_state=True)
print(json.dumps({"phase": "pilot_8M", "errs": errs(st.loc, cov_of(st.l)),
                  "wall": round(time.time() - t_all, 1)}), flush=True)

for lr, tag in ((1e-2, "tail_avg_2M_lr1e-2"), (3e-3, "tail_avg_2M_lr3e-3")):
    sum_loc = jnp.zeros(D, jnp.float32)
    sum_l = jnp.zeros((D, D), jnp.float32)
    n = 16
    t0 = time.time()
    for j in range(n):
        st, _ = g.fit_fused(jax.random.PRNGKey(1000 + j), learning_rate=lr,
                            niter=125_000, batch_size=B, verbose=False,
                            state=st, return_state=True)
        sum_loc = add(sum_loc, st.loc)
        sum_l = add(sum_l, st.l)
    lbar = sum_l / n
    locbar = sum_loc / n
    print(json.dumps({
        "phase": tag,
        "errs_avg": errs(locbar, cov_of(lbar)),
        "errs_final_state": errs(st.loc, cov_of(st.l)),
        "wall": round(time.time() - t0, 1),
        "wall_total": round(time.time() - t_all, 1)}), flush=True)
print("DONE", flush=True)
