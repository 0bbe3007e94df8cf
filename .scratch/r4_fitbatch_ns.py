"""fit_batch with the NS-XLA batched step (small_solver='auto') vs 'chol'."""
import time, json
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from gsmvi_tpu import FactorGSM
from gsmvi_tpu.models import dense_gaussian

B = 32


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return out, time.perf_counter() - t0


for solver in ("auto", "chol"):
    for d, K, niter, n1 in ((64, 8, 20000, 5000), (64, 32, 20000, 5000),
                            (64, 128, 10000, 2500),
                            (256, 8, 8000, 2000), (256, 32, 8000, 2000)):
        t = dense_gaussian(jax.random.PRNGKey(3), d)
        g = FactorGSM(D=d, lp=t.lp, lp_g=t.lp_g)
        keys = jax.random.split(jax.random.PRNGKey(0), K)
        run = lambda n: g.fit_batch(keys, batch_size=B, niter=n,
                                    small_solver=solver)
        (m, c), _ = timed(run, niter)
        _ = timed(run, n1)
        best = 0.0
        for _ in range(2):
            _, t1 = timed(run, n1)
            (m, c), t2 = timed(run, niter)
            best = max(best, (niter - n1) / max(t2 - t1, 1e-9))
        em = float(np.max(np.abs(np.asarray(m) - np.asarray(t.mean)[None, :])))
        ec = float(np.max(np.abs(np.asarray(c) - np.asarray(t.cov)[None])) /
                   max(np.max(np.abs(np.asarray(t.cov))), 1e-9))
        agg = best * K
        print(json.dumps({"cell": "fit_batch", "solver": solver, "D": d,
                          "K": K,
                          "iters_per_s_per_replica": round(best, 1),
                          "aggregate_iters_per_s": round(agg, 1),
                          "aggregate_score_evals_per_s": round(agg * B, 1),
                          "mean_err_max": round(em, 5),
                          "cov_err_max": round(ec, 5)}), flush=True)
print("DONE", flush=True)
