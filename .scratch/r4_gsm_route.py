"""Measure the GSM class DEFAULT (factor-routed) on the real chip.

Differential timing (CLAUDE.md measurement protocol): two iteration counts,
rate = (n2-n1)/(t2-t1); end every window with a host transfer.
One fitter config = one jit shape per D.
"""
import json
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from gsmvi_tpu import GSM  # noqa: E402
from gsmvi_tpu.models import dense_gaussian  # noqa: E402

B = 32


def timed(run, n):
    t0 = time.perf_counter()
    m, c = run(n)
    np.asarray(m), np.asarray(c)
    return time.perf_counter() - t0


for d, n1, n2 in ((256, 10_000, 40_000), (1024, 4_000, 16_000)):
    t = dense_gaussian(jax.random.PRNGKey(1), d, scale=1.0)
    g = GSM(D=d, lp=t.lp, lp_g=t.lp_g)  # class default: factor route on TPU
    assert g._factor_route(True), "expected the factor route on TPU"

    def run(n):
        return g.fit(jax.random.PRNGKey(0), niter=n, batch_size=B,
                     verbose=False)

    timed(run, 200)  # compile + warm
    t1 = timed(run, n1)
    t2 = timed(run, n2)
    ips = (n2 - n1) / (t2 - t1)
    m, c = run(n2)
    me = float(np.max(np.abs(np.asarray(m) - np.asarray(t.mean))))
    ce = float(np.max(np.abs(np.asarray(c) - np.asarray(t.cov))))
    print(json.dumps({"cell": "gsm_class_default_routed", "D": d,
                      "iters_per_s": round(ips, 1),
                      "mean_err": round(me, 5), "cov_err": round(ce, 5)}),
          flush=True)
print("DONE", flush=True)
