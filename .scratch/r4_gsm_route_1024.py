"""Apples-to-apples @ D=1024: FactorGSM eps with the fused update kernel
(use_pallas auto) vs pure XLA (use_pallas=False), long differential windows."""
import json
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from gsmvi_tpu import FactorGSM  # noqa: E402
from gsmvi_tpu.models import dense_gaussian  # noqa: E402

B = 32
D = 1024
t = dense_gaussian(jax.random.PRNGKey(1), D, scale=1.0)


def timed(run, n):
    t0 = time.perf_counter()
    m, c = run(n)
    np.asarray(m), np.asarray(c)
    return time.perf_counter() - t0


for label, kw in (("fused_update", dict(use_pallas=True)),
                  ("xla_eps", dict(use_pallas=False))):
    g = FactorGSM(D=D, lp=t.lp, lp_g=t.lp_g, **kw)

    def run(n):
        return g.fit(jax.random.PRNGKey(0), niter=n, batch_size=B,
                     verbose=False)

    timed(run, 200)
    n1, n2 = 8_000, 32_000
    t1 = timed(run, n1)
    t2 = timed(run, n2)
    ips = (n2 - n1) / (t2 - t1)
    print(json.dumps({"cell": label, "D": D, "iters_per_s": round(ips, 1),
                      "t1": round(t1, 2), "t2": round(t2, 2)}), flush=True)
print("DONE", flush=True)
