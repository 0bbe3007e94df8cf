import numpy as np, jax, jax.numpy as jnp
from gsmvi_tpu.models import dense_gaussian
from gsmvi_tpu.ops.pallas.fused_step import gsm_eps_update_ns_xla
from gsmvi_tpu.ops.gsm_eps import apply_eps_step

for D in (256, 64):
    t = dense_gaussian(jax.random.PRNGKey(3), D)
    cs = float(np.abs(np.asarray(t.cov)).max())
    def fit(B, niter, update):
        key = jax.random.PRNGKey(0)
        mu = jnp.zeros(D, jnp.float32); f = jnp.eye(D, dtype=jnp.float32)
        @jax.jit
        def step(carry, _):
            mu, f, k = carry
            k, ks = jax.random.split(k)
            eps = jax.random.normal(ks, (B, D), jnp.float32)
            with jax.default_matmul_precision("float32"):
                ef = eps @ f.T
                vs = t.lp_g(mu + ef).astype(jnp.float32)
                mu2, f2, good = update(eps, vs, mu, f, ef)
            return (mu2, f2, k), good
        (mu, f, _), goods = jax.lax.scan(step, (mu, f, key), None, length=niter)
        cov = f @ f.T
        return (round(float(np.max(np.abs(np.asarray(cov) - np.asarray(t.cov))) / cs), 5),
                int(np.sum(~np.asarray(goods))))
    ns = lambda it: (lambda e, v, m, f, ef: gsm_eps_update_ns_xla(e, v, m, f, ef_t=ef, iters=it))
    chol = lambda e, v, m, f, ef: apply_eps_step(m, f, e, v)
    B = 64
    print(f"D={D} B=64 chol", fit(B, 6000, chol), flush=True)
    print(f"D={D} B=64 ns_short", fit(B, 6000, ns((5,4,6,7,4))), flush=True)
    print(f"D={D} B=64 ns_long ", fit(B, 6000, ns((8,6,9,10,6))), flush=True)
print("done", flush=True)
