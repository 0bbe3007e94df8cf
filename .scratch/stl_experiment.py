"""Does STL improve ADVI on the bench target? CPU, D=64, B=32."""
import numpy as np, jax, jax.numpy as jnp, optax, time
jax.config.update("jax_platforms", "cpu")
from gsmvi_tpu.models import dense_gaussian

D, B, NITER = 64, 32, 30000
t = dense_gaussian(jax.random.PRNGKey(3), D)
lp = t.lp

def make_loss(stl):
    def loss(params, eps):
        loc, l = params
        lt = jnp.tril(l)
        x = loc + eps @ lt.T
        lp_term = jnp.sum(jax.vmap(lp)(x))
        if stl:
            lts, locs = jax.lax.stop_gradient(lt), jax.lax.stop_gradient(loc)
            v = jax.scipy.linalg.solve_triangular(
                lts, (x - locs).T, lower=True).T
            logq = -0.5 * jnp.sum(v * v) - B * jnp.sum(
                jnp.log(jnp.abs(jnp.diagonal(lts))))
        else:
            # analytic entropy (what our neg_elbo uses): eps fixed
            logq = -0.5 * jnp.sum(eps * eps) - B * jnp.sum(
                jnp.log(jnp.abs(jnp.diagonal(lt))))
        return -(lp_term - logq)
    return loss

def fit(stl, lr=1e-2, seed=0):
    loss = make_loss(stl)
    opt = optax.adam(lr)
    loc = jnp.zeros(D); l = jnp.eye(D)
    params = (loc, l)
    state = opt.init(params)
    @jax.jit
    def step(params, state, key):
        eps = jax.random.normal(key, (B, D))
        g = jax.grad(loss)(params, eps)
        u, state = opt.update(g, state, params)
        return optax.apply_updates(params, u), state
    key = jax.random.PRNGKey(seed)
    for i in range(NITER):
        key, k = jax.random.split(key)
        params, state = step(params, state, k)
    loc, l = params
    cov = jnp.tril(l) @ jnp.tril(l).T
    me = float(jnp.max(jnp.abs(loc - t.mean)))
    ce = float(jnp.max(jnp.abs(cov - t.cov))) / max(1.0, float(jnp.abs(t.cov).max()))
    return me, ce

# gradient variance at the OPTIMUM (q == p)
loc_opt = jnp.asarray(t.mean); l_opt = jnp.linalg.cholesky(jnp.asarray(t.cov))
for stl in (False, True):
    loss = make_loss(stl)
    gs = []
    for s in range(5):
        eps = jax.random.normal(jax.random.PRNGKey(100+s), (B, D))
        g = jax.grad(loss)((loc_opt, l_opt), eps)
        gs.append(float(jnp.sqrt(jnp.sum(g[0]**2) + jnp.sum(jnp.tril(g[1])**2))))
    print(f"stl={stl} grad-norm at optimum: {np.mean(gs):.4e}", flush=True)

for stl in (False, True):
    t0=time.time(); me, ce = fit(stl)
    print(f"stl={stl} 30k iters: mean_err={me:.4f} cov_err={ce:.4f} ({time.time()-t0:.0f}s)", flush=True)
