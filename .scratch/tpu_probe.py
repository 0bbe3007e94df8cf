import jax, time
t0 = time.time()
d = jax.devices()
print("devices:", d, "t=%.1fs" % (time.time()-t0), flush=True)
import numpy as np, jax.numpy as jnp
x = jnp.ones((8,8))
y = np.asarray(x @ x)
print("matmul ok, sum=", y.sum(), "t=%.1fs" % (time.time()-t0), flush=True)
