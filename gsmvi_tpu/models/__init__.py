"""Target-distribution zoo: builders returning ``(lp, lp_g)`` callables.

The reference leaves target construction to its examples, each of which builds
a random dense-covariance MVN with numpyro (``examples/example_gsm.py:17-24``).
numpyro is an optional extra here; the zoo is self-contained jax and covers
the benchmark configs of BASELINE.md plus standard hard targets for VI:

- ``gaussian``   — dense random MVN (the reference's example target) and
  ill-conditioned variants (BASELINE "D>=512 ill-conditioned target").
- ``funnel``     — Neal's funnel (strongly non-Gaussian scale coupling).
- ``banana``     — Rosenbrock-warped Gaussian.
- ``mixture``    — Gaussian mixtures.
- ``regression`` — Bayesian logistic-regression posterior.
- ``numpyro_compat`` — adapter wrapping any numpyro model into ``(lp, lp_g)``
  when numpyro is installed.

Every builder returns a ``Target`` with jitted ``lp`` (summed over the batch,
matching the reference convention ``lp = jit(lambda x: jnp.sum(model.log_prob(x)))``,
``examples/example_gsm.py:34``) and ``lp_g = jit(grad(lp))``.
"""

from .base import Target, make_target
from .gaussian import dense_gaussian, ill_conditioned_gaussian
from .funnel import funnel
from .banana import banana
from .mixture import gaussian_mixture
from .regression import logistic_regression
from .student_t import student_t
