"""Pallas TPU kernels for the hot update path.

These fuse whole update computations into single VMEM-resident kernels,
eliminating intermediate HBM round-trips of the D x D state that the XLA
op-by-op path incurs (SURVEY.md §7 step 8).  Every kernel has a jnp
reference implementation in ops/ and is validated against it in
tests/test_pallas.py (interpret mode on CPU, compiled on TPU).

Use ``gsm_update_fused`` / availability helpers; fitters select Pallas
automatically on TPU for supported shapes.
"""

from .fused_step import (fused_supported, gaussian_score_kernel,
                         gsm_eps_update_fused, make_fused_eps_multistep,
                         make_fused_eps_step)
from .gsm_step import gsm_update_fused, pallas_supported
