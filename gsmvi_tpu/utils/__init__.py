"""Diagnostics, initialization, checkpointing, and profiling utilities."""

from .monitors import KLMonitor, forward_kl, reverse_kl
from .initializers import lbfgs_init, map_init
from .checkpoint import load_state, save_state
from .profiling import fit_throughput, nan_debug, time_fn, trace
