"""Diagnostics, initialization, checkpointing, and profiling utilities."""

from .monitors import KLMonitor, forward_kl, reverse_kl
from .initializers import lbfgs_init, map_init
