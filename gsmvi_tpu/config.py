"""Configuration: kwarg-first (reference parity) plus a small typed config.

The reference has no config system — everything is kwargs, with env vars and
``jax_enable_x64`` toggled by hand in examples (``examples/example_bam.py:4-15``).
This module keeps the kwarg-first API and centralizes the environment knobs:

- ``FitConfig``    — a dataclass bundling the common ``fit`` kwargs, usable as
  ``fitter.fit(key, **config.fit_kwargs())``.
- ``enable_x64``   — the x64 toggle the BaM/LBFGS examples need (f64 is
  host/CPU-oriented; TPUs run f32/bf16).
- ``xla_memory_env`` — the XLA allocator env vars the reference examples set
  manually (``examples/example_bam.py:4-7``).
"""

from __future__ import annotations

import os
from dataclasses import asdict, dataclass

import jax


@dataclass
class FitConfig:
    """Common fit options (defaults = reference defaults, ``gsmvi/gsm.py:79``)."""

    batch_size: int = 2
    niter: int = 5000
    nprint: int = 10
    verbose: bool = True

    def fit_kwargs(self) -> dict:
        return asdict(self)


def enable_x64(enable: bool = True) -> None:
    """Toggle 64-bit jax globally (reference examples do this inline)."""
    jax.config.update("jax_enable_x64", enable)


def xla_memory_env(preallocate: bool = False) -> None:
    """Set the XLA client memory env vars the reference examples recommend.

    Must run before the backend initializes to take effect.
    """
    os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE",
                          "true" if preallocate else "false")
    if not preallocate:
        os.environ.setdefault("XLA_PYTHON_CLIENT_ALLOCATOR", "platform")
