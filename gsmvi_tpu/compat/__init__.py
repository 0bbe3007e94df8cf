"""Compatibility layer: zero-dependency numpy path mirroring the reference's
``gsmvi/gsm_numpy.py`` surface (int-seed ``fit``, numpy in/out)."""

from .gsm_numpy import GSM, gsm_update
