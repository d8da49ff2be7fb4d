"""Spectral utilities: padding/truncation, wavenumbers, dealias masks, timers."""

from .spectral import (  # noqa: F401
    pad_full_axis, trunc_full_axis, pad_half_axis, trunc_half_axis,
    wavenumbers_full, wavenumbers_half, dealias_cutoffs,
)
