"""Compute kernels: MXU matmul-FFT, double-word (emulated fp64) arithmetic."""
