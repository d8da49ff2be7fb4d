"""Pallas TPU FFT kernels — single-HBM-pass per-axis DFTs on the MXU.

Why: XLA's built-in FFT on v5e runs a 256³ r2c+c2r round trip in ~7.4 ms,
an effective ~110 GB/s — far below the ~800 GB/s HBM bound, i.e. compute-bound
on the VPU.  The MXU route expresses a length-n DFT as dense matmuls against
precomputed cos/sin matrices; one Pallas kernel per axis keeps every
intermediate in VMEM, so each axis costs exactly one HBM read + one write.

Mosaic has no complex dtype: kernels take/return (re, im) float32 pairs; the
jnp-facing wrappers split/recombine ``complex64`` at the boundary (cheap,
fused by XLA).  Matmuls run with ``preferred_element_type=float32`` and
HIGHEST precision (bf16 multi-pass) to hold the <1e-6 relative-error target.

Kernel inventory:

* ``fft_axis``  — c2c DFT along any axis (forward or inverse) via one matmul
  pair per grid step; data viewed as (pre, n, post) with the grid tiling
  pre × post.
* ``rfft_last`` / ``irfft_last`` — r2c / c2r along the last axis via
  rectangular cos/sin DFT matrices (Nf = n//2+1 columns).

Reference analog: these are the FFTW codelets of SURVEY.md §2.3 — the "native
tier" of the framework, targeted at the systolic array instead of SIMD lanes.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fft_axis", "rfft_last", "irfft_last"]

_PREC = lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@lru_cache(maxsize=None)
def _dft_cs(n: int, sign: int):
    """(cos, sin) of the n×n DFT matrix  W[j,k] = exp(sign·2πi jk/n)  (f32)."""
    jk = np.outer(np.arange(n), np.arange(n))
    ang = sign * 2.0 * np.pi * jk / n
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@lru_cache(maxsize=None)
def _rdft_cs(n: int, nf: int, sign: int):
    """Rectangular (n × nf) cos/sin DFT matrices for r2c (columns k=0..nf-1)."""
    jk = np.outer(np.arange(n), np.arange(nf))
    ang = sign * 2.0 * np.pi * jk / n
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


# ---------------------------------------------------------------------------
# c2c along an arbitrary axis
# ---------------------------------------------------------------------------

def _cfft_kernel(xr_ref, xi_ref, cr_ref, ci_ref, or_ref, oi_ref):
    # x: (1, n, TQ) block; c: (n, n).  out[k, q] = Σ_j W[k,j] x[j, q]
    xr = xr_ref[0]
    xi = xi_ref[0]
    cr = cr_ref[...]
    ci = ci_ref[...]
    # complex matmul via 3 real matmuls (Karatsuba):
    #   re = cr·xr − ci·xi ; im = cr·xi + ci·xr
    t1 = jnp.dot(cr, xr, preferred_element_type=jnp.float32, precision=_PREC)
    t2 = jnp.dot(ci, xi, preferred_element_type=jnp.float32, precision=_PREC)
    t3 = jnp.dot(cr + ci, xr + xi, preferred_element_type=jnp.float32,
                 precision=_PREC)
    or_ref[0] = t1 - t2
    oi_ref[0] = t3 - t1 - t2


def _fft_axis_pallas(xr, xi, n: int, sign: int, tq: int, scale: float = 1.0):
    """(P, n, Q) f32 pair -> DFT along middle axis.  Grid: (P, Q/tq).
    ``scale`` is folded into the DFT matrix (free vs a post-multiply's
    extra HBM pass over the pair)."""
    Pdim, _, Q = xr.shape
    cr, ci = _dft_cs(n, sign)
    if scale != 1.0:
        cr = (cr.astype(np.float64) * scale).astype(np.float32)
        ci = (ci.astype(np.float64) * scale).astype(np.float32)
    grid = (Pdim, Q // tq)
    bspec_x = pl.BlockSpec((1, n, tq), lambda p, q: (p, 0, q),
                           memory_space=pltpu.VMEM)
    bspec_c = pl.BlockSpec((n, n), lambda p, q: (0, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(xr.shape, jnp.float32)] * 2
    fn = pl.pallas_call(
        _cfft_kernel,
        grid=grid,
        in_specs=[bspec_x, bspec_x, bspec_c, bspec_c],
        out_specs=[bspec_x, bspec_x],
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * n * n * tq * Pdim * (Q // tq),
            bytes_accessed=2 * 2 * Pdim * n * Q * 4,
            transcendentals=0,
        ),
    )
    return fn(xr, xi, jnp.asarray(cr), jnp.asarray(ci))


def _pick_tq(n: int, q: int) -> int:
    """Largest lane-tile (multiple of 128, divides q) keeping blocks in VMEM."""
    budget = 4 * 1024 * 1024  # bytes for the two x blocks + two out blocks
    max_tq = max(128, budget // (4 * n * 4))
    tq = 128
    while tq * 2 <= max_tq and q % (tq * 2) == 0:
        tq *= 2
    return tq if q % tq == 0 else q  # fall back to whole row

def fft_axis(x: jnp.ndarray, axis: int, inverse: bool = False) -> jnp.ndarray:
    """c2c DFT along ``axis`` of a complex64 array, one HBM pass (Pallas/MXU).

    Forward is unscaled; inverse scales by 1/n (numpy conventions).
    """
    axis = axis % x.ndim
    n = x.shape[axis]
    pre = int(np.prod(x.shape[:axis], dtype=np.int64)) if axis else 1
    post = int(np.prod(x.shape[axis + 1:], dtype=np.int64)) if axis < x.ndim - 1 else 1
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)
    sign = +1 if inverse else -1

    scale = (1.0 / n) if inverse else 1.0
    if post == 1:
        # last axis: contract from the right instead — view (1, pre, n) and
        # transpose the roles: out[r, k] = Σ_j x[r, j] W[j, k]
        xr3 = xr.reshape(1, pre, n)
        xi3 = xi.reshape(1, pre, n)
        yr, yi = _fft_last_pallas(xr3, xi3, n, sign, scale)
        out = lax.complex(yr, yi).reshape(x.shape)
    else:
        xr3 = xr.reshape(pre, n, post)
        xi3 = xi.reshape(pre, n, post)
        tq = _pick_tq(n, post)
        yr, yi = _fft_axis_pallas(xr3, xi3, n, sign, tq, scale)
        out = lax.complex(yr, yi).reshape(x.shape)
    return out


def _cfft_last_kernel(xr_ref, xi_ref, cr_ref, ci_ref, or_ref, oi_ref):
    # x: (1, TR, n); c: (n, n). out[r, k] = Σ_j x[r, j] W[j, k]
    xr = xr_ref[0]
    xi = xi_ref[0]
    cr = cr_ref[...]
    ci = ci_ref[...]
    t1 = jnp.dot(xr, cr, preferred_element_type=jnp.float32, precision=_PREC)
    t2 = jnp.dot(xi, ci, preferred_element_type=jnp.float32, precision=_PREC)
    t3 = jnp.dot(xr + xi, cr + ci, preferred_element_type=jnp.float32,
                 precision=_PREC)
    or_ref[0] = t1 - t2
    oi_ref[0] = t3 - t1 - t2


def _fft_last_pallas(xr, xi, n: int, sign: int, scale: float = 1.0):
    _, R, _ = xr.shape
    cr, ci = _dft_cs(n, sign)
    if scale != 1.0:
        cr = (cr.astype(np.float64) * scale).astype(np.float32)
        ci = (ci.astype(np.float64) * scale).astype(np.float32)
    tr = 256 if R % 256 == 0 else (128 if R % 128 == 0 else R)
    grid = (R // tr,)
    bspec_x = pl.BlockSpec((1, tr, n), lambda r: (0, r, 0), memory_space=pltpu.VMEM)
    bspec_c = pl.BlockSpec((n, n), lambda r: (0, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        _cfft_last_kernel,
        grid=grid,
        in_specs=[bspec_x, bspec_x, bspec_c, bspec_c],
        out_specs=[bspec_x, bspec_x],
        out_shape=[jax.ShapeDtypeStruct(xr.shape, jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * n * n * R, bytes_accessed=4 * R * n * 4,
            transcendentals=0),
    )
    return fn(xr, xi, jnp.asarray(cr), jnp.asarray(ci))


# ---------------------------------------------------------------------------
# r2c / c2r along the last axis
# ---------------------------------------------------------------------------

def _rfft_kernel(x_ref, cr_ref, ci_ref, or_ref, oi_ref):
    # x: (1, TR, n); c: (n, nf_pad). out[r, k] = Σ_j x[r, j] exp(-2πi jk/n)
    x = x_ref[0]
    or_ref[0] = jnp.dot(x, cr_ref[...], preferred_element_type=jnp.float32,
                        precision=_PREC)
    oi_ref[0] = jnp.dot(x, ci_ref[...], preferred_element_type=jnp.float32,
                        precision=_PREC)


def rfft_last(x: jnp.ndarray) -> jnp.ndarray:
    """r2c DFT along the last axis (numpy rfft), one HBM pass on the MXU."""
    n = x.shape[-1]
    nf = n // 2 + 1
    nfp = _round_up(nf, 128)
    R = int(np.prod(x.shape[:-1], dtype=np.int64))
    xr = x.astype(jnp.float32).reshape(1, R, n)
    cr, ci = _rdft_cs(n, nfp, -1)  # rectangular, zero cols beyond nf
    cr = cr.copy()
    ci = ci.copy()
    cr[:, nf:] = 0
    ci[:, nf:] = 0
    tr = 256 if R % 256 == 0 else (128 if R % 128 == 0 else R)
    grid = (R // tr,)
    fn = pl.pallas_call(
        _rfft_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tr, n), lambda r: (0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, nfp), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, nfp), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tr, nfp), lambda r: (0, r, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, R, nfp), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * nfp * R, bytes_accessed=(R * n + 2 * R * nfp) * 4,
            transcendentals=0),
    )
    yr, yi = fn(xr, jnp.asarray(cr), jnp.asarray(ci))
    out = lax.complex(yr, yi).reshape(x.shape[:-1] + (nfp,))
    return out[..., :nf]


def _irfft_kernel(xr_ref, xi_ref, cr_ref, ci_ref, o_ref):
    # out[r, j] = Σ_k wk·Re(X[r,k] exp(+2πi jk/n)) — weights folded into c.
    xr = xr_ref[0]
    xi = xi_ref[0]
    o_ref[0] = (jnp.dot(xr, cr_ref[...], preferred_element_type=jnp.float32,
                        precision=_PREC)
                - jnp.dot(xi, ci_ref[...], preferred_element_type=jnp.float32,
                          precision=_PREC))


def irfft_last(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """c2r inverse DFT along the last axis (numpy irfft), one HBM pass."""
    nf = x.shape[-1]
    assert nf == n // 2 + 1, (nf, n)
    nfp = _round_up(nf, 128)
    R = int(np.prod(x.shape[:-1], dtype=np.int64))
    pad = [(0, 0)] * (x.ndim - 1) + [(0, nfp - nf)]
    xp = jnp.pad(x, pad)
    xr = jnp.real(xp).astype(jnp.float32).reshape(1, R, nfp)
    xi = jnp.imag(xp).astype(jnp.float32).reshape(1, R, nfp)
    # irfft(x)[j] = (1/n) [ X0 + 2 Σ_{0<k<n/2} Re(Xk e^{+2πijk/n}) + X_{n/2}(−1)^j ]
    # fold the 1/n and the per-k weights into (nfp × n) matrices:
    ck, sk = _rdft_cs(n, nfp, +1)  # (n, nfp) with angle +2πjk/n
    w = np.zeros((nfp,), np.float32)
    w[0] = 1.0
    w[1:nf - 1] = 2.0
    w[nf - 1] = 1.0
    cr = (ck * w[None, :] / n).astype(np.float32).T.copy()   # (nfp, n)
    ci = (sk * w[None, :] / n).astype(np.float32).T.copy()
    tr = 256 if R % 256 == 0 else (128 if R % 128 == 0 else R)
    grid = (R // tr,)
    fn = pl.pallas_call(
        _irfft_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tr, nfp), lambda r: (0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, nfp), lambda r: (0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nfp, n), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nfp, n), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, n), lambda r: (0, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * nfp * R, bytes_accessed=(R * n + 2 * R * nfp) * 4,
            transcendentals=0),
    )
    y = fn(xr, xi, jnp.asarray(cr), jnp.asarray(ci))
    return y.reshape(x.shape[:-1] + (n,))
