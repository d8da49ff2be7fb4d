"""Spectral diagnostics for DNS runs: shell-binned energy spectra, dissipation.

The spectralDNS consumer pattern: E(k) shell sums over the r2c spectrum with
Hermitian weights (interior k2 modes count twice), computed on device and
sharding-transparently (segment_sum over shell indices).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _packed_k2(FFT, k2):
    """The packed pair's per-lane k2 values: the natural 0..h−1 vector
    permuted when the FFT's packed interface rides the DIF z-stage
    (FFT.packed_z_perm).  The lane-0 weight rule is order-invariant
    (perm[0] == 0 — the rider lane stays first)."""
    perm = getattr(FFT, "packed_z_perm", None)
    return k2 if perm is None else k2[perm]


def _hermitian_weights(FFT):
    """Weights over the last spectral axis.

    r2c (halved) layout: 1 for k=0 and Nyquist, 2 interior, 0 for alignment
    padding.  c2c (full last axis, e.g. slab.C2C): every mode is stored
    explicitly, so unit weights — the r2c doubling there would double-count
    everything and zero the upper half.
    """
    nfp = FFT.global_complex_shape()[-1]
    n_last = int(FFT.N[-1])
    # c2c transforms (slab.C2C) have no Nf attribute — full last axis, unit
    # weights.  (Storage width nfp is NOT a valid discriminator: pencil/line
    # alignment padding can make Nfp == N while the layout is still r2c.)
    nf = getattr(FFT, "Nf", None)
    if nf is None:
        return jnp.ones((nfp,), jnp.float32)
    k = np.arange(nfp)
    w = np.where((k == 0) | (k == n_last // 2), 1.0, 2.0)
    w[k >= nf] = 0.0
    return jnp.asarray(w, jnp.float32)


def energy_spectrum(FFT, U_hat) -> np.ndarray:
    """Shell-binned kinetic-energy spectrum E(k), k = 0..kmax.

    ``U_hat``: (ncomp,) + global_complex_shape() spectral velocity.
    Returns a host numpy array; Σ E(k) = mean KE (Parseval-consistent).
    """
    K = FFT.get_local_wavenumbermesh()          # integer wavenumbers, sharded
    kmax = int(np.max(FFT.N) // 2)
    w = _hermitian_weights(FFT)
    ntot = float(np.prod([int(n) for n in FFT.N]))

    def spec(U_hat, K):
        kmag = jnp.sqrt(jnp.sum(K * K, axis=0))
        shell = jnp.clip(jnp.round(kmag).astype(jnp.int32), 0, kmax)
        e = 0.5 * jnp.sum(jnp.abs(U_hat) ** 2, axis=0) * w / (ntot * ntot)
        return jax.ops.segment_sum(e.ravel(), shell.ravel(), num_segments=kmax + 1)

    return np.asarray(jax.jit(spec)(U_hat, K))


def energy_spectrum_packed(FFT, pair) -> np.ndarray:
    """E(k) directly on the packed (Sr, Si) float-pair state — no complex
    unpack (which transiently costs a full complex stack: ~1.6 GB at 512³,
    a real HBM spike mid-run).  The pair must be purified (2/3-rule solver
    states always are): column k2=0 weight 1, interior 2, no Nyquist column.
    Shell ids come from broadcast 1-D integer wavenumbers — nothing is
    materialised outside the jit."""
    sr, si = pair
    N = [int(n) for n in FFT.N]
    h = N[2] // 2
    kmax = int(max(N) // 2)
    ntot = float(np.prod(N))
    k0 = jnp.asarray(np.fft.fftfreq(N[0], 1.0 / N[0]).astype(np.float32))
    k1 = jnp.asarray(np.fft.fftfreq(N[1], 1.0 / N[1]).astype(np.float32))
    k2 = jnp.asarray(_packed_k2(FFT, np.arange(h, dtype=np.float32)))
    w = jnp.asarray(np.where(np.arange(h) == 0, 1.0, 2.0).astype(np.float32))

    def spec(sr, si, k0, k1, k2, w):
        ksq = (k0[:, None, None] ** 2 + k1[None, :, None] ** 2
               + k2[None, None, :] ** 2)
        shell = jnp.clip(jnp.round(jnp.sqrt(ksq)).astype(jnp.int32), 0, kmax)
        e = 0.5 * jnp.sum(sr * sr + si * si, axis=0) * w / (ntot * ntot)
        return jax.ops.segment_sum(e.ravel(), shell.ravel(),
                                   num_segments=kmax + 1)

    return np.asarray(jax.jit(spec)(sr, si, k0, k1, k2, w))


def dissipation(FFT, U_hat, nu: float) -> float:
    """ε = 2ν Σ k² E(k) (physical wavenumbers)."""
    K = FFT.get_scaled_local_wavenumbermesh()
    w = _hermitian_weights(FFT)
    ntot = float(np.prod([int(n) for n in FFT.N]))

    def eps(U_hat, K):
        k2 = jnp.sum(K * K, axis=0)
        e = jnp.sum(jnp.abs(U_hat) ** 2, axis=0) * w / (ntot * ntot)
        return nu * jnp.sum(k2 * e)

    return float(jax.jit(eps)(U_hat, K))


def dissipation_packed(FFT, pair, nu: float) -> float:
    """ε on the packed (Sr, Si) pair — scaled wavenumbers, factored 1-D
    (no K-mesh or complex materialisation; see energy_spectrum_packed)."""
    sr, si = pair
    N = [int(n) for n in FFT.N]
    h = N[2] // 2
    ntot = float(np.prod(N))
    s = 2 * np.pi / np.asarray(FFT.L)
    k0 = jnp.asarray((np.fft.fftfreq(N[0], 1.0 / N[0]) * s[0]).astype(np.float32))
    k1 = jnp.asarray((np.fft.fftfreq(N[1], 1.0 / N[1]) * s[1]).astype(np.float32))
    k2 = jnp.asarray(_packed_k2(FFT, (np.arange(h) * s[2]).astype(np.float32)))
    w = jnp.asarray(np.where(np.arange(h) == 0, 1.0, 2.0).astype(np.float32))

    def eps(sr, si, k0, k1, k2, w):
        ksq = (k0[:, None, None] ** 2 + k1[None, :, None] ** 2
               + k2[None, None, :] ** 2)
        e = jnp.sum(sr * sr + si * si, axis=0) * w / (ntot * ntot)
        return nu * jnp.sum(ksq * e)

    return float(jax.jit(eps)(sr, si, k0, k1, k2, w))
