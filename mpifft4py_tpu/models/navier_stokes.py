"""Pseudo-spectral incompressible 3D Navier–Stokes DNS — the flagship consumer.

This is the spectralDNS usage pattern the reference library was built to serve
(SURVEY.md §3.5): an RK4 timestep doing 3 inverse + 3 forward *dealiased*
distributed transforms per right-hand-side evaluation (~24+ 3D transforms per
timestep).  The reference keeps transforms and elementwise spectral algebra in
separate Python calls; here the whole RK4 substep is ONE jitted SPMD program —
XLA fuses the elementwise curl/cross/projection work into the transform
pipeline around the all-to-alls, something the FFTW+MPI stack could never do.

Formulation (rotational form, velocity in spectral space):

    dU_hat/dt = P[ F̂(U × ω) ] − ν k² U_hat,
    P(F̂)     = F̂ − K (K·F̂)/|K|²          (Leray projection)
    ω          = curl(u) = ifftn(i K × U_hat)

Works with any of the transform classes (slab/pencil) via their
``forward_fn``/``backward_fn`` composable pipelines.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


class NavierStokes3D:
    """RK4 pseudo-spectral solver over a slab or pencil transform object.

    Args:
      FFT: a ``slab.R2C`` or ``pencil.R2C`` instance (the decomposition).
      nu: kinematic viscosity.
      dt: timestep.
      dealias: None | "2/3-rule" | "3/2-rule" — applied to the nonlinear term's
        forward transforms (reference DNS loop convention).
    """

    def __init__(self, FFT, nu: float, dt: float, dealias: Optional[str] = "2/3-rule",
                 spectral_layout: str = "complex"):
        self.FFT = FFT
        self.nu = float(nu)
        self.dt = float(dt)
        self.dealias = dealias
        if spectral_layout not in ("complex", "packed"):
            raise ValueError(f"spectral_layout must be 'complex' or 'packed', "
                             f"got {spectral_layout!r}")
        if spectral_layout == "packed":
            self._validate_packed()
        self.spectral_layout = spectral_layout
        # Wavenumber machinery, sharded like spectral space; built on device.
        K = FFT.get_scaled_local_wavenumbermesh()
        K2 = jnp.sum(K * K, axis=0)
        self.K = K
        self.K2 = K2
        self.K_over_K2 = K / jnp.where(K2 == 0, 1, K2)
        self._fwd = FFT.forward_fn(dealias=dealias)
        self._fwd_plain = FFT.forward_fn()
        self._bwd = FFT.backward_fn()
        # 3/2-rule: the nonlinear term is evaluated on the padsize×-refined grid
        # (padded inverse → physical product → padded/truncating forward);
        # 2/3-rule works on the N grid with the spectral mask in the forward.
        self._bwd_nl = FFT.backward_fn(dealias) if dealias == "3/2-rule" else self._bwd
        self._step = None

    # -- packed spectral layout (MXU fast path without complex boundaries) -----
    #
    # With 2/3-rule dealiasing every Nyquist plane is masked to zero, so the
    # packed-Hermitian rider (plane k2=0 carries X0 + i·X_Nyq) is identically
    # zero in the state: the packed planar pair (Ur, Ui) of shape
    # (3, N0, N1, N2/2) IS the spectrum on k2 = 0..h−1, and the whole RK4 step
    # runs on float32 pairs — no pack/unpack/complex materialisation around
    # any of the 36 transforms per step.  Measured 256³: 85 ms/step vs 112 ms
    # through the complex boundary (see BENCH.md).

    def _validate_packed(self):
        import jax as _jax
        import os
        from ..ops import pallas_fft3d as p3
        FFT = self.FFT
        N = [int(n) for n in FFT.N]
        ok = (getattr(FFT, "P", 0) == 1 and FFT.policy.path == "native"
              and FFT.float == np.float32 and (N[2] // 2) % 128 == 0
              and p3.supported_r2c(N[2]) and p3.supported_c2c(N[0])
              and p3.supported_c2c(N[1]) and self.dealias == "2/3-rule")
        if not ok:
            raise ValueError(
                "spectral_layout='packed' needs a single-device slab R2C, "
                "fp32, (N2/2) % 128 == 0, and dealias='2/3-rule'")
        if not (_jax.default_backend() == "tpu"
                or os.environ.get("MPIFFT4PY_TPU_PALLAS_DIST") == "force"):
            raise ValueError("spectral_layout='packed' runs the Pallas kernel "
                             "tier — TPU backend required")

    def _packed_arrays(self):
        """(K, K2, K_over_K2, mask) restricted to the packed k2 = 0..h−1."""
        h = int(self.FFT.N[2]) // 2
        K = self.K[..., :h]
        K2 = self.K2[..., :h]
        KK = self.K_over_K2[..., :h]
        mask = jnp.asarray(np.asarray(self.FFT.get_dealias_filter())[..., :h])
        return K, K2, KK, mask

    def to_packed(self, U_hat):
        """complex state (3,)+global_complex_shape() -> packed (Ur, Ui) pair.
        The state must be Nyquist-free (guaranteed under 2/3-rule)."""
        from ..ops import pallas_fft3d as p3
        return p3.pack_spectrum(U_hat)

    def from_packed(self, U):
        from ..ops import pallas_fft3d as p3
        return p3.unpack_spectrum(U[0], U[1])

    def rhs_packed(self, Ur, Ui, K, K2, KK, mask):
        from ..ops import pallas_fft3d as p3
        s = self.FFT.global_real_shape()

        def kx(V):
            return jnp.stack([K[1] * V[2] - K[2] * V[1],
                              K[2] * V[0] - K[0] * V[2],
                              K[0] * V[1] - K[1] * V[0]])

        # ω̂ = i K × Û  →  (re, im) = (−K×Ui, K×Ur)
        U = p3.irfft3d_packed(Ur, Ui, s)         # (3, N0, N1, N2), batched
        W = p3.irfft3d_packed(-kx(Ui), kx(Ur), s)
        F = jnp.stack([U[1] * W[2] - U[2] * W[1],
                       U[2] * W[0] - U[0] * W[2],
                       U[0] * W[1] - U[1] * W[0]])
        Fr, Fi = p3.rfft3d_packed(F)
        Fr, Fi = p3.purify_plane0(Fr, Fi)        # drop the Nyquist rider
        Fr = jnp.where(mask, Fr, 0)
        Fi = jnp.where(mask, Fi, 0)
        divr = jnp.sum(K * Fr, axis=0)
        divi = jnp.sum(K * Fi, axis=0)
        Fr = Fr - KK * divr[None]
        Fi = Fi - KK * divi[None]
        return Fr - self.nu * K2[None] * Ur, Fi - self.nu * K2[None] * Ui

    def step_fn_packed(self):
        """Jittable RK4 step on the packed pair: ((Ur, Ui), K, K2, KK, mask)."""
        dt = self.dt
        rhs = self.rhs_packed

        def step(U, K, K2, KK, mask):
            def add(a, k, c):
                return (a[0] + c * k[0], a[1] + c * k[1])
            k1 = rhs(U[0], U[1], K, K2, KK, mask)
            k2 = rhs(*add(U, k1, 0.5 * dt), K, K2, KK, mask)
            k3 = rhs(*add(U, k2, 0.5 * dt), K, K2, KK, mask)
            k4 = rhs(*add(U, k3, dt), K, K2, KK, mask)
            c = dt / 6.0
            return (U[0] + c * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0]),
                    U[1] + c * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1]))
        return step

    def energy_packed(self, U) -> float:
        h = int(self.FFT.N[2]) // 2
        w = np.full((h,), 2.0, np.float32)
        w[0] = 1.0
        ntot = float(np.prod([int(n) for n in self.FFT.N]))

        def ke(Ur, Ui):
            e = jnp.sum((Ur * Ur + Ui * Ui) * jnp.asarray(w), axis=None)
            return 0.5 * e / (ntot * ntot)
        return float(jax.jit(ke)(U[0], U[1]))

    # -- initial conditions ---------------------------------------------------

    def taylor_green(self):
        """Taylor–Green vortex initial condition in spectral space:
        (3,) + global_complex_shape(), or the packed (Ur, Ui) pair under
        spectral_layout='packed'."""
        X = self.FFT.get_local_mesh()
        def init(X):
            u = jnp.stack([
                jnp.sin(X[0]) * jnp.cos(X[1]) * jnp.cos(X[2]),
                -jnp.cos(X[0]) * jnp.sin(X[1]) * jnp.cos(X[2]),
                jnp.zeros_like(X[0]),
            ])
            fu = jnp.stack([self._fwd_plain(u[i]) for i in range(3)])
            if self.spectral_layout == "packed":
                return self.to_packed(fu)
            return fu
        return jax.jit(init)(X)

    # -- dynamics ----------------------------------------------------------------

    def rhs(self, U_hat, K, K2, K_over_K2):
        """dU_hat/dt.  Pure function of the sharded state; jit/scan-safe.

        Per-component transform calls measured FASTER than batched stacks on
        one chip (TPU executes kernels serially; batching only adds stack /
        concat materialisations — 120 vs 113 ms/step at 256³).  On a pod the
        batched ``*_fields_fn`` API wins instead (one collective per stack);
        switch here if multi-chip DNS becomes the bottleneck.
        """
        bwd, fwd = self._bwd_nl, self._fwd
        U = jnp.stack([bwd(U_hat[i]) for i in range(3)])
        # vorticity: ω = ifftn(i K × U_hat)
        cu0 = 1j * (K[1] * U_hat[2] - K[2] * U_hat[1])
        cu1 = 1j * (K[2] * U_hat[0] - K[0] * U_hat[2])
        cu2 = 1j * (K[0] * U_hat[1] - K[1] * U_hat[0])
        W = jnp.stack([bwd(cu0), bwd(cu1), bwd(cu2)])
        # nonlinear term F = U × ω, transformed with dealiasing
        F0 = U[1] * W[2] - U[2] * W[1]
        F1 = U[2] * W[0] - U[0] * W[2]
        F2 = U[0] * W[1] - U[1] * W[0]
        F_hat = jnp.stack([fwd(F0), fwd(F1), fwd(F2)])
        # Leray projection + viscous term
        div = jnp.sum(F_hat * K, axis=0)
        F_hat = F_hat - K_over_K2 * div[None]
        return F_hat - self.nu * K2[None] * U_hat

    def step_fn(self):
        """The jittable RK4 step: (U_hat, K, K2, K_over_K2) -> U_hat.

        The wavenumber arrays are explicit ARGUMENTS, not closures: closing
        over device-resident arrays makes jit inline them as constants, which
        requires a device->host fetch during lowering — a failure mode on
        backends with restricted transfers (axon relay) and a waste of HBM
        (constants get re-uploaded per executable) everywhere else.
        """
        dt = self.dt
        rhs = self.rhs

        def step(U_hat, K, K2, KK):
            k1 = rhs(U_hat, K, K2, KK)
            k2 = rhs(U_hat + 0.5 * dt * k1, K, K2, KK)
            k3 = rhs(U_hat + 0.5 * dt * k2, K, K2, KK)
            k4 = rhs(U_hat + dt * k3, K, K2, KK)
            return U_hat + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

        return step

    def _step_args(self):
        if self.spectral_layout == "packed":
            if not hasattr(self, "_pk_args"):
                self._pk_args = self._packed_arrays()
            return self._pk_args
        return (self.K, self.K2, self.K_over_K2)

    def _step_builder(self):
        return (self.step_fn_packed() if self.spectral_layout == "packed"
                else self.step_fn())

    def step(self, U_hat):
        if self._step is None:
            self._step = jax.jit(self._step_builder())
        return self._step(U_hat, *self._step_args())

    def run(self, U_hat, n_steps: int):
        """n_steps of RK4 under lax.scan (single compiled program)."""
        step = self._step_builder()

        def fn(u0, *args):
            body = lambda c, _: (step(c, *args), None)
            return jax.lax.scan(body, u0, None, length=n_steps)[0]

        return jax.jit(fn)(U_hat, *self._step_args())

    # -- diagnostics --------------------------------------------------------------

    def energy(self, U_hat) -> float:
        """Mean kinetic energy 0.5 <|u|²> (physical space, or Parseval sum
        for the packed layout)."""
        if self.spectral_layout == "packed":
            return self.energy_packed(U_hat)
        def ke(U_hat):
            U = jnp.stack([self._bwd(U_hat[i]) for i in range(3)])
            return 0.5 * jnp.mean(jnp.sum(U * U, axis=0))
        return float(jax.jit(ke)(U_hat))

    def rhs_with_state(self, U_hat):
        """Convenience: rhs using the stored wavenumber arrays (eager use)."""
        return self.rhs(U_hat, self.K, self.K2, self.K_over_K2)
