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

    def __init__(self, FFT, nu: float, dt: float, dealias: Optional[str] = "2/3-rule"):
        self.FFT = FFT
        self.nu = float(nu)
        self.dt = float(dt)
        self.dealias = dealias
        # Wavenumber machinery, sharded like spectral space; built on device.
        K = FFT.get_scaled_local_wavenumbermesh()
        K2 = jnp.sum(K * K, axis=0)
        self.K = K
        self.K2 = K2
        self.K_over_K2 = K / jnp.where(K2 == 0, 1, K2)
        self._fwd = FFT.forward_fn(dealias=dealias)
        self._fwd_plain = FFT.forward_fn()
        self._bwd = FFT.backward_fn()
        # Batched stacks: the RHS inverts 6 fields (velocity + vorticity) and
        # forwards 3 (nonlinear term) — each stack rides one batched kernel
        # chain on the serial MXU path (forward_fields_fn).
        self._fwd_fields = FFT.forward_fields_fn(dealias=dealias)
        # 3/2-rule: the nonlinear term is evaluated on the padsize×-refined grid
        # (padded inverse → physical product → padded/truncating forward);
        # 2/3-rule works on the N grid with the spectral mask in the forward.
        self._bwd_nl = FFT.backward_fn(dealias) if dealias == "3/2-rule" else self._bwd
        self._bwd_nl_fields = FFT.backward_fields_fn(
            dealias if dealias == "3/2-rule" else None)
        self._step = None

    # -- initial conditions ---------------------------------------------------

    def taylor_green(self) -> jax.Array:
        """Taylor–Green vortex initial condition, returned in spectral space
        with shape (3,) + global_complex_shape()."""
        X = self.FFT.get_local_mesh()
        def init(X):
            u = jnp.stack([
                jnp.sin(X[0]) * jnp.cos(X[1]) * jnp.cos(X[2]),
                -jnp.cos(X[0]) * jnp.sin(X[1]) * jnp.cos(X[2]),
                jnp.zeros_like(X[0]),
            ])
            return jnp.stack([self._fwd_plain(u[i]) for i in range(3)])
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

    def step(self, U_hat) -> jax.Array:
        if self._step is None:
            self._step = jax.jit(self.step_fn())
        return self._step(U_hat, self.K, self.K2, self.K_over_K2)

    def run(self, U_hat, n_steps: int) -> jax.Array:
        """n_steps of RK4 under lax.scan (single compiled program)."""
        step = self.step_fn()

        def fn(u0, K, K2, KK):
            body = lambda c, _: (step(c, K, K2, KK), None)
            return jax.lax.scan(body, u0, None, length=n_steps)[0]

        return jax.jit(fn)(U_hat, self.K, self.K2, self.K_over_K2)

    # -- diagnostics --------------------------------------------------------------

    def energy(self, U_hat) -> float:
        """Mean kinetic energy 0.5 <|u|²>, computed in physical space."""
        def ke(U_hat):
            U = jnp.stack([self._bwd(U_hat[i]) for i in range(3)])
            return 0.5 * jnp.mean(jnp.sum(U * U, axis=0))
        return float(jax.jit(ke)(U_hat))

    def rhs_with_state(self, U_hat):
        """Convenience: rhs using the stored wavenumber arrays (eager use)."""
        return self.rhs(U_hat, self.K, self.K2, self.K_over_K2)
