"""Velocity–vorticity formulation of 3D incompressible Navier–Stokes.

spectralDNS ships both a velocity-form ("NS") and a vorticity-form ("VV")
solver on the reference transforms; this is the VV analog.  The state is the
spectral vorticity ω̂; velocity is recovered by Biot–Savart each RHS:

    û = i (k × ω̂) / |k|²            (exact since k·û = 0)
    ∂ω̂/∂t = i k × F(u×ω) − ν k² ω̂   (curl of the rotational form —
                                       the pressure term vanishes)

In exact arithmetic the VV trajectory is the curl of the velocity-form
trajectory (curl ∘ Leray-projection = curl), which the tests exploit as a
mutual oracle.  9 distributed transforms per RHS, same as the velocity form.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .navier_stokes import NavierStokes3D, INTEGRATORS


class VorticityVelocity3D:
    """Vorticity-form pseudo-spectral solver over a slab/pencil R2C."""

    def __init__(self, FFT, nu: float, dt: float, dealias: Optional[str] = "2/3-rule",
                 integrator: str = "RK4"):
        self.FFT = FFT
        self.nu = float(nu)
        self.dt = float(dt)
        self.dealias = dealias
        if integrator not in INTEGRATORS:
            raise ValueError(f"integrator must be one of {INTEGRATORS}, "
                             f"got {integrator!r}")
        self.integrator = integrator
        self.spectral_layout = "complex"
        self._fwd = FFT.forward_fn(dealias=dealias)
        self._fwd_plain = FFT.forward_fn()
        self._bwd = FFT.backward_fn()
        self._bwd_nl = FFT.backward_fn(dealias) if dealias == "3/2-rule" else self._bwd
        self._step = None

    _factored_k = NavierStokes3D._factored_k
    _advance = NavierStokes3D._advance
    run = NavierStokes3D.run

    def _step_args(self):
        if not hasattr(self, "_k_args"):
            self._k_args = self._factored_k()
        return self._k_args

    # -- state construction -------------------------------------------------------

    def from_velocity(self, U_hat):
        """Spectral vorticity ω̂ = i k × û from a (3,)+spectral velocity."""
        k0, k1, k2 = self._step_args()

        def build(U_hat, k0, k1, k2):
            K0 = k0[:, None, None]
            K1 = k1[None, :, None]
            K2v = k2[None, None, :]
            return jnp.stack([1j * (K1 * U_hat[2] - K2v * U_hat[1]),
                              1j * (K2v * U_hat[0] - K0 * U_hat[2]),
                              1j * (K0 * U_hat[1] - K1 * U_hat[0])])
        return jax.jit(build)(U_hat, k0, k1, k2)

    def velocity(self, W_hat):
        """Biot–Savart: û = i (k × ω̂)/|k|² (spectral)."""
        k0, k1, k2 = self._step_args()

        def build(W_hat, k0, k1, k2):
            K0 = k0[:, None, None]
            K1 = k1[None, :, None]
            K2v = k2[None, None, :]
            ksq = K0 * K0 + K1 * K1 + K2v * K2v
            inv = 1.0 / jnp.where(ksq == 0, 1, ksq)
            return jnp.stack([1j * (K1 * W_hat[2] - K2v * W_hat[1]) * inv,
                              1j * (K2v * W_hat[0] - K0 * W_hat[2]) * inv,
                              1j * (K0 * W_hat[1] - K1 * W_hat[0]) * inv])
        return jax.jit(build)(W_hat, k0, k1, k2)

    def taylor_green(self):
        ns = NavierStokes3D(self.FFT, nu=self.nu, dt=self.dt, dealias=self.dealias)
        return self.from_velocity(ns.taylor_green())

    # -- dynamics ----------------------------------------------------------------

    def rhs(self, W_hat, k0, k1, k2):
        bwd, fwd = self._bwd_nl, self._fwd
        K0 = k0[:, None, None]
        K1 = k1[None, :, None]
        K2v = k2[None, None, :]
        ksq = K0 * K0 + K1 * K1 + K2v * K2v
        inv = 1.0 / jnp.where(ksq == 0, 1, ksq)
        # Biot–Savart velocity
        u0 = 1j * (K1 * W_hat[2] - K2v * W_hat[1]) * inv
        u1 = 1j * (K2v * W_hat[0] - K0 * W_hat[2]) * inv
        u2 = 1j * (K0 * W_hat[1] - K1 * W_hat[0]) * inv
        U = jnp.stack([bwd(u0), bwd(u1), bwd(u2)])
        W = jnp.stack([bwd(W_hat[i]) for i in range(3)])
        F0 = U[1] * W[2] - U[2] * W[1]
        F1 = U[2] * W[0] - U[0] * W[2]
        F2 = U[0] * W[1] - U[1] * W[0]
        F_hat = jnp.stack([fwd(F0), fwd(F1), fwd(F2)])
        # curl of the nonlinear term; pressure never appears
        return jnp.stack([1j * (K1 * F_hat[2] - K2v * F_hat[1]),
                          1j * (K2v * F_hat[0] - K0 * F_hat[2]),
                          1j * (K0 * F_hat[1] - K1 * F_hat[0])]) \
            - self.nu * ksq[None] * W_hat

    def step_fn(self):
        def step(W_hat, k0, k1, k2):
            return self._advance(lambda V: self.rhs(V, k0, k1, k2), W_hat)
        return step

    def _step_builder(self):
        return self.step_fn()

    def ab2_state(self, W_hat):
        if self.integrator != "AB2":
            raise ValueError("ab2_state is only meaningful with integrator='AB2'")
        f = jax.jit(self.rhs)(W_hat, *self._step_args())
        return (W_hat, f)

    def step(self, W_hat):
        if self._step is None:
            self._step = jax.jit(self.step_fn())
        return self._step(W_hat, *self._step_args())

    # -- diagnostics ---------------------------------------------------------------

    def energy(self, W_hat) -> float:
        """Mean kinetic energy of the Biot–Savart velocity."""
        def ke(W_hat):
            U_hat = self.velocity(W_hat)
            U = jnp.stack([self._bwd(U_hat[i]) for i in range(3)])
            return 0.5 * jnp.mean(jnp.sum(U * U, axis=0))
        return float(ke(W_hat))

    def enstrophy(self, W_hat) -> float:
        def en(W_hat):
            W = jnp.stack([self._bwd(W_hat[i]) for i in range(3)])
            return 0.5 * jnp.mean(jnp.sum(W * W, axis=0))
        return float(jax.jit(en)(W_hat))
