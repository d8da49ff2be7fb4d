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

from .navier_stokes import NavierStokes3D, SpectralSolver


class VorticityVelocity3D(SpectralSolver):
    """Vorticity-form pseudo-spectral solver over a slab/pencil R2C."""

    def __init__(self, FFT, nu: float, dt: float, dealias: Optional[str] = "2/3-rule",
                 integrator: str = "RK4", spectral_layout: str = "complex"):
        self.nu = float(nu)
        self._init_solver(FFT, dt, dealias, integrator, spectral_layout)

    # -- state construction -------------------------------------------------------

    def from_velocity(self, U_hat):
        """Spectral vorticity ω̂ = i k × û from a (3,)+spectral velocity."""
        def build():
            def f(U_hat, k0, k1, k2):
                K0 = k0[:, None, None]
                K1 = k1[None, :, None]
                K2v = k2[None, None, :]
                return jnp.stack([1j * (K1 * U_hat[2] - K2v * U_hat[1]),
                                  1j * (K2v * U_hat[0] - K0 * U_hat[2]),
                                  1j * (K0 * U_hat[1] - K1 * U_hat[0])])
            return f
        return self._plan("from_velocity", build)(U_hat,
                                                  *self._complex_k_args())

    def velocity(self, W_hat):
        """Biot–Savart: û = i (k × ω̂)/|k|² (spectral)."""
        def build():
            def f(W_hat, k0, k1, k2):
                K0 = k0[:, None, None]
                K1 = k1[None, :, None]
                K2v = k2[None, None, :]
                ksq = K0 * K0 + K1 * K1 + K2v * K2v
                inv = 1.0 / jnp.where(ksq == 0, 1, ksq)
                return jnp.stack([1j * (K1 * W_hat[2] - K2v * W_hat[1]) * inv,
                                  1j * (K2v * W_hat[0] - K0 * W_hat[2]) * inv,
                                  1j * (K0 * W_hat[1] - K1 * W_hat[0]) * inv])
            return f
        return self._plan("velocity", build)(W_hat, *self._complex_k_args())

    def taylor_green(self):
        ns = NavierStokes3D(self.FFT, nu=self.nu, dt=self.dt,
                            dealias=self.dealias,
                            spectral_layout=self.spectral_layout)
        if self.spectral_layout != "packed":
            return self.from_velocity(ns.taylor_green())
        # Packed end to end: the complex route materialises û (one jit
        # output) and ω̂ (a second) — two full complex 3-stacks, 20.2 GB at
        # 768³ (measured OOM, round 4).  Here ω̂ = i k × û is float-pair
        # algebra on the packed pair, one component at a time, with the
        # velocity pair donated so the output can reuse its buffers.
        Ur, Ui = ns.taylor_green()
        k0, k1, k2 = self._packed_arrays()[:3]

        def f(Ur, Ui, k0, k1, k2):
            from jax import lax
            outs = []
            g = (Ur, Ui, k0, k1, k2)
            for c in range(3):
                Ur, Ui, k0, k1, k2 = g
                K = (k0[:, None, None], k1[None, :, None], k2[None, None, :])
                j, k = (c + 1) % 3, (c + 2) % 3
                wr = -(K[j] * Ui[k] - K[k] * Ui[j])
                wi = K[j] * Ur[k] - K[k] * Ur[j]
                wr, wi, *g = lax.optimization_barrier(
                    (wr, wi, Ur, Ui, k0, k1, k2))
                outs.append((wr, wi))
            R = jnp.stack([o[0] for o in outs])
            R, *ims = lax.optimization_barrier((R, *[o[1] for o in outs]))
            return R, jnp.stack(ims)
        # cached plan (ADVICE r4 item 1): a fresh jax.jit per call retraced
        # and recompiled on every invocation (20-60 s each via the relay)
        return self._plan("taylor_green_packed_curl", lambda: f,
                          donate_argnums=(0, 1))(Ur, Ui, k0, k1, k2)

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

    def _rhs_packed_lowmem(self, Wr, Wi, k0, k1, k2, m0, m1, m2):
        """VV RHS with the nonlinear term streamed one component at a time
        (`SpectralSolver._streamed_cross_fhat`; engages at 768-class where
        the U and ω physical 3-stacks cannot co-live in 16 GB), followed by
        a per-component curl + viscosity epilogue."""
        from jax import lax

        def ks_of(kv):                       # per-segment broadcast factors
            return (kv[0][:, None, None], kv[1][None, :, None],
                    kv[2][None, None, :])

        def biot_savart_part(Wr, Wi, kv, c, re: bool):
            # ONE plane of û_c = i(k×Ŵ)_c/k²; ksq/inv are rebuilt per call
            # from the barrier-threaded vectors so the whole expression is
            # a single fusion — a SHARED inv (two consumers) materialises a
            # resident 864 MB buffer at 768³ (measured in the AOT dump,
            # the +0.85 GiB VV carried over NS's ledger)
            Ks = ks_of(kv)
            ksq = Ks[0] * Ks[0] + Ks[1] * Ks[1] + Ks[2] * Ks[2]
            inv = 1.0 / jnp.where(ksq == 0, 1, ksq)
            j, k = (c + 1) % 3, (c + 2) % 3
            if re:
                return -(Ks[j] * Wi[k] - Ks[k] * Wi[j]) * inv
            return (Ks[j] * Wr[k] - Ks[k] * Wr[j]) * inv

        def u_comp(Wr, Wi, kv, c):           # physical U_c = ifft(i(k×Ŵ)_c/k²)
            ur = biot_savart_part(Wr, Wi, kv, c, re=True)
            ur, Wr, Wi, *kv = lax.optimization_barrier((ur, Wr, Wi, *kv))
            ui = biot_savart_part(Wr, Wi, kv, c, re=False)
            return self._bwd_pk((ur, ui))

        def w_comp(Wr, Wi, kv, c):           # physical ω_c
            return self._bwd_pk((Wr[c], Wi[c]))

        Fr, Fi, (Wr, Wi, *kv) = self._streamed_cross_fhat(
            u_comp, w_comp, Wr, Wi, aux=(k0, k1, k2))
        # dω̂_i = (i k × F̂)_i − ν k² ω̂_i, one output component at a time
        # (i k× in (re, im) parts with (j, k) = (i+1, i+2):
        # re_i = −(K_j Fi_k − K_k Fi_j), im_i = K_j Fr_k − K_k Fr_j).
        # ksq is rebuilt per segment from the barrier-threaded vectors.
        outr, outi = [], []
        g = tuple(kv)
        for i in range(3):
            kv = g
            Ks = ks_of(kv)
            ksq = Ks[0] * Ks[0] + Ks[1] * Ks[1] + Ks[2] * Ks[2]
            j, k = (i + 1) % 3, (i + 2) % 3
            oc_r = -(Ks[j] * Fi[k] - Ks[k] * Fi[j]) - self.nu * ksq * Wr[i]
            oc_i = (Ks[j] * Fr[k] - Ks[k] * Fr[j]) - self.nu * ksq * Wi[i]
            oc_r, oc_i, *g = lax.optimization_barrier((oc_r, oc_i, *kv))
            outr.append(oc_r)
            outi.append(oc_i)
        R = jnp.stack(outr)
        R, *outi = lax.optimization_barrier((R, *outi))
        return R, jnp.stack(outi)

    def rhs_packed(self, Wr, Wi, k0, k1, k2, m0, m1, m2):
        """Packed-pair vorticity-form RHS: Biot–Savart recovery and the curl
        of the nonlinear term as pure float-pair algebra."""
        if self._nl_stream_on():
            return self._rhs_packed_lowmem(Wr, Wi, k0, k1, k2, m0, m1, m2)
        # û = i(k×ω̂)/k² — rides the fused Biot–Savart curl kernel serially
        W, U = self._bwd_state_curl_pk(Wr, Wi, k0, k1, k2,
                                       biot_savart=True)
        if self._nl_any_fused:
            # dω̂ = mask·(iK×fft(U×W)) − νk²ω̂ in two fused kernels
            return self._nl_fwd_epilogue_pk(
                U, W, Wr, Wi, (k0, k1, k2, m0, m1, m2), "curl", self.nu)
        K0 = k0[:, None, None]
        K1 = k1[None, :, None]
        K2v = k2[None, None, :]
        ksq = K0 * K0 + K1 * K1 + K2v * K2v

        def kx(V):
            return jnp.stack([K1 * V[2] - K2v * V[1],
                              K2v * V[0] - K0 * V[2],
                              K0 * V[1] - K1 * V[0]])

        F = jnp.stack([U[1] * W[2] - U[2] * W[1],
                       U[2] * W[0] - U[0] * W[2],
                       U[0] * W[1] - U[1] * W[0]])
        Fr, Fi = self._fwd_pk(F)                 # purify + mask inside
        # dω̂ = i k × F̂ − ν k² ω̂ → (re, im) = (−K×Fi, K×Fr) − ν k² (Wr, Wi)
        return (-kx(Fi) - self.nu * ksq[None] * Wr,
                kx(Fr) - self.nu * ksq[None] * Wi)

    # -- streaming-fold RHS (round 5): per-component emission ------------------

    def _fold_slices(self):
        if self._nl_stream_on():
            return [slice(c, c + 1) for c in range(3)]
        return [slice(0, 3)]

    def rhs_packed_fold(self, Sr, Si, kargs, fold, carry):
        """VV RHS through the fold API.  Streamed regime: the viscous terms
        −νk²ω̂_c emit first (one scaled piece per slice), then each
        component's F̂ folds its two curl contributions into the OTHER two
        slices as pure adds the moment its forward completes — the curl
        (i k × F̂)_i mixes exactly the two other F̂ components, so no F̂
        stack is needed:  F̂_m contributes (−K_{m+2}·Fi_m, +K_{m+2}·Fr_m)
        to slice m+1 and (+K_{m+1}·Fi_m, −K_{m+1}·Fr_m) to slice m+2."""
        if not self._nl_stream_on():
            pr, pi = self.rhs_packed(Sr, Si, *kargs)
            return fold(slice(0, 3), pr, pi, carry)
        from jax import lax
        k0, k1, k2 = kargs[0], kargs[1], kargs[2]

        def ks_of(kv):
            return (kv[0][:, None, None], kv[1][None, :, None],
                    kv[2][None, None, :])

        def biot_savart_part(Wr, Wi, kv, c, re):
            Ks = ks_of(kv)
            ksq = Ks[0] * Ks[0] + Ks[1] * Ks[1] + Ks[2] * Ks[2]
            inv = 1.0 / jnp.where(ksq == 0, 1, ksq)
            j, k = (c + 1) % 3, (c + 2) % 3
            if re:
                return -(Ks[j] * Wi[k] - Ks[k] * Wi[j]) * inv
            return (Ks[j] * Wr[k] - Ks[k] * Wr[j]) * inv

        def u_comp(Wr, Wi, kv, c):
            ur = biot_savart_part(Wr, Wi, kv, c, True)
            ur, Wr, Wi, *kv = lax.optimization_barrier((ur, Wr, Wi, *kv))
            ui = biot_savart_part(Wr, Wi, kv, c, False)
            return self._bwd_pk((ur, ui))

        def w_comp(Wr, Wi, kv, c):
            return self._bwd_pk((Wr[c], Wi[c]))

        Wr, Wi = Sr, Si
        kv = (k0, k1, k2)
        for c in range(3):          # scaled viscous pieces, slice order
            Ks = ks_of(kv)
            ksq = Ks[0] * Ks[0] + Ks[1] * Ks[1] + Ks[2] * Ks[2]
            carry = fold(slice(c, c + 1), (-self.nu * ksq * Wr[c])[None],
                         (-self.nu * ksq * Wi[c])[None], carry)
            Wr, Wi, *rest = lax.optimization_barrier(
                (Wr, Wi) + tuple(kv) + tuple(carry))
            kv, carry = rest[:3], tuple(rest[3:])
        for m in range(3):          # streamed NL + immediate curl folds
            j, k = (m + 1) % 3, (m + 2) % 3
            t = u_comp(Wr, Wi, kv, j) * w_comp(Wr, Wi, kv, k)
            t, Wr, Wi, *kv = lax.optimization_barrier((t, Wr, Wi, *kv))
            t = t - u_comp(Wr, Wi, kv, k) * w_comp(Wr, Wi, kv, j)
            t, Wr, Wi, *kv = lax.optimization_barrier((t, Wr, Wi, *kv))
            fr, fi = self._fwd_pk(t)
            m1, m2 = (m + 1) % 3, (m + 2) % 3
            Ks = ks_of(kv)
            carry = fold(slice(m1, m1 + 1), (-Ks[m2] * fi)[None],
                         (Ks[m2] * fr)[None], carry, first=False)
            fr, fi, Wr, Wi, *rest = lax.optimization_barrier(
                (fr, fi, Wr, Wi) + tuple(kv) + tuple(carry))
            kv, carry = rest[:3], tuple(rest[3:])
            Ks = ks_of(kv)
            carry = fold(slice(m2, m2 + 1), (Ks[m1] * fi)[None],
                         (-Ks[m1] * fr)[None], carry, first=False)
            Wr, Wi, *rest = lax.optimization_barrier(
                (Wr, Wi) + tuple(kv) + tuple(carry))
            kv, carry = rest[:3], tuple(rest[3:])
        return carry

    # step_fn/_step_builder/ab2_state/step/run: inherited from SpectralSolver

    # -- diagnostics ---------------------------------------------------------------

    def energy(self, W_hat) -> float:
        """Mean kinetic energy of the Biot–Savart velocity."""
        if self.spectral_layout == "packed":
            def build():
                from jax import lax
                comp = self._parseval_component_energies()

                def part(Wr, Wi, kv, c, re):     # one plane of û_c=i(k×Ŵ)_c/k²
                    K = (kv[0][:, None, None], kv[1][None, :, None],
                         kv[2][None, None, :])
                    ksq = K[0] * K[0] + K[1] * K[1] + K[2] * K[2]
                    inv = 1.0 / jnp.where(ksq == 0, 1, ksq)
                    j, k = (c + 1) % 3, (c + 2) % 3
                    if re:
                        return -(K[j] * Wi[k] - K[k] * Wi[j]) * inv
                    return (K[j] * Wr[k] - K[k] * Wr[j]) * inv

                def ke(Wr, Wi, k0, k1, k2, *rest):
                    # one û component at a time: the stacked Biot–Savart
                    # spectra are a second full state pair (5.06 GiB at
                    # 768³) — the diagnostic OOM'd the chip while the
                    # streamed STEP fit (measured, round 4)
                    total = 0.0
                    g = (Wr, Wi, k0, k1, k2)
                    for c in range(3):
                        Wr, Wi, *kv = g
                        uvr = part(Wr, Wi, kv, c, True)
                        uvr, Wr, Wi, *kv = lax.optimization_barrier(
                            (uvr, Wr, Wi, *kv))
                        uvi = part(Wr, Wi, kv, c, False)
                        total = total + jnp.sum(comp(uvr, uvi))
                        total, *g = lax.optimization_barrier(
                            (total, Wr, Wi, *kv))
                    return total
                return ke
            return float(self._plan("energy_packed_vv", build)(
                W_hat[0], W_hat[1], *self._step_args()))

        def build():
            def ke(W_hat, k0, k1, k2):
                K0 = k0[:, None, None]
                K1 = k1[None, :, None]
                K2v = k2[None, None, :]
                ksq = K0 * K0 + K1 * K1 + K2v * K2v
                inv = 1.0 / jnp.where(ksq == 0, 1, ksq)
                U_hat = jnp.stack(
                    [1j * (K1 * W_hat[2] - K2v * W_hat[1]) * inv,
                     1j * (K2v * W_hat[0] - K0 * W_hat[2]) * inv,
                     1j * (K0 * W_hat[1] - K1 * W_hat[0]) * inv])
                U = jnp.stack([self._bwd(U_hat[i]) for i in range(3)])
                return 0.5 * SpectralSolver.staged_mean(jnp.sum(U * U, axis=0))
            return ke
        return float(self._plan("energy", build)(W_hat, *self._step_args()))

    def enstrophy(self, W_hat) -> float:
        if self.spectral_layout == "packed":
            return self.energy_packed(W_hat)  # Parseval of ω̂ itself

        def build():
            def en(W_hat):
                W = jnp.stack([self._bwd(W_hat[i]) for i in range(3)])
                return 0.5 * SpectralSolver.staged_mean(jnp.sum(W * W, axis=0))
            return en
        return float(self._plan("enstrophy", build)(W_hat))
