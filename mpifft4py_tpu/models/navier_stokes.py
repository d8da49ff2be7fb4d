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

# Carpenter & Kennedy (1994) five-stage fourth-order low-storage ("2N") RK.
# Memory: one state + one accumulator live across stages — at 512³ this is
# what lets a full DNS step fit in one chip's HBM where classical RK4's
# k1..k4 width cannot (see BENCH.md).
_LSRK54_A = (
    0.0,
    -567301805773.0 / 1357537059087.0,
    -2404267990393.0 / 2016746695238.0,
    -3550918686646.0 / 2091501179385.0,
    -1275806237668.0 / 842570457699.0,
)
_LSRK54_B = (
    1432997174477.0 / 9575080441755.0,
    5161836677717.0 / 13612068292357.0,
    1720146321549.0 / 2090206949498.0,
    3134564353537.0 / 4481467310338.0,
    2277821191437.0 / 14882151754819.0,
)

INTEGRATORS = ("RK4", "LSRK54", "Euler", "AB2")


class SpectralSolver:
    """Shared machinery for the spectral solver family (NS3D, VV, MHD,
    Boussinesq): integrator core, factored wavenumber state, cached jit
    plans, AB2 carry, and the scan-based ``run``.  Subclasses implement
    ``rhs(state, k0, k1, k2)`` and set physics parameters."""

    def _init_solver(self, FFT, dt, dealias, integrator,
                     spectral_layout: str = "complex"):
        self.FFT = FFT
        self.dt = float(dt)
        self.dealias = dealias
        if integrator not in INTEGRATORS:
            raise ValueError(f"integrator must be one of {INTEGRATORS}, "
                             f"got {integrator!r}")
        self.integrator = integrator
        if spectral_layout not in ("complex", "packed"):
            raise ValueError(f"spectral_layout must be 'complex' or 'packed', "
                             f"got {spectral_layout!r}")
        if spectral_layout == "packed":
            self._validate_packed()
        self.spectral_layout = spectral_layout
        self._fwd = FFT.forward_fn(dealias=dealias)
        self._fwd_plain = FFT.forward_fn()
        self._bwd = FFT.backward_fn()
        # 3/2-rule: the nonlinear term is evaluated on the padsize×-refined
        # grid; 2/3-rule works on the N grid with the mask in the forward.
        self._bwd_nl = (FFT.backward_fn(dealias) if dealias == "3/2-rule"
                        else self._bwd)
        if spectral_layout == "packed":
            self._init_packed()
        self._step = None
        self._solver_plans = {}

    def _plan(self, key, builder, **jit_kwargs):
        """Cached jit of ``builder()`` — diagnostics called per-step must not
        retrace (a remote compile through the relay is 20-60 s each).
        ``jit_kwargs`` (e.g. donate_argnums) are applied on first build."""
        fn = self._solver_plans.get(key)
        if fn is None:
            fn = self._solver_plans[key] = jax.jit(builder(), **jit_kwargs)
        return fn

    # -- wavenumber machinery -------------------------------------------------
    # The step path uses only the FACTORED 1-D vectors; the full (3,)+spectral
    # meshes below are built lazily for diagnostics (at 512³ they are ~2 GB
    # of HBM the solver itself never needs).

    @property
    def K(self):
        if not hasattr(self, "_K_full"):
            self._K_full = self.FFT.get_scaled_local_wavenumbermesh()
        return self._K_full

    @property
    def K2(self):
        if not hasattr(self, "_K2_full"):
            self._K2_full = jnp.sum(self.K * self.K, axis=0)
        return self._K2_full

    @property
    def K_over_K2(self):
        if not hasattr(self, "_KK_full"):
            K2 = self.K2
            self._KK_full = self.K / jnp.where(K2 == 0, 1, K2)
        return self._KK_full

    # -- packed spectral layout plumbing (shared by the solver family) ---------
    #
    # ``spectral_layout="packed"`` keeps the state as the packed-Hermitian
    # planar float32 pair (C, N0, N1, N2/2) ×2 — the MXU fast path without
    # complex boundaries.  Subclasses implement ``rhs_packed(Ur, Ui, k0, k1,
    # k2, m0, m1, m2)``; everything else (validation, wavenumber factors,
    # integrator wiring, conversions, Parseval energy) lives here.

    def _validate_packed(self):
        FFT = self.FFT
        ok = (self.dealias == "2/3-rule"
              and hasattr(FFT, "_packed_iface_ok")
              and FFT._packed_iface_ok(self.dealias))
        if not ok:
            raise ValueError(
                "spectral_layout='packed' needs an fp32 R2C decomposition "
                "with a single distributed transpose (slab at any P, or "
                "pencil with P2==1 / the wide P2>1 layout), "
                "(N2/2) % 128 == 0, dealias='2/3-rule', and the TPU Pallas "
                "tier")

    def _init_packed(self):
        """Build the distributed-capable packed transforms (call from the
        subclass __init__ once ``spectral_layout == 'packed'``).  The forward
        purifies the plane-0 Nyquist rider and applies the 2/3-rule mask; the
        state is always masked, so the inverse needs no mask of its own."""
        from ..ops import pallas_fft3d as p3
        self._fwd_pk = self.FFT.forward_packed_fn(self.dealias)
        self._bwd_pk = self.FFT.backward_packed_fn()
        # serial fast path: the curl + x-inverse fuse into one kernel (the
        # 6-plane iK× intermediate never touches HBM); distributed paths
        # keep the generic pipeline
        try:
            self._curl_fused = (
                self.FFT._packed_gate_is_serial(self.dealias)
                and p3.curl_fused_ok(int(self.FFT.N[0])))
        except Exception:
            self._curl_fused = False
        # fast path for the whole nonlinear term: cross product + z/y forward
        # in one kernel, x-forward + mask + projection/curl + diffusion in a
        # second (the F field and the pre-projection spectrum never touch
        # HBM); plane-0 purify is a column update afterwards.  Serial at
        # P==1; at P>1 the same kernels run shard-locally around the single
        # 1D transpose (slab any P, pencil P2==1 — FFT.nl_forward_epilogue_fn)
        N = [int(n) for n in self.FFT.N]
        self._nl_fused = (
            getattr(self, "_curl_fused", False)
            and p3.fft_x_epilogue_ok(N[0]))
        self._nl_fused_dist = False
        if not self._nl_fused:
            try:
                self._nl_fused_dist = self.FFT._nl_dist_ok(self.dealias)
            except Exception:
                self._nl_fused_dist = False

    @property
    def _nl_any_fused(self):
        return (getattr(self, "_nl_fused", False)
                or getattr(self, "_nl_fused_dist", False))

    def _nl_dist_plan(self, mode, visc, op, ri):
        key = (mode, float(visc), op, None if ri is None else float(ri))
        plans = getattr(self, "_nl_dist_plans", None)
        if plans is None:
            plans = self._nl_dist_plans = {}
        fn = plans.get(key)
        if fn is None:
            fn = plans[key] = self.FFT.nl_forward_epilogue_fn(
                mode, visc, op=op, ri=ri, dealias=self.dealias)
        return fn

    def _nl_fwd_epilogue_pk(self, A, B, Sr, Si, kargs, mode, visc,
                            C=None, D=None, buoy=None):
        """Fused  purify(mask·epilogue(fft(A×B [+ C×D]))) − visc·k²·S  on the
        packed layout (requires self._nl_any_fused).  The cross product rides
        the z/y forward kernel when its VMEM gate passes (one-shot at
        256³-class, z-tiled accumulating at 512³-class); otherwise it crosses
        in XLA but still gets the fused x-stage epilogue.  At P>1 the same
        composition runs shard-locally around the distributed transpose."""
        from ..ops import pallas_fft3d as p3
        k0, k1, k2, m0, m1, m2 = kargs
        if not getattr(self, "_nl_fused", False):   # distributed fused path
            op = "cross2" if C is not None else "cross"
            extra, ri = (), None
            if buoy is not None:
                tr, ti, ri = buoy
                extra = (tr, ti)
            fn = self._nl_dist_plan(mode, visc, op, ri)
            args = (A, B) + ((C, D) if C is not None else ()) + extra \
                + (Sr, Si, k0, k1, k2, m0, m1, m2)
            return fn(*args)
        n1, n2 = A.shape[2], A.shape[3]
        if p3.cross_zy_ok(n1, n2, C is not None):
            Fzr, Fzi = p3.cross_rfft_zy_packed(A, B, C, D, dif=True)
        else:
            F = jnp.stack([A[1] * B[2] - A[2] * B[1],
                           A[2] * B[0] - A[0] * B[2],
                           A[0] * B[1] - A[1] * B[0]])
            if C is not None:
                F = F + jnp.stack([C[1] * D[2] - C[2] * D[1],
                                   C[2] * D[0] - C[0] * D[2],
                                   C[0] * D[1] - C[1] * D[0]])
            Fzr, Fzi = self._zy_fwd_pk(F)
        dr, di = p3.fft_x_epilogue_packed(Fzr, Fzi, Sr, Si, k0, k1, k2,
                                          m0, m1, m2, mode, visc, buoy=buoy)
        return p3.purify_plane0_dus(dr, di)

    def _nl_mul_epilogue_pk(self, A, t, Sr, Si, kargs, visc):
        """Scalar-flux mirror of _nl_fwd_epilogue_pk:
        purify(mask·(−ik·fft(A·t))) − visc·k²·S  (mode="div", 1-stack S) —
        the Boussinesq advection term, serial or distributed."""
        from ..ops import pallas_fft3d as p3
        k0, k1, k2, m0, m1, m2 = kargs
        if not getattr(self, "_nl_fused", False):   # distributed fused path
            fn = self._nl_dist_plan("div", visc, "mul", None)
            return fn(A, t, Sr, Si, k0, k1, k2, m0, m1, m2)
        if p3.cross_zy_ok(A.shape[2], A.shape[3]):
            Gzr, Gzi = p3.mul_rfft_zy_packed(A, t, dif=True)
        else:
            Gzr, Gzi = self._zy_fwd_pk(A * t)
        dr, di = p3.fft_x_epilogue_packed(Gzr, Gzi, Sr, Si, k0, k1, k2,
                                          m0, m1, m2, "div", visc)
        return p3.purify_plane0_dus(dr, di)

    def _zy_fwd_pk(self, F):
        """Serial z+y forward of a physical stack to the pre-x-stage packed
        pair (the first two thirds of rfft3d_packed)."""
        from ..ops import pallas_fft3d as p3
        if p3._use_fused_zy(F.shape[-2], F.shape[-1]):
            return p3.fused_zy_fwd(F, dif=True)
        yr, yi = p3.rfft_last_packed(F, dif=True)
        return p3.fft_axis_planar(yr, yi, axis=F.ndim - 2)

    def _bwd_state_curl_pk(self, Vr, Vi, k0, k1, k2,
                           biot_savart: bool = False):
        """(ifft(V̂), ifft(iK×V̂ [/k²])) — the RHS needs both the field and
        its curl; on the serial path the with_state fused kernel emits both
        from ONE pass over the state pair (≤512-class VMEM gate), otherwise
        two separate inverse chains."""
        from ..ops import pallas_fft3d as p3
        if getattr(self, "_curl_fused", False) and \
                p3.curl_fused_ok(int(self.FFT.N[0]), with_state=True):
            W, V = p3.curl_irfft3d_packed(Vr, Vi, k0, k1, k2,
                                          self.FFT.global_real_shape(),
                                          biot_savart=biot_savart,
                                          with_state=True, dif=True)
            return V, W
        return (self._bwd_pk((Vr, Vi)),
                self._curl_bwd_pk(Vr, Vi, k0, k1, k2, biot_savart))

    def _curl_bwd_pk(self, Vr, Vi, k0, k1, k2, biot_savart: bool = False):
        """ifft of i K × V̂ (optionally ×1/|k|² — Biot–Savart) for a packed
        3-stack — fused kernel on the serial path, generic kx + packed
        inverse otherwise."""
        from ..ops import pallas_fft3d as p3
        if getattr(self, "_curl_fused", False):
            return p3.curl_irfft3d_packed(Vr, Vi, k0, k1, k2,
                                          self.FFT.global_real_shape(),
                                          biot_savart=biot_savart, dif=True)
        K0 = k0[:, None, None]
        K1 = k1[None, :, None]
        K2v = k2[None, None, :]
        if biot_savart:
            ksq = K0 * K0 + K1 * K1 + K2v * K2v
            kinv = 1.0 / jnp.where(ksq == 0, 1, ksq)
        else:
            kinv = 1.0

        def kx(V):
            return jnp.stack([(K1 * V[2] - K2v * V[1]) * kinv,
                              (K2v * V[0] - K0 * V[2]) * kinv,
                              (K0 * V[1] - K1 * V[0]) * kinv])
        return self._bwd_pk((-kx(Vi), kx(Vr)))

    def _nl_stream_on(self) -> bool:
        """Per-component-streamed nonlinear term for grids whose physical
        3-stacks cannot co-live in HBM (768-class on a 16 GB chip: two
        physical stacks alone are 10.9 GB — see the BENCH.md 768³ ledger).
        Auto-engages on the serial packed path when the two stacks exceed
        ~9 GB; MPIFFT4PY_TPU_NL_STREAM=0/1 forces."""
        import os
        env = os.environ.get("MPIFFT4PY_TPU_NL_STREAM", "auto")
        if env in ("0", "1"):
            return env == "1"
        N = [int(n) for n in self.FFT.N]
        try:
            serial = self.FFT._packed_gate_is_serial(self.dealias)
        except Exception:
            return False
        return serial and 2 * 3 * N[0] * N[1] * N[2] * 4 > 9e9

    def _streamed_cross_fhat(self, u_comp, w_comp, Sr, Si, aux=()):
        """F̂ = fwd(U×W) streamed one COMPONENT at a time: the physical
        difference D_i = U_j·W_k − U_k·W_j is built from single-component
        inverse transforms (``u_comp(Sr, Si, c)`` / ``w_comp(Sr, Si, c)``
        recompute each physical component from the spectral state pair, so
        it dies with its product; D_i accumulates in place), then ONE
        forward per component — no physical 3-stack ever materialises and
        the forward count matches the stacked path (3).
        optimization_barriers between the two products and around each
        forward pin the schedule; without them XLA co-schedules both
        products' spectra and inverse-transform temporaries (measured
        17.73→17.17 GB OOM at 768³ via the AOT memory ledger,
        benchmarks/memory_ledger.py — five simultaneous 864 MB w-spectra
        buffers in the dump).  Arithmetic matches the stacked path (same
        physical cross difference, same single forward; transform + mask +
        purify are linear).  Returns (Fr, Fi) component LISTS plus the
        barrier-threaded (state pair + aux) tuple.

        ``aux`` (e.g. the 1-D wavenumber vectors) is threaded through every
        barrier and handed back to the closures: spectral factors like k²
        or 1/k² must be REBUILT inside each closure from the threaded
        vectors, never hoisted — a hoisted 3-D broadcast is CSE-shared by
        every segment and lives across the whole RHS (measured 864 MB each
        for ksq and 1/k² at 768³ in the AOT dump); built from barrier-fresh
        vectors, each segment's copy fuses into its consumers and dies with
        the segment."""
        from jax import lax
        Fr, Fi = [], []
        gate = (Sr, Si) + tuple(aux)
        for i in range(3):
            j, k = (i + 1) % 3, (i + 2) % 3
            Sr, Si, *aux = gate              # serialise: comp i+1 starts only
            t = u_comp(Sr, Si, aux, j) * w_comp(Sr, Si, aux, k)
            t, Sr, Si, *aux = lax.optimization_barrier((t, Sr, Si, *aux))
            t = t - u_comp(Sr, Si, aux, k) * w_comp(Sr, Si, aux, j)
            t, Sr, Si, *aux = lax.optimization_barrier((t, Sr, Si, *aux))
            fr, fi = self._fwd_pk(t)         # ONE forward per component
            fr, fi, Sr, Si, *aux = lax.optimization_barrier(
                (fr, fi, Sr, Si, *aux))
            gate = (Sr, Si, *aux)
            Fr.append(fr)
            Fi.append(fi)
        return Fr, Fi, gate

    def _packed_arrays(self):
        """FACTORED wavenumber state for the packed RHS: 1-D scaled
        wavenumbers (k0, k1, k2) and 1-D dealias masks (m0, m1, m2), packed
        k2 = 0..h−1.  The (3, N0, N1, h) K / K² / K÷K² arrays are never
        materialised — XLA broadcasts the 1-D factors in-register, which at
        512³ saves ~2 GB of resident HBM and every RHS's re-reads of them
        (part of what lets a 512³ DNS step fit on one 16 GB chip)."""
        from ..utils.spectral import dealias_cutoffs
        FFT = self.FFT
        N = [int(n) for n in FFT.N]
        h = N[2] // 2
        s = (2 * np.pi / np.asarray(FFT.L)).astype(np.float32)
        k0 = np.fft.fftfreq(N[0], 1.0 / N[0]).astype(np.float32)
        k1 = np.fft.fftfreq(N[1], 1.0 / N[1]).astype(np.float32)
        k2 = np.arange(h, dtype=np.float32)
        perm = getattr(FFT, "packed_z_perm", None)
        if perm is not None:        # DIF z-stage: lanes in zdif_perm order
            k2 = k2[perm]
        c = dealias_cutoffs(FFT.N)
        m0 = np.abs(k0) < c[0]
        m1 = np.abs(k1) < c[1]
        m2 = np.abs(k2) < c[2]
        return (jnp.asarray(k0 * s[0]), jnp.asarray(k1 * s[1]),
                jnp.asarray(k2 * s[2]), jnp.asarray(m0), jnp.asarray(m1),
                jnp.asarray(m2))

    def to_packed(self, U_hat):
        """complex state (C,)+global_complex_shape() -> packed (Ur, Ui) pair.
        The state must be Nyquist-free (guaranteed under 2/3-rule).  Pencil
        alignment padding (width Nfp > Nf) is sliced off first — the packed
        pair always has width Nf−1 = N2/2."""
        from ..ops import pallas_fft3d as p3
        nf = int(getattr(self.FFT, "Nf", U_hat.shape[-1]))
        if U_hat.shape[-1] > nf:
            U_hat = U_hat[..., :nf]
        br, bi = p3.pack_spectrum(U_hat)
        perm = getattr(self.FFT, "packed_z_perm", None)
        if perm is not None:        # natural -> DIF lane order (setup-time
            p = jnp.asarray(perm)   # conversion boundary, not a hot path)
            br, bi = jnp.take(br, p, axis=-1), jnp.take(bi, p, axis=-1)
        return br, bi

    def from_packed(self, U):
        from ..ops import pallas_fft3d as p3
        from ..ops.pallas_zdif import zdif_iperm
        ur, ui = U
        perm = getattr(self.FFT, "packed_z_perm", None)
        if perm is not None:        # DIF -> natural lane order
            ip = jnp.asarray(zdif_iperm(2 * ur.shape[-1]))
            ur, ui = jnp.take(ur, ip, axis=-1), jnp.take(ui, ip, axis=-1)
        return p3.unpack_spectrum(ur, ui)

    # -- streaming-fold RHS API (round 5) --------------------------------------
    #
    # For big multi-field states the classical contract "rhs() returns the
    # full (C, …) stack" is what breaks the HBM budget: LSRK54 at MHD-512³
    # co-holds r + dU + U plus 3.01 GiB of allocator fragmentation from the
    # 1.5 GiB contiguous stacks — 17.26 of 15.75 GiB while the real content
    # is 14.25 (BENCH.md round 4, "anatomy of the LSRK54 miss").  The fold
    # API inverts control: the model EMITS per-slice RHS pieces through a
    # fold callback that accumulates them into dU in place
    # (``acc.at[sl].set(a·acc[sl] + piece)``), so the full RHS stack never
    # exists and the only state-wide persistent buffers are the state pair
    # and the accumulator pair.
    #
    # Contract:
    #   * ``_fold_slices()`` — static partition of the component axis (a list
    #     of ``slice`` objects), or None when the model has no fold path.
    #   * ``rhs_packed_fold(Sr, Si, kargs, fold, carry)`` — compute the RHS
    #     piecewise; for each piece call
    #     ``carry = fold(sl, pr, pi, carry, first=...)`` (pr/pi shaped
    #     ``(len(sl),) + plane``) and THREAD the returned carry through the
    #     model's own optimization_barriers between pieces (the fold's
    #     in-place update must be ordered against the next piece's work or
    #     XLA will co-schedule them).  ``first=True`` (default) marks the
    #     first emission for that slice in this evaluation — it applies the
    #     integrator's accumulator scaling; later emissions to the same
    #     slice are pure adds (used for linear correction passes, e.g. the
    #     incremental Leray projection).  Every slice must get exactly one
    #     ``first=True`` emission per evaluation.

    def _fold_slices(self):
        """Model hook: the static component-axis partition emitted by
        ``rhs_packed_fold``, or None when the model has no fold path."""
        return None

    def rhs_packed_fold(self, Sr, Si, kargs, fold, carry):
        raise NotImplementedError

    def _rhs_fold_on(self) -> bool:
        """Streaming-fold integrator path: auto-engages for LSRK54/RK4 on
        packed states big enough that holding the full RHS stack beside the
        integrator registers breaks the 16 GB budget.  The threshold is
        integrator-aware (on-chip A/B, BENCH.md round 5): the fold's extra
        accumulate passes cost ~12% per step (Bq 512³ LSRK54 1087.7 fold vs
        955.9 stacked), so it must not engage where stacked fits —
        LSRK54 (2N storage) folds above ~3 GB pairs (MHD 512³ = 3.22 GB
        OOMs stacked; Bq = 2.15 GB fits), RK4 (4 registers) above ~2 GB
        (Bq 512³ RK4 stacked has OOM'd since round 3).
        MPIFFT4PY_TPU_RHS_FOLD=0/1 forces."""
        import os
        if self._fold_slices() is None:
            return False
        env = os.environ.get("MPIFFT4PY_TPU_RHS_FOLD", "auto")
        if env in ("0", "1"):
            return env == "1"
        if self.integrator not in ("LSRK54", "RK4"):
            return False
        ncomp = max(sl.stop for sl in self._fold_slices())
        N = [int(n) for n in self.FFT.N]
        pair_bytes = 2 * ncomp * N[0] * N[1] * (N[2] // 2) * 4
        return pair_bytes > (3e9 if self.integrator == "LSRK54" else 2e9)

    def _advance_packed_fold(self, U, kargs):
        """LSRK54 / RK4 with the RHS folded piecewise into the accumulator.

        The accumulator lives as PER-SLICE arrays, never a full (C, …)
        stack: a ``zeros_like``-initialised stack ledgered as a resident
        1.5 GiB ``broadcast(constant)`` block at MHD-512³ and the
        ``.at[sl]`` update pattern kept full-width temps alive — per-slice
        buffers are both smaller (less allocator fragmentation, the round-4
        miss mode) and born directly from the first evaluation's pieces.
        LSRK54 persistent buffers: state pair + per-slice accumulator pairs
        (2 state widths total; the classical path's third — the full RHS
        stack r — never exists).  RK4: U0 + stage input + next-stage input
        + accumulator (4 widths; classical RK4 holds k1..k4 + U = 5+).
        State updates are in-place ``.at[sl]`` ops on the donated carry,
        one slice at a time, so no state-wide temp forms."""
        from jax import lax
        dt = self.dt
        slices = self._fold_slices()
        Sr, Si = U

        if self.integrator == "LSRK54":
            # carry = per-slice (re, im) accumulators, flat, in slice order;
            # empty before the first evaluation (entries appear as pieces
            # first emit — no zeros-stack init).
            acc = ()
            for a, b in zip(_LSRK54_A, _LSRK54_B):
                def fold(sl, pr, pi, carry, first=True, a=a):
                    carry = tuple(carry)   # models may thread back a list
                    i = 2 * slices.index(sl)
                    if len(carry) <= i:         # first-ever emission
                        assert first and len(carry) == i
                        carry = carry + (pr, pi)
                    elif first and a == 0.0:
                        carry = carry[:i] + (pr, pi) + carry[i + 2:]
                    elif first:
                        carry = (carry[:i]
                                 + (a * carry[i] + pr, a * carry[i + 1] + pi)
                                 + carry[i + 2:])
                    else:       # linear correction pass: pure add
                        carry = (carry[:i]
                                 + (carry[i] + pr, carry[i + 1] + pi)
                                 + carry[i + 2:])
                    return tuple(lax.optimization_barrier(carry))
                acc = self.rhs_packed_fold(Sr, Si, kargs, fold, acc)
                for j, sl in enumerate(slices):  # state axpy, per slice
                    Sr = Sr.at[sl].add(dt * b * acc[2 * j])
                    Si = Si.at[sl].add(dt * b * acc[2 * j + 1])
                    Sr, Si, *acc = lax.optimization_barrier(
                        (Sr, Si) + tuple(acc))
                acc = tuple(acc)
            return (Sr, Si)

        # classical RK4: per-slice acc accumulates Σ w_i·k_i; the next stage
        # input U0 + c_i·dt·k_i is built per slice as k_i emits and
        # assembled once per stage.  Carry layout (fixed stride 4, built in
        # slice order at stage 0): per slice j, (a_jr, a_ji, u_jr, u_ji);
        # the u slots hold scalar dummies when no stage input is being
        # built (after assembly / during the last stage).
        ws = (1.0, 2.0, 2.0, 1.0)
        cs = (0.5, 0.5, 1.0)
        ns = len(slices)
        U0r, U0i = Sr, Si
        Utr, Uti = Sr, Si
        dummy = jnp.zeros((), jnp.float32)
        carry = ()
        for i in range(4):
            last = i == 3

            def fold(sl, pr, pi, carry, first=True, i=i, last=last):
                carry = tuple(carry)       # models may thread back a list
                j4 = 4 * slices.index(sl)
                w = ws[i]
                if len(carry) <= j4:            # first-ever emission (i==0)
                    assert first and i == 0 and len(carry) == j4
                    entry = (pr, pi,
                             U0r[sl] + cs[0] * dt * pr,
                             U0i[sl] + cs[0] * dt * pi)
                    carry = carry + entry
                else:
                    ar, ai, ur, ui = carry[j4:j4 + 4]
                    ar, ai = ar + w * pr, ai + w * pi
                    if last:
                        pass                    # no stage input to build
                    elif first:
                        ur = U0r[sl] + cs[i] * dt * pr
                        ui = U0i[sl] + cs[i] * dt * pi
                    else:
                        ur = ur + cs[i] * dt * pr
                        ui = ui + cs[i] * dt * pi
                    carry = carry[:j4] + (ar, ai, ur, ui) + carry[j4 + 4:]
                return tuple(lax.optimization_barrier(carry))
            carry = self.rhs_packed_fold(Utr, Uti, kargs, fold, carry)
            if not last:
                # assemble the next stage input; park dummies in the u slots
                Utr = jnp.concatenate([carry[4 * j + 2] for j in range(ns)])
                Uti = jnp.concatenate([carry[4 * j + 3] for j in range(ns)])
                carry = sum(((carry[4 * j], carry[4 * j + 1], dummy, dummy)
                             for j in range(ns)), ())
                Utr, Uti, *carry = lax.optimization_barrier(
                    (Utr, Uti) + tuple(carry))
                carry = tuple(carry)
        for j, sl in enumerate(slices):  # U_new = U0 + dt/6 · acc, per slice
            U0r = U0r.at[sl].add((dt / 6.0) * carry[4 * j])
            U0i = U0i.at[sl].add((dt / 6.0) * carry[4 * j + 1])
            U0r, U0i, *carry = lax.optimization_barrier(
                (U0r, U0i) + tuple(carry))
            carry = tuple(carry)
        return (U0r, U0i)

    def step_fn_packed(self):
        """Jittable step on the packed pair: ((Ur, Ui), k0, k1, k2, m0, m1,
        m2) with factored 1-D wavenumbers, through ``integrator``."""
        if self._rhs_fold_on():
            def step(U, *kargs):
                return self._advance_packed_fold(U, kargs)
            return step

        def step(U, *kargs):
            rhs1 = lambda V: self.rhs_packed(V[0], V[1], *kargs)
            return self._advance(rhs1, U)
        return step

    @staticmethod
    def staged_mean(x):
        """Mean over ALL axes via sequential per-axis sums — each partial is
        short (≤ max(N) terms, ~sqrt(N)·eps error) where one flat f32 reduce
        over ~1e8 elements random-walks ~1e-4 relative (measured 4e-5 at a
        mere 32³ on XLA:CPU)."""
        n = float(np.prod(x.shape))
        s = x
        for _ in range(x.ndim):
            s = s.sum(axis=-1)
        return s / n

    def _parseval_component_energies(self):
        """Builder piece shared by the family's packed diagnostics: a fn
        (Sr, Si) -> per-component Parseval energies 0.5·Σ w·|ŝ_c|²/ntot²
        with the Hermitian half-spectrum weights (column k2=0 weight 1,
        interior weight 2 — no Nyquist column exists in purified states)."""
        h = int(self.FFT.N[2]) // 2
        w = np.full((h,), 2.0, np.float32)
        w[0] = 1.0
        ntot = float(np.prod([int(n) for n in self.FFT.N]))

        def comp_e(Sr, Si):
            # sequential per-axis sums: a single flat f32 reduce over ~1e8
            # elements random-walks ~1e-4 relative; staging it keeps each
            # partial sum short (≤ max(N) terms), ~sqrt(N)·eps per stage
            e = (Sr * Sr + Si * Si) * jnp.asarray(w)
            e = e.sum(axis=-1).sum(axis=-1).sum(axis=-1)
            return 0.5 * e / (ntot * ntot)
        return comp_e

    def energy_packed(self, U) -> float:
        """Parseval total energy 0.5<Σ_c |u_c|²> of a packed state."""
        def build():
            comp = self._parseval_component_energies()

            def ke(Ur, Ui):
                return jnp.sum(comp(Ur, Ui))
            return ke
        return float(self._plan("energy_packed", build)(U[0], U[1]))

    def spectrum(self, state) -> np.ndarray:
        """Shell-binned kinetic-energy spectrum E(k) of the VELOCITY
        components, dispatching on the state layout (the packed path never
        materialises a complex stack — diagnostics stay cheap mid-run).
        Multi-field solvers (MHD/Boussinesq) bin components 0..2 (û)."""
        from .diagnostics import energy_spectrum, energy_spectrum_packed
        if self.spectral_layout == "packed":
            return energy_spectrum_packed(self.FFT,
                                          (state[0][:3], state[1][:3]))
        return np.asarray(energy_spectrum(self.FFT, state[:3]))

    def _factored_k(self):
        """1-D scaled wavenumbers matching global_complex_shape (replicated;
        GSPMD broadcasts them against the sharded spectral state)."""
        FFT = self.FFT
        N = [int(n) for n in FFT.N]
        nf = FFT.global_complex_shape()[2]
        ft = FFT.float  # f64 for "double" on CPU — f32 k would cap 1/k² at ~1e-8
        s = (2 * np.pi / np.asarray(FFT.L)).astype(ft)
        k0 = np.fft.fftfreq(N[0], 1.0 / N[0]).astype(ft) * s[0]
        k1 = np.fft.fftfreq(N[1], 1.0 / N[1]).astype(ft) * s[1]
        # R2C Hermitian layout: k2 = 0..nf−1 (alignment-pad modes beyond
        # Nf are structural zeros; any nonzero k keeps K² safe there)
        k2 = np.arange(nf, dtype=ft) * s[2]
        return jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(k2)

    def _complex_k_args(self):
        """(k0, k1, k2) for complex-layout diagnostics — valid regardless of
        the solver's own spectral_layout."""
        if not hasattr(self, "_k_args"):
            self._k_args = self._factored_k()
        return self._k_args

    def _step_args(self):
        if self.spectral_layout == "packed":
            if not hasattr(self, "_pk_args"):
                self._pk_args = self._packed_arrays()
            return self._pk_args
        return self._complex_k_args()

    # -- time integrators (pytree-generic) ------------------------------------

    def _advance(self, rhs1, U):
        """One step of ``self.integrator`` on pytree state ``U`` with pytree
        right-hand side ``rhs1``.  AB2 state is (U, f_prev) — built once by
        ``ab2_state``; its first application is the Euler-equivalent seed."""
        dt = self.dt
        tm = jax.tree.map
        it = self.integrator
        if it == "RK4":
            k1 = rhs1(U)
            k2 = rhs1(tm(lambda u, k: u + 0.5 * dt * k, U, k1))
            k3 = rhs1(tm(lambda u, k: u + 0.5 * dt * k, U, k2))
            k4 = rhs1(tm(lambda u, k: u + dt * k, U, k3))
            return tm(lambda u, a, b, c, d: u + (dt / 6.0) * (a + 2 * b + 2 * c + d),
                      U, k1, k2, k3, k4)
        if it == "LSRK54":
            # big states: a barrier between the two axpys lets the stage's
            # RHS output die before the new U allocates — without it the
            # peak slice co-holds r + dU + U_old + U_new (4 state-sized
            # pytrees; the binding allocation of the MHD-512³ LSRK54 ledger,
            # navier_stokes.py axpy fusions in the AOT dump).  Gated on
            # state size: for small states the fused single pass is faster.
            big = sum(l.size * l.dtype.itemsize
                      for l in jax.tree.leaves(U)) > 2e9
            dU = None
            for a, b in zip(_LSRK54_A, _LSRK54_B):
                r = rhs1(U)
                dU = r if dU is None else tm(lambda f, g: f + a * g, r, dU)
                if big:
                    dU = jax.lax.optimization_barrier(dU)
                U = tm(lambda u, g: u + dt * b * g, U, dU)
            return U
        if it == "Euler":
            return tm(lambda u, k: u + dt * k, U, rhs1(U))
        # AB2: U_{n+1} = U_n + dt (1.5 f_n − 0.5 f_{n−1})
        Un, fprev = U
        f = rhs1(Un)
        Unew = tm(lambda u, a, b: u + dt * (1.5 * a - 0.5 * b), Un, f, fprev)
        return (Unew, f)

    def _step_builder(self):
        return (self.step_fn_packed() if self.spectral_layout == "packed"
                else self.step_fn())

    def step_fn(self):
        """The jittable step: (state, k0, k1, k2) -> state (for AB2 the state
        is the ``ab2_state`` tuple on both sides).

        The wavenumber arrays are explicit ARGUMENTS, not closures: closing
        over device-resident arrays makes jit inline them as constants, which
        requires a device->host fetch during lowering — a failure mode on
        backends with restricted transfers (axon relay) and a waste of HBM
        (constants get re-uploaded per executable) everywhere else.
        """
        def step(state, k0, k1, k2):
            return self._advance(lambda V: self.rhs(V, k0, k1, k2), state)
        return step

    def ab2_state(self, U):
        """Wrap a spectral state for integrator='AB2': (U, f_prev) with
        f_prev = f(U), so the first step reduces to Euler."""
        if self.integrator != "AB2":
            raise ValueError("ab2_state is only meaningful with integrator='AB2'")
        if self.spectral_layout == "packed":
            f = self._plan("ab2_rhs_packed",
                           lambda: lambda V, *a: self.rhs_packed(
                               V[0], V[1], *a))(U, *self._step_args())
        else:
            f = self._plan("ab2_rhs", lambda: self.rhs)(U, *self._step_args())
        return (U, f)

    def step(self, state):
        if self._step is None:
            self._step = jax.jit(self._step_builder())
        return self._step(state, *self._step_args())

    def _carry_state(self, c):
        """The physical state inside an integrator carry (AB2 carries
        (state, f_prev))."""
        return c[0] if self.integrator == "AB2" else c

    def _monitor_builder(self):
        """Jit-safe scalar monitor of the state: total Parseval energy of all
        components (spectral — no inverse transforms inside the scan)."""
        if self.spectral_layout == "packed":
            comp = self._parseval_component_energies()
            return lambda S: jnp.sum(comp(S[0], S[1]))
        from .diagnostics import _hermitian_weights
        w = _hermitian_weights(self.FFT)
        ntot = float(np.prod([int(n) for n in self.FFT.N]))

        def mon(S):
            # dtype follows the state (f64 under "double" on CPU, f32 on TPU)
            mag = (jnp.real(S) ** 2 + jnp.imag(S) ** 2) * w
            return 0.5 * self.staged_mean(mag) * mag.size / (ntot * ntot)
        return mon

    def run(self, state, n_steps: int, monitor_every: Optional[int] = None):
        """n_steps under lax.scan (ONE compiled program, cached per shape).

        ``monitor_every=k`` additionally records the total Parseval energy of
        the state every k steps WITHOUT leaving the compiled program (no
        per-step dispatch/readback through the relay): returns
        ``(final_state, trace)`` with ``trace.shape == (n_steps // k,)``
        (n_steps must be divisible by k).  Without it, returns the final
        state only.

        NOTE: the input ``state`` buffer is DONATED to the scan (the carry is
        updated in place) — at 512³ the state pair is 1.6 GB and donation is
        the difference between fitting and OOM on a 16 GB chip.  Do not reuse
        ``state`` after calling run; keep the return value instead."""
        plans = getattr(self, "_run_plans", None)
        if plans is None:
            plans = self._run_plans = {}
        key = (n_steps, monitor_every)
        fn = plans.get(key)
        if fn is None:
            step = self._step_builder()
            if monitor_every is None:
                def body(u0, *args):
                    return jax.lax.scan(lambda c, _: (step(c, *args), None),
                                        u0, None, length=n_steps)[0]
            else:
                k = int(monitor_every)
                if n_steps % k:
                    raise ValueError(
                        f"n_steps={n_steps} not divisible by "
                        f"monitor_every={k}")
                mon = self._monitor_builder()

                def body(u0, *args):
                    def chunk(c, _):
                        c = jax.lax.scan(
                            lambda cc, _: (step(cc, *args), None),
                            c, None, length=k)[0]
                        return c, mon(self._carry_state(c))
                    return jax.lax.scan(chunk, u0, None,
                                        length=n_steps // k)
            fn = plans[key] = jax.jit(body, donate_argnums=0)
        return fn(state, *self._step_args())


class NavierStokes3D(SpectralSolver):
    """RK4 pseudo-spectral solver over a slab or pencil transform object.

    Args:
      FFT: a ``slab.R2C`` or ``pencil.R2C`` instance (the decomposition).
      nu: kinematic viscosity.
      dt: timestep.
      dealias: None | "2/3-rule" | "3/2-rule" — applied to the nonlinear term's
        forward transforms (reference DNS loop convention).
      integrator: one of INTEGRATORS — "RK4" (classical, default),
        "LSRK54" (Carpenter–Kennedy 2N-storage RK4(5): ~half the live state,
        the 512³-on-one-chip configuration), "Euler", "AB2"
        (Adams–Bashforth 2; state is (U, f_prev) — see ``ab2_state``).
        The same set spectralDNS exposed on top of the reference transforms.
    """

    def __init__(self, FFT, nu: float, dt: float, dealias: Optional[str] = "2/3-rule",
                 spectral_layout: str = "complex", integrator: str = "RK4",
                 forcing_band: Optional[tuple] = None, forcing_rate: float = 0.0):
        """``forcing_band=(k_lo, k_hi)`` with ``forcing_rate=ε`` adds the
        constant-energy-injection low-wavenumber forcing of forced isotropic
        turbulence (the spectralDNS sustained-turbulence configuration):
        f̂ = ε·û/(2·E_band) on modes k_lo ≤ |k| < k_hi — injects energy at
        exactly ε per unit time regardless of the band's current energy."""
        self.nu = float(nu)
        self.forcing_band = (None if forcing_band is None
                             else (float(forcing_band[0]), float(forcing_band[1])))
        self.forcing_rate = float(forcing_rate)
        self._init_solver(FFT, dt, dealias, integrator, spectral_layout)

    # -- packed spectral layout (MXU fast path without complex boundaries) -----
    #
    # With 2/3-rule dealiasing every Nyquist plane is masked to zero, so the
    # packed-Hermitian rider (plane k2=0 carries X0 + i·X_Nyq) is identically
    # zero in the state: the packed planar pair (Ur, Ui) of shape
    # (3, N0, N1, N2/2) IS the spectrum on k2 = 0..h−1, and the whole RK4 step
    # runs on float32 pairs — no pack/unpack/complex materialisation around
    # any of the 36 transforms per step.  Measured 256³: 85 ms/step vs 112 ms
    # through the complex boundary (see BENCH.md).  Distributed (P>1): the
    # pair crosses the single transpose via the _PackedDist1D pipeline — the
    # fast layout survives slab (and pencil-P2==1) sharding.

    def _rhs_packed_lowmem(self, Ur, Ui, k0, k1, k2, m0, m1, m2):
        """Rotational RHS with the nonlinear term streamed one component at
        a time (`SpectralSolver._streamed_cross_fhat` — see its docstring
        for the memory design), followed by a per-component projection +
        viscosity epilogue."""
        from jax import lax

        def ks_of(kv):                       # per-segment broadcast factors
            return (kv[0][:, None, None], kv[1][None, :, None],
                    kv[2][None, None, :])

        def u_comp(Ur, Ui, kv, c):           # physical U_c
            return self._bwd_pk((Ur[c], Ui[c]))

        def w_comp(Ur, Ui, kv, c):           # physical ω_c = ifft(i(K×Û)_c)
            Ks = ks_of(kv)
            j, k = (c + 1) % 3, (c + 2) % 3
            wr = -(Ks[j] * Ui[k] - Ks[k] * Ui[j])
            wi = Ks[j] * Ur[k] - Ks[k] * Ur[j]
            return self._bwd_pk((wr, wi))

        Fr, Fi, (Ur, Ui, *kv) = self._streamed_cross_fhat(
            u_comp, w_comp, Ur, Ui, aux=(k0, k1, k2))
        # Projection + viscosity PER COMPONENT on the F̂ pieces.  The obvious
        #   F − stack([K0·d, K1·d, K2·d]) − ν k² Û
        # allocates a second full (3,…) pair plus the K⊙d broadcast stack
        # (~7.5 GB at 768³) — measured OOM 17.73 of 15.75 GB via the AOT
        # memory ledger (benchmarks/memory_ledger.py).  Emitting one output
        # component at a time lets each F̂_c die as its output forms, and
        # stacking re before im keeps only one 3-stack copy in flight.
        # ksq/inv are rebuilt per segment from the barrier-threaded vectors
        # (see _streamed_cross_fhat on why hoisting them costs 864 MB each).
        K0, K1, K2v = ks_of(kv)
        Ks = (K0, K1, K2v)
        ksq = K0 * K0 + K1 * K1 + K2v * K2v
        inv = 1.0 / jnp.where(ksq == 0, 1, ksq)
        dr = (K0 * Fr[0] + K1 * Fr[1] + K2v * Fr[2]) * inv
        di = (K0 * Fi[0] + K1 * Fi[1] + K2v * Fi[2]) * inv
        outr, outi = [], []
        g = (dr, di, *kv)
        for c in range(3):
            dr, di, *kv = g
            K0, K1, K2v = ks_of(kv)
            Ks = (K0, K1, K2v)
            ksq = K0 * K0 + K1 * K1 + K2v * K2v
            oc_r = Fr[c] - Ks[c] * dr - self.nu * ksq * Ur[c]
            oc_i = Fi[c] - Ks[c] * di - self.nu * ksq * Ui[c]
            oc_r, oc_i, *g = lax.optimization_barrier(
                (oc_r, oc_i, dr, di, *kv))
            outr.append(oc_r)
            outi.append(oc_i)
        R = jnp.stack(outr)
        R, *outi = lax.optimization_barrier((R, *outi))
        return R, jnp.stack(outi)

    # -- streaming-fold RHS (round 5): per-component emission ------------------

    def _fold_slices(self):
        if self.forcing_band is not None and self.forcing_rate > 0:
            return None             # band forcing needs the full spectrum
        if self._nl_stream_on():
            return [slice(c, c + 1) for c in range(3)]
        return [slice(0, 3)]

    def rhs_packed_fold(self, Sr, Si, kargs, fold, carry):
        """NS RHS through the fold API.  In the streamed regime each
        component's F̂ folds into the accumulator the moment its forward
        completes (with its −νk²û term), while the Leray divisor
        d = (K·F̂)/k² ACCUMULATES incrementally; the −K_c·d projection
        correction then folds as a second linear pass — so neither the RHS
        stack nor the F̂ stack ever exists (at 768³ the F̂ 3-pair alone is
        5.06 GiB; holding it beside the LSRK54 accumulator is what priced
        time-accurate stepping off the chip in round 4)."""
        if not self._nl_stream_on():
            pr, pi = self.rhs_packed(Sr, Si, *kargs)
            return fold(slice(0, 3), pr, pi, carry)
        from jax import lax
        k0, k1, k2 = kargs[0], kargs[1], kargs[2]

        def ks_of(kv):
            return (kv[0][:, None, None], kv[1][None, :, None],
                    kv[2][None, None, :])

        def u_comp(Ur, Ui, kv, c):
            return self._bwd_pk((Ur[c], Ui[c]))

        def w_comp(Ur, Ui, kv, c):
            Ks = ks_of(kv)
            j, k = (c + 1) % 3, (c + 2) % 3
            wr = -(Ks[j] * Ui[k] - Ks[k] * Ui[j])
            wi = Ks[j] * Ur[k] - Ks[k] * Ur[j]
            return self._bwd_pk((wr, wi))

        Ur, Ui = Sr, Si
        dr = di = None
        kv = (k0, k1, k2)
        for c in range(3):
            j, k = (c + 1) % 3, (c + 2) % 3
            t = u_comp(Ur, Ui, kv, j) * w_comp(Ur, Ui, kv, k)
            t, Ur, Ui, *kv = lax.optimization_barrier((t, Ur, Ui, *kv))
            t = t - u_comp(Ur, Ui, kv, k) * w_comp(Ur, Ui, kv, j)
            t, Ur, Ui, *kv = lax.optimization_barrier((t, Ur, Ui, *kv))
            fr, fi = self._fwd_pk(t)             # ONE forward per component
            Ks = ks_of(kv)
            ksq = Ks[0] * Ks[0] + Ks[1] * Ks[1] + Ks[2] * Ks[2]
            inv = 1.0 / jnp.where(ksq == 0, 1, ksq)
            # divisor contribution (F̂_c dies after these two consumers)
            cr, ci = Ks[c] * fr * inv, Ks[c] * fi * inv
            dr = cr if dr is None else dr + cr
            di = ci if di is None else di + ci
            carry = fold(slice(c, c + 1),
                         (fr - self.nu * ksq * Ur[c])[None],
                         (fi - self.nu * ksq * Ui[c])[None], carry)
            dr, di, Ur, Ui, *rest = lax.optimization_barrier(
                (dr, di, Ur, Ui) + tuple(kv) + tuple(carry))
            kv, carry = rest[:3], tuple(rest[3:])
        for c in range(3):       # Leray correction: out_c += −K_c·d
            Ks = ks_of(kv)
            carry = fold(slice(c, c + 1), (-Ks[c] * dr)[None],
                         (-Ks[c] * di)[None], carry, first=False)
            dr, di, *rest = lax.optimization_barrier(
                (dr, di) + tuple(kv) + tuple(carry))
            kv, carry = rest[:3], tuple(rest[3:])
        return carry

    def rhs_packed(self, Ur, Ui, k0, k1, k2, m0, m1, m2):
        if self._nl_stream_on():
            dUr, dUi = self._rhs_packed_lowmem(Ur, Ui, k0, k1, k2,
                                               m0, m1, m2)
            if self.forcing_band is None or self.forcing_rate <= 0:
                return dUr, dUi
            raise NotImplementedError(
                "band forcing + streamed nonlinear term not wired")
        K0 = k0[:, None, None]
        K1 = k1[None, :, None]
        K2v = k2[None, None, :]
        ksq = K0 * K0 + K1 * K1 + K2v * K2v

        # ω̂ = i K × Û  →  (re, im) = (−K×Ui, K×Ur).  Two 3-stack inverse
        # chains deliberately: a single 6-stack (concatenated) call measured
        # 84.5 vs 77.0 ms/step at 256³ — the concat materialisations cost
        # more than the saved kernel launches.  The curl inverse rides the
        # fused curl+x-IFFT kernel on the serial path (_curl_bwd_pk).
        U, W = self._bwd_state_curl_pk(Ur, Ui, k0, k1, k2)
        # (3, N0, N1, N2) batched; one state-pair pass on the serial path
        if self._nl_any_fused:
            # cross product + forward + projection + viscous term in two
            # kernels; F = U×W and the pre-projection F̂ never touch HBM
            dUr, dUi = self._nl_fwd_epilogue_pk(
                U, W, Ur, Ui, (k0, k1, k2, m0, m1, m2), "project", self.nu)
        else:
            F = jnp.stack([U[1] * W[2] - U[2] * W[1],
                           U[2] * W[0] - U[0] * W[2],
                           U[0] * W[1] - U[1] * W[0]])
            Fr, Fi = self._fwd_pk(F)             # purify + 2/3-rule mask inside
            inv = 1.0 / jnp.where(ksq == 0, 1, ksq)
            dr = (K0 * Fr[0] + K1 * Fr[1] + K2v * Fr[2]) * inv
            di = (K0 * Fi[0] + K1 * Fi[1] + K2v * Fi[2]) * inv
            Fr = Fr - jnp.stack([K0 * dr, K1 * dr, K2v * dr])
            Fi = Fi - jnp.stack([K0 * di, K1 * di, K2v * di])
            dUr = Fr - self.nu * ksq[None] * Ur
            dUi = Fi - self.nu * ksq[None] * Ui
        if self.forcing_band is not None and self.forcing_rate > 0:
            # packed-layout band forcing (complex-layout mirror below): after
            # purification the packed pair holds no Nyquist modes, so the
            # Hermitian weights are simply 1 on column k2=0 and 2 elsewhere.
            klo, khi = self.forcing_band
            band = (ksq >= klo * klo) & (ksq < khi * khi)
            w = jnp.where(K2v == 0, 1.0, 2.0)
            ntot = float(np.prod([int(n) for n in self.FFT.N]))
            Eb = jnp.sum(jnp.where(band, w * (Ur * Ur + Ui * Ui), 0.0)) \
                / (2.0 * ntot * ntot)
            alpha = jnp.where(Eb > 0, self.forcing_rate / (2.0 * Eb), 0.0)
            dUr = dUr + (alpha * band) * Ur
            dUi = dUi + (alpha * band) * Ui
        return dUr, dUi

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

    def rhs(self, U_hat, k0, k1, k2):
        """dU_hat/dt.  Pure function of the sharded state; jit/scan-safe.

        Wavenumbers arrive FACTORED as 1-D arrays (k0, k1, k2) — the
        (3,)+spectral K / K² / K/K² fields are never materialised; GSPMD
        broadcasts the replicated vectors against the sharded spectral state
        in-register.  Per-component transform calls measured FASTER than
        batched stacks on one chip (TPU executes kernels serially; batching
        only adds stack/concat materialisations — 120 vs 113 ms/step at
        256³).  On a pod the batched ``*_fields_fn`` API wins instead (one
        collective per stack); switch here if multi-chip DNS becomes the
        bottleneck.
        """
        bwd, fwd = self._bwd_nl, self._fwd
        K0 = k0[:, None, None]
        K1 = k1[None, :, None]
        K2v = k2[None, None, :]
        U = jnp.stack([bwd(U_hat[i]) for i in range(3)])
        # vorticity: ω = ifftn(i K × U_hat)
        cu0 = 1j * (K1 * U_hat[2] - K2v * U_hat[1])
        cu1 = 1j * (K2v * U_hat[0] - K0 * U_hat[2])
        cu2 = 1j * (K0 * U_hat[1] - K1 * U_hat[0])
        W = jnp.stack([bwd(cu0), bwd(cu1), bwd(cu2)])
        # nonlinear term F = U × ω, transformed with dealiasing
        F0 = U[1] * W[2] - U[2] * W[1]
        F1 = U[2] * W[0] - U[0] * W[2]
        F2 = U[0] * W[1] - U[1] * W[0]
        F_hat = jnp.stack([fwd(F0), fwd(F1), fwd(F2)])
        # Leray projection + viscous term
        ksq = K0 * K0 + K1 * K1 + K2v * K2v
        div = (K0 * F_hat[0] + K1 * F_hat[1] + K2v * F_hat[2]) \
            / jnp.where(ksq == 0, 1, ksq)
        F_hat = F_hat - jnp.stack([K0 * div, K1 * div, K2v * div])
        dU = F_hat - self.nu * ksq[None] * U_hat
        if self.forcing_band is not None and self.forcing_rate > 0:
            # constant-energy-injection band forcing: f̂ = α·û on
            # k_lo ≤ |k| < k_hi with α = ε/(2 E_band) ⇒ dE/dt |_f = ε exactly
            klo, khi = self.forcing_band
            band = (ksq >= klo * klo) & (ksq < khi * khi)
            # Hermitian half-spectrum weights: k2 = 0 AND the self-conjugate
            # z-Nyquist plane carry weight 1, interior columns weight 2
            kny = float(np.pi * int(self.FFT.N[2]) / float(self.FFT.L[2]))
            w = jnp.where((K2v == 0) | (K2v >= kny * (1.0 - 1e-6)), 1.0, 2.0)
            ntot = float(np.prod([int(n) for n in self.FFT.N]))
            Eb = jnp.sum(jnp.where(band, w * jnp.abs(U_hat) ** 2, 0.0)) \
                / (2.0 * ntot * ntot)
            alpha = jnp.where(Eb > 0, self.forcing_rate / (2.0 * Eb), 0.0)
            dU = dU + (alpha * band) * U_hat
        return dU

    # -- diagnostics --------------------------------------------------------------

    def energy(self, U_hat) -> float:
        """Mean kinetic energy 0.5 <|u|²> (physical space, or Parseval sum
        for the packed layout)."""
        if self.spectral_layout == "packed":
            return self.energy_packed(U_hat)

        def build():
            def ke(U_hat):
                U = jnp.stack([self._bwd(U_hat[i]) for i in range(3)])
                return 0.5 * self.staged_mean(jnp.sum(U * U, axis=0))
            return ke
        return float(self._plan("energy", build)(U_hat))

    def rhs_with_state(self, U_hat):
        """Convenience: rhs using the stored wavenumber vectors (eager use).
        Dispatches on the state layout (packed pair vs complex stack)."""
        if self.spectral_layout == "packed":
            return self.rhs_packed(U_hat[0], U_hat[1], *self._step_args())
        return self.rhs(U_hat, *self._complex_k_args())
