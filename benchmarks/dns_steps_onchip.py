"""On-chip DNS step-time sweep (round-3 session-4 validation).

Measures ms/step for the packed fused-NL fast path across the solver family
at 256-class and 512-class grids, on the real chip through the axon relay.
Relay-safe timing: the whole measurement is ONE compiled ``run(state, iters)``
scan ending in a host scalar fetch (see utils.profiling.measure docstring).

Usage:  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/dns_steps_onchip.py [--small|--large|--buoy512]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _sync(solver, state):
    """Relay-safe sync point: a host scalar fetch of a diagnostic."""
    e = (solver.energy if hasattr(solver, "energy")
         else lambda s: solver.energies(s)[0])
    return float(e(state))


def _step_time(solver, state, iters):
    """One jitted n-step scan, timed around the compiled call.  ``run``
    DONATES its input state, so each call consumes the previous output."""
    print("  E0 =", _sync(solver, state), flush=True)
    out = solver.run(state, iters)
    print("  E1 =", _sync(solver, out), flush=True)
    t0 = time.perf_counter()
    out = solver.run(out, iters)
    _sync(solver, out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "--small"
    from mpifft4py_tpu.utils.cache import enable_wisdom_cache
    enable_wisdom_cache(os.environ.get("MPIFFT4PY_TPU_CACHE",
                                       "/tmp/mpifft4py_tpu_cache"))
    import jax
    from mpifft4py_tpu import slab
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D
    from mpifft4py_tpu.models.vv import VorticityVelocity3D
    from mpifft4py_tpu.models.mhd import MHD3D
    from mpifft4py_tpu.models.boussinesq import Boussinesq3D

    L = np.array([2 * np.pi] * 3)
    rows = []

    def bench(name, make, N, iters):
        FFT = slab.R2C(np.array([N] * 3), L, None, "single")
        solver, state = make(FFT)
        t0 = time.perf_counter()
        ms = _step_time(solver, state, iters)
        rows.append({"model": name, "N": N, "ms_per_step": round(ms, 1),
                     "combine": os.environ.get("MPIFFT4PY_TPU_COMBINE", "hier")})
        print(json.dumps(rows[-1]), f"(wall {time.perf_counter()-t0:.0f}s)",
              flush=True)
        del FFT, solver, state

    if mode == "--small":
        N, iters = 256, 10
        bench("NS3D", lambda F: (lambda s: (s, s.taylor_green()))(
            NavierStokes3D(F, nu=1/1600, dt=0.002, dealias="2/3-rule",
                           spectral_layout="packed")), N, iters)
        bench("VV", lambda F: (lambda s: (s, s.taylor_green()))(
            VorticityVelocity3D(F, nu=1/1600, dt=0.002, dealias="2/3-rule",
                                spectral_layout="packed")), N, iters)
        bench("MHD", lambda F: (lambda s: (s, s.taylor_green_mhd()))(
            MHD3D(F, nu=1/1600, eta=1/1600, dt=0.002, dealias="2/3-rule",
                  spectral_layout="packed")), N, iters)
        bench("Boussinesq", lambda F: (lambda s: (s, s.taylor_green_stratified()))(
            Boussinesq3D(F, nu=1/1600, kappa=1/1600, dt=0.002, Ri=0.5,
                         dealias="2/3-rule", spectral_layout="packed")), N, iters)
    elif mode == "--large":
        bench("NS3D", lambda F: (lambda s: (s, s.taylor_green()))(
            NavierStokes3D(F, nu=1/1600, dt=0.001, dealias="2/3-rule",
                           spectral_layout="packed")), 512, 5)
    elif mode == "--vv512":
        # round-4 headline refresh: VV 512³ with the zdif z-stage now default
        bench("VV", lambda F: (lambda s: (s, s.taylor_green()))(
            VorticityVelocity3D(F, nu=1/1600, dt=0.001, dealias="2/3-rule",
                                spectral_layout="packed")), 512, 5)
    elif mode == "--mhd512":
        # VERDICT r4 item 3: 512³ MHD on one chip — split cross2 (two
        # accumulating 6-field passes) + peak-HBM-sequenced RHS
        # (_rhs_packed_seq) + LSRK54 2N storage
        from mpifft4py_tpu.ops.pallas_fft3d import cross2_direct_ok, cross_zy_ok
        print("cross2_direct_ok(512,512) =", cross2_direct_ok(512, 512),
              "cross_zy_ok(512,512,two=True) =", cross_zy_ok(512, 512, True),
              flush=True)
        bench("MHD-LSRK54", lambda F: (lambda s: (s, s.taylor_green_mhd()))(
            MHD3D(F, nu=1/1600, eta=1/1600, dt=0.001, dealias="2/3-rule",
                  spectral_layout="packed", integrator="LSRK54")), 512, 3)
    elif mode == "--mhd512e":
        # LSRK54 measured 17.26 of 15.75 GB (the 2N carry + dU are 6.4 GB
        # beside the seq RHS's 3-stack peak); Euler's carry is the state
        # alone — the fitting integrator at 6 components on 16 GB
        bench("MHD-Euler", lambda F: (lambda s: (s, s.taylor_green_mhd()))(
            MHD3D(F, nu=1/1600, eta=1/1600, dt=0.0005, dealias="2/3-rule",
                  spectral_layout="packed", integrator="Euler")), 512, 3)
    elif mode == "--ns768":
        # VERDICT r4 item 5: map the single-chip DNS ceiling (768 is the only
        # packed size between 512 and 1024: h must be a 128-multiple)
        bench("NS3D-LSRK54", lambda F: (lambda s: (s, s.taylor_green()))(
            NavierStokes3D(F, nu=1/1600, dt=0.0005, dealias="2/3-rule",
                           spectral_layout="packed", integrator="LSRK54")),
              768, 2)
    elif mode == "--ns768e":
        # item 5 with the per-component-streamed nonlinear term: Euler is
        # the only integrator whose carry fits beside the 768³ RHS peak
        # (state + F̂ + 3 single components ≈ 14.5 GB; LSRK54's 2N carry
        # adds another 5.4 — see the BENCH.md 768 ledger)
        from mpifft4py_tpu.models.navier_stokes import NavierStokes3D as NS
        bench("NS3D-Euler-streamed", lambda F: (lambda s: (s, s.taylor_green()))(
            NS(F, nu=1/1600, dt=0.0002, dealias="2/3-rule",
               spectral_layout="packed", integrator="Euler")), 768, 2)
    elif mode == "--vv768e":
        # the second 768-class model: VV's streamed NL (Biot–Savart
        # single-component recovery) — Euler for the same carry reason as NS
        bench("VV-Euler-streamed", lambda F: (lambda s: (s, s.taylor_green()))(
            VorticityVelocity3D(F, nu=1/1600, dt=0.0002, dealias="2/3-rule",
                                spectral_layout="packed",
                                integrator="Euler")), 768, 2)
    elif mode == "--ns512pad":
        # item-5 companion: a 512-state 3/2-rule DNS evaluates its nonlinear
        # term alias-free on the 768 grid — the memory-lean equivalent of a
        # 768-cubed 2/3-rule run (both resolve 512 modes/axis).  Rides the
        # complex layout (the packed interface is 2/3-rule-only).
        bench("NS3D-pad-LSRK54", lambda F: (lambda s: (s, s.taylor_green()))(
            NavierStokes3D(F, nu=1/1600, dt=0.0005, dealias="3/2-rule",
                           integrator="LSRK54")), 512, 2)
    elif mode == "--ns512pade":
        # LSRK54 measured 18.53 of 15.75 GB on chip; Euler's carry fits
        bench("NS3D-pad-Euler", lambda F: (lambda s: (s, s.taylor_green()))(
            NavierStokes3D(F, nu=1/1600, dt=0.0002, dealias="3/2-rule",
                           integrator="Euler")), 512, 2)
    elif mode == "--ns2d":
        # VERDICT r4 item 7: 2D consumer numbers — complex vs packed layouts
        from mpifft4py_tpu import line
        from mpifft4py_tpu.models.navier_stokes_2d import NavierStokes2D

        def bench2d(name, N, layout, iters):
            FFT = line.R2C(np.array([N, N]), np.array([2 * np.pi] * 2), None,
                           "single")
            try:
                solver = NavierStokes2D(FFT, nu=1e-4, dt=5e-4,
                                        dealias="2/3-rule",
                                        spectral_layout=layout)
            except ValueError as e:
                print(json.dumps({"model": name, "N": N, "layout": layout,
                                  "skip": str(e)}), flush=True)
                return
            state = solver.vortex_pair()
            print("  Z0 =", solver.enstrophy(state), flush=True)
            out = solver.run(state, iters)
            print("  Z1 =", solver.enstrophy(out), flush=True)
            t0 = time.perf_counter()
            out = solver.run(out, iters)
            solver.enstrophy(out)
            ms = (time.perf_counter() - t0) / iters * 1e3
            rows.append({"model": name, "N": N, "layout": layout,
                         "ms_per_step": round(ms, 2)})
            print(json.dumps(rows[-1]), flush=True)
            del FFT, solver, state, out

        for N in (1024, 2048):
            for layout in ("complex", "packed"):
                bench2d("NS2D", N, layout, iters=20)
    elif mode == "--buoy512":
        # the pending confirmation: 512-class buoyancy rider in-kernel
        from mpifft4py_tpu.ops.pallas_fft3d import fft_x_epilogue_ok
        print("fft_x_epilogue_ok(512, buoy=True) =",
              fft_x_epilogue_ok(512, buoy=True), flush=True)
        bench("Boussinesq-LSRK54", lambda F: (lambda s: (s, s.taylor_green_stratified()))(
            Boussinesq3D(F, nu=1/1600, kappa=1/1600, dt=0.001, Ri=0.5,
                         dealias="2/3-rule", spectral_layout="packed",
                         integrator="LSRK54")), 512, 3)
    elif mode == "--bq512rk4":
        # round 5: classical RK4 at 512³/4 components via the streaming-fold
        # RHS (per-slice accumulators; AOT ledger 12.51 GiB — RK4 had been
        # HBM-impossible at this size since round 3)
        bench("Boussinesq-RK4-fold", lambda F: (lambda s: (s, s.taylor_green_stratified()))(
            Boussinesq3D(F, nu=1/1600, kappa=1/1600, dt=0.001, Ri=0.5,
                         dealias="2/3-rule", spectral_layout="packed",
                         integrator="RK4")), 512, 3)
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
