"""Taylor–Green vortex DNS — the canonical spectralDNS demo, TPU-native.

Runs the 3D pseudo-spectral Navier–Stokes solver on whatever devices are
visible: one chip (serial Pallas fast path) or a mesh (slab/pencil
decomposition + ICI all-to-alls).  Usage:

    python examples/taylor_green_dns.py [N] [steps] [slab|pencil]

Prints kinetic energy / dissipation over time; for nu=1/1600-style runs the
energy history is the standard TG benchmark curve.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    kind = sys.argv[3] if len(sys.argv) > 3 else "slab"

    from mpifft4py_tpu import slab, pencil
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D

    grid = np.array([N, N, N])
    L = np.array([2 * np.pi] * 3)
    ndev = len(jax.devices())
    if kind == "pencil" and ndev >= 4:
        FFT = pencil.R2C(grid, L, None, "single")
        print(f"pencil mesh {dict(FFT.mesh.shape)}")
    else:
        FFT = slab.R2C(grid, L, None, "single")
        print(f"slab mesh P={FFT.P}")

    # packed spectral layout: boundary-free MXU fast path (single chip,
    # (N/2)%128==0) — 256³ RK4 step 78 ms vs 112 ms (BENCH.md)
    layout = "packed" if ("--packed" in sys.argv or
                          (FFT.P == 1 and jax.default_backend() == "tpu"
                           and (N // 2) % 128 == 0)) else "complex"
    # LSRK54 (2N-storage) halves the live state vs classical RK4 — the 512³
    # single-chip configuration; pick with --integrator=LSRK54
    integ = "RK4"
    for a in sys.argv:
        if a.startswith("--integrator="):
            integ = a.split("=", 1)[1]
    print(f"spectral_layout={layout} integrator={integ}")
    solver = NavierStokes3D(FFT, nu=1.0 / 1600.0, dt=0.005, dealias="2/3-rule",
                            spectral_layout=layout, integrator=integ)
    U_hat = solver.taylor_green()
    print(f"t=0      E={solver.energy(U_hat):.8f}")

    # production pattern: the whole run is ONE compiled scan with in-scan
    # energy monitoring — no per-step dispatch/readback (~3 ms each through
    # the relay); the state buffer is donated to the scan
    k = max(1, steps // 5)
    steps_run = (steps // k) * k
    t0 = time.perf_counter()
    U_hat, trace = solver.run(U_hat, steps_run, monitor_every=k)
    trace = np.asarray(trace)   # host fetch = the one true sync point
    wall = time.perf_counter() - t0
    for j, e in enumerate(trace, start=1):
        print(f"t={j * k * solver.dt:<8.3f} E={e:.8f}")
    print(f"{steps_run} {integ} steps ({steps_run * 24}+ distributed "
          f"transforms) in {wall:.2f}s = {wall / steps_run * 1e3:.1f} ms/step")


if __name__ == "__main__":
    main()
