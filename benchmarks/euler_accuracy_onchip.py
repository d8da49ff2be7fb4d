"""Euler-vs-RK error spot check (VERDICT r4 weak #4: the frontier sizes
ship Euler-only — what dt/error penalty does that imply?).

NS 256³ Taylor–Green to T = 0.1 on the packed path.  Reference:
LSRK54 at dt = 2.5e-4.  Candidates: RK4 @1e-3, Euler @1e-3/2.5e-4/1e-4.
Error metric: relative L2 of the packed spectral pair at T, plus the
energy drift.  256³ is the probe size (cheap, same kernels); the dt
stability limit scales with resolution (CFL), so the ORDER conclusions
transfer to 512/768 while absolute dt does not.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python \
           benchmarks/euler_accuracy_onchip.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

T = 0.1


def main():
    from mpifft4py_tpu.utils.cache import enable_wisdom_cache
    enable_wisdom_cache(os.environ.get("MPIFFT4PY_TPU_CACHE",
                                       "/tmp/mpifft4py_tpu_cache"))
    import jax.numpy as jnp
    from mpifft4py_tpu import slab
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D

    N = 256
    FFT = slab.R2C(np.array([N] * 3), np.array([2 * np.pi] * 3), None,
                   "single")

    def evolve(integrator, dt):
        s = NavierStokes3D(FFT, nu=1 / 1600, dt=dt, dealias="2/3-rule",
                           spectral_layout="packed", integrator=integrator)
        U = s.taylor_green()
        nsteps = int(round(T / dt))
        assert abs(nsteps * dt - T) < 1e-12, (integrator, dt)
        out = s.run(U, nsteps)
        e = s.energy(out)
        return out, e

    ref, eref = evolve("LSRK54", 2.5e-4)
    rr = np.sqrt(float(jnp.sum(ref[0] ** 2) + jnp.sum(ref[1] ** 2)))
    print(json.dumps({"case": "ref LSRK54 dt=2.5e-4", "energy": eref}),
          flush=True)
    for integ, dt in (("RK4", 1e-3), ("LSRK54", 1e-3), ("Euler", 1e-3),
                      ("Euler", 2.5e-4), ("Euler", 1e-4)):
        out, e = evolve(integ, dt)
        err = np.sqrt(float(jnp.sum((out[0] - ref[0]) ** 2)
                            + jnp.sum((out[1] - ref[1]) ** 2))) / rr
        print(json.dumps({"case": f"{integ} dt={dt}", "rel_l2_err": err,
                          "energy": e, "energy_drift": e - eref}),
              flush=True)


if __name__ == "__main__":
    main()
