"""NS2D packed-step leg profile at 1024²/2048² (round 5, item 6).

launch_overhead_onchip.py measured Pallas per-op launch ≈ FREE on-device
(a 32-deep identity-kernel chain costs the same as 1) while XLA rfft
pairs carry ~0.16 ms fixed each — so the 2D step's 16.8 ms cannot be
"launch overhead" generically; this decomposes one packed RHS into its
legs to find where the time actually goes:

  pointwise  spectral algebra building the 4-row gr/gi stack (pure XLA)
  bwd        the batched inverse chain (x-inverse + z-inverse kernels)
  product    G0·G2 + G1·G3 (physical, XLA)
  fwd        forward chain + purify + mask
  rhs        the whole rhs_packed
  step       one RK4 step (4 RHS + integrator updates)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python \
           benchmarks/ns2d_legs_onchip.py [N ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    from mpifft4py_tpu.utils.cache import enable_wisdom_cache
    enable_wisdom_cache(os.environ.get("MPIFFT4PY_TPU_CACHE",
                                       "/tmp/mpifft4py_tpu_cache"))
    import jax
    import jax.numpy as jnp
    from mpifft4py_tpu import line
    from mpifft4py_tpu.models.navier_stokes_2d import NavierStokes2D
    from mpifft4py_tpu.utils.profiling import measure

    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1024]
    for N in sizes:
        FFT = line.R2C(np.array([N, N]), np.array([2 * np.pi] * 2), None,
                       "single")
        try:
            s = NavierStokes2D(FFT, nu=1e-4, dt=5e-4, dealias="2/3-rule",
                               spectral_layout="packed")
        except ValueError as e:
            print(json.dumps({"N": N, "skip": str(e)}), flush=True)
            continue
        state = s.vortex_pair()
        wr, wi = state
        k0, k1 = s._step_args()
        h = N // 2

        K0, K1 = k0[:, None], k1[None, :]
        K2 = K0 * K0 + K1 * K1

        def pointwise(p):
            wr, wi = p
            K2i = jnp.where(K2 == 0, 0.0, 1.0 / jnp.where(K2 == 0, 1.0, K2))
            pr, pi = wr * K2i, wi * K2i
            gr = jnp.stack([-K1 * pi, K0 * pi, -K0 * wi, -K1 * wi])
            gi = jnp.stack([K1 * pr, -K0 * pr, K0 * wr, K1 * wr])
            return gr.sum(0) + wr, gi.sum(0) + wi   # keep carry shape

        def bwd(p):
            g = s._bwd_pk(jnp.stack([p[0]] * 4), jnp.stack([p[1]] * 4))
            return s._fwd_pk(g[0], k0, k1)           # shape-stable: fwd once

        def rhs(p):
            return s.rhs_packed(p, k0, k1)

        rows = {"N": N}
        for name, fn in (("pointwise", pointwise), ("bwd+1fwd", bwd),
                         ("rhs", rhs)):
            ms = measure(fn, (wr, wi), iters=20) * 1e3
            rows[name] = round(ms, 3)
            print(json.dumps({"N": N, "leg": name, "ms": rows[name]}),
                  flush=True)
        # one full step through the jitted plan
        out = s.run(state, 20)
        import time
        t0 = time.perf_counter()
        out = s.run(out, 20)
        float(s.enstrophy(out))
        rows["step_rk4"] = round((time.perf_counter() - t0) / 20 * 1e3, 3)
        print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
