"""On-chip A/B of the 256-class unrolled component loop in the fused
x-stage kernels (``pallas_fft3d._unroll_components``).

The unroll choice is read at TRACE time, so the two variants are built as
two distinct jit objects with the env var flipped between their first
calls (same process, separate trace caches).  Parity is checked via float
reductions fetched to host (complex transfers are relay-unsafe).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/unroll_ab_onchip.py [N]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def chain(fn, args, iters=20):
    import jax
    import jax.numpy as jnp
    from jax import lax
    f = jax.jit(lambda c: jnp.asarray(
        jax.tree_util.tree_leaves(
            lax.scan(lambda c, _: (fn(c), None), c, None, length=iters)[0]
        )[0]).ravel()[0])
    float(f(args))
    t0 = time.perf_counter()
    float(f(args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import jax
    import jax.numpy as jnp
    from mpifft4py_tpu import slab
    from mpifft4py_tpu.models.navier_stokes import NavierStokes3D

    FFT = slab.R2C(np.array([N] * 3), np.array([2 * np.pi] * 3), None,
                   "single")
    s = NavierStokes3D(FFT, nu=1 / 1600, dt=0.002, dealias="2/3-rule",
                       spectral_layout="packed")
    Ur, Ui = s.taylor_green()
    k0, k1, k2, m0, m1, m2 = s._step_args()
    iters = 20 if N <= 256 else 5
    out = {"N": N}

    def rhs_pair(c):
        return s.rhs_packed(c[0], c[1], k0, k1, k2, m0, m1, m2)

    results = {}
    for mode in ("0", "1"):
        os.environ["MPIFFT4PY_TPU_UNROLL"] = mode
        r = jax.jit(lambda c, _m=mode: rhs_pair(c))  # fresh trace per mode
        dr, di = r((Ur, Ui))
        chk = float(jnp.sum(dr * dr) + jnp.sum(di * di))
        ms = chain(lambda c, _r=r: _r(c), (Ur, Ui), iters)
        results[mode] = (chk, ms, dr, di)
        out[f"rhs_ms_unroll{mode}"] = round(ms, 2)
        out[f"chk_unroll{mode}"] = chk
        print(json.dumps({k: out[k] for k in out if k != "N"}), flush=True)

    d0, d1 = results["0"], results["1"]
    num = float(jnp.max(jnp.abs(d1[2] - d0[2])) + jnp.max(jnp.abs(d1[3] - d0[3])))
    den = float(jnp.max(jnp.abs(d0[2])) + jnp.max(jnp.abs(d0[3])))
    out["max_abs_diff_rel"] = num / max(den, 1e-30)
    os.environ.pop("MPIFFT4PY_TPU_UNROLL", None)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
