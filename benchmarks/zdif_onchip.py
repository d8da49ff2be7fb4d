"""On-chip microbench + parity: DIF z-stage vs the dense packed matmuls.

Times the r2c+c2r ROUND TRIP of the z stage only (real in, real out — a
chainable shape) over a realistic row batch, dense vs DIF, and checks
hardware parity of the DIF pair against numpy.  Relay-safe: one jitted
lax.scan chain + scalar fetch per timing.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/zdif_onchip.py [rows_factor]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def chain(fn, x, iters):
    import jax
    import jax.numpy as jnp
    from jax import lax
    f = jax.jit(lambda c: lax.scan(lambda c, _: (fn(c), None), c, None,
                                   length=iters)[0].ravel()[0])
    float(f(x))
    t0 = time.perf_counter()
    float(f(x))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rf = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import jax
    import jax.numpy as jnp
    from mpifft4py_tpu.ops import pallas_fft3d as p3
    from mpifft4py_tpu.ops import pallas_zdif as z

    rng = np.random.default_rng(3)
    out = {}
    for n in (512, 768, 1024):
        R = (n * n) // rf          # rf=1 → the full n³ z-stage row count
        x = rng.standard_normal((R, n)).astype(np.float32)
        h = n // 2
        xd = jnp.asarray(x)

        # hardware parity first (fwd alone, vs numpy, via the real inverse)
        Zr, Zi = z.rfft_last_zdif(xd)
        xb = np.asarray(z.irfft_last_zdif(Zr, Zi, n))
        rerr = float(np.abs(xb - x).max() / np.abs(x).max())
        perm = z.zdif_perm(n)
        ref = np.fft.rfft(x[:64].astype(np.float64), axis=-1)
        refp = ref[:, perm].copy()
        refp[:, 0] = ref[:, 0].real + 1j * ref[:, h].real
        Zr64 = np.asarray(Zr[:64])
        Zi64 = np.asarray(Zi[:64])
        ferr = float(max(np.abs(Zr64 - refp.real).max(),
                         np.abs(Zi64 - refp.imag).max()) / np.abs(ref).max())

        iters = max(4, int(40 * 256 * 256 / R * 256 / n))
        t_dif = chain(lambda c: z.irfft_last_zdif(*z.rfft_last_zdif(c), n),
                      xd, iters)
        t_dense = chain(
            lambda c: p3.irfft_last_packed(*p3.rfft_last_packed(c), n),
            xd, iters)
        out[n] = {"rows": R, "dense_ms": round(t_dense, 3),
                  "dif_ms": round(t_dif, 3),
                  "speedup": round(t_dense / t_dif, 3),
                  "fwd_rel": ferr, "roundtrip_rel": rerr}
        print(json.dumps({n: out[n]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
