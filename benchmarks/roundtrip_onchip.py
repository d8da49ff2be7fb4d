"""Headline-table refresh: UNMASKED API + packed r2c+c2r round trips.

The zdif A/B in ``zdif_pipeline_onchip.py`` times the 2/3-rule-masked packed
round trip (the DNS layout); BENCH.md's headline table is the plain API path
(complex in/out) and the plain packed interface.  This script re-measures
those two rows per size so the table can be refreshed after kernel changes
(e.g. the DIF z-stage: MPIFFT4PY_TPU_ZDIF=auto vs 0 is an env A/B).

Usage: [MPIFFT4PY_TPU_ZDIF=0] [MPIFFT4PY_TPU_MATMUL=bf16x3] \
    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/roundtrip_onchip.py [N ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [512, 1024]
    import jax.numpy as jnp
    from mpifft4py_tpu import slab
    from mpifft4py_tpu.ops import pallas_fft3d as p3
    from mpifft4py_tpu.ops import pallas_zdif as z
    from mpifft4py_tpu.utils.cache import enable_wisdom_cache
    from mpifft4py_tpu.utils.profiling import measure

    enable_wisdom_cache(os.environ.get("MPIFFT4PY_TPU_CACHE",
                                       "/tmp/mpifft4py_tpu_cache"))
    rng = np.random.default_rng(3)
    for N in sizes:
        t0 = time.perf_counter()
        FFT = slab.R2C(np.array([N] * 3), np.array([2 * np.pi] * 3), None,
                       "single")
        fwd, bwd = FFT.forward_fn(), FFT.backward_fn()
        u = jnp.asarray(rng.standard_normal((N, N, N)).astype(np.float32))
        iters = 20 if N <= 512 else 5
        print(f"N={N} zdif={z.zdif_active(N)} "
              f"matmul={os.environ.get('MPIFFT4PY_TPU_MATMUL', 'highest')}: "
              "compiling API…", flush=True)
        t_api = measure(lambda v: bwd(fwd(v)), u, iters=iters)
        print(f"  api {t_api*1e3:.2f} ms; compiling packed…", flush=True)
        t_pk = measure(lambda v: p3.irfft3d_packed(*p3.rfft3d_packed(v),
                                                   (N, N, N)), u, iters=iters)
        t_pkd = None
        if z.zdif_active(N):  # the packed-INTERFACE tier (dif z lane order)
            print(f"  packed {t_pk*1e3:.2f} ms; compiling packed dif…",
                  flush=True)
            t_pkd = measure(lambda v: p3.irfft3d_packed(
                *p3.rfft3d_packed(v, dif=True), (N, N, N), dif=True),
                u, iters=iters)
        print(json.dumps({"N": N, "zdif": bool(z.zdif_active(N)),
                          "matmul": os.environ.get("MPIFFT4PY_TPU_MATMUL",
                                                   "highest"),
                          "api_ms": round(t_api * 1e3, 2),
                          "packed_ms": round(t_pk * 1e3, 2),
                          "packed_dif_ms": (None if t_pkd is None
                                            else round(t_pkd * 1e3, 2)),
                          "wall_s": round(time.perf_counter() - t0, 0)}),
              flush=True)
        del FFT, fwd, bwd, u


if __name__ == "__main__":
    main()
