"""Per-op launch overhead on the v5e (round 5, NS2D diagnosis).

The 2D consumer measured per-op-overhead-bound (a 2048² step no more
expensive than 1024²; ~20 transforms/step dominate).  This isolates the
fixed per-op cost two ways, inside ONE compiled scan program (no relay
dispatch in the measured region):

* a chain of L dependent Pallas identity kernels over a 2D-step-sized pair;
* a chain of L dependent XLA rfft/irfft pairs at 1024².

The slope in L is the per-op cost; it decides whether a fused 2D NL
megakernel (1-2 launches per RHS instead of ~8) can beat the 16 ms XLA
step — or whether the overhead lives elsewhere.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python \
           benchmarks/launch_overhead_onchip.py
"""

import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    from mpifft4py_tpu.utils.cache import enable_wisdom_cache
    enable_wisdom_cache(os.environ.get("MPIFFT4PY_TPU_CACHE",
                                       "/tmp/mpifft4py_tpu_cache"))
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from mpifft4py_tpu.utils.profiling import measure

    N, h = 1024, 512
    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.standard_normal((N, h)).astype(np.float32))
    xi = jax.device_put(rng.standard_normal((N, h)).astype(np.float32))

    def _id_kernel(a_ref, b_ref, oa_ref, ob_ref):
        oa_ref[...] = a_ref[...] + 1.0
        ob_ref[...] = b_ref[...] + 1.0

    ident = pl.pallas_call(
        _id_kernel,
        grid=(8,),
        in_specs=[pl.BlockSpec((N // 8, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((N // 8, h), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((N, h), jnp.float32)] * 2,
    )

    def chain_pallas(L):
        def f(p):
            a, b = p
            for _ in range(L):
                a, b = ident(a, b)
            return a, b
        return f

    u = jax.device_put(rng.standard_normal((N, N)).astype(np.float32))

    def chain_fft(L):
        def f(v):
            for _ in range(L):
                v = jnp.fft.irfft(jnp.fft.rfft(v, axis=-1), n=N, axis=-1)
            return v
        return f

    rows = {}
    for name, mk, args in (("pallas_ident", chain_pallas, (xr, xi)),
                           ("xla_rfft_pair", chain_fft, u)):
        ts = {}
        for L in (1, 8, 32):
            ms = measure(mk(L), args, iters=20) * 1e3
            ts[L] = ms
            print(json.dumps({"op": name, "L": L, "ms": round(ms, 3)}),
                  flush=True)
        slope = (ts[32] - ts[8]) / 24.0
        rows[name] = {"per_op_ms": round(slope, 4)}
        print(json.dumps({"op": name, **rows[name]}), flush=True)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
