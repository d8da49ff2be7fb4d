"""On-chip A/B of the hierarchical twiddle-combine vs the direct r²-accum
combine (round-3 session-3 change, pending hardware numbers).

The combine choice matters only where the factored DIT's cross-block combine
is a visible fraction — the 512/768/1024-class y/x stages (r ∈ {4,6,8}).
Times the packed-interface r2c+c2r round trip at the requested sizes.

Usage: MPIFFT4PY_TPU_COMBINE={hier|direct} PYTHONPATH=... python
       benchmarks/combine_onchip.py N [N...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [512, 1024]
    import jax
    import jax.numpy as jnp
    from jax import lax
    from mpifft4py_tpu import slab
    from mpifft4py_tpu.utils.profiling import measure

    mode = os.environ.get("MPIFFT4PY_TPU_COMBINE", "hier")
    for N in sizes:
        FFT = slab.R2C(np.array([N] * 3), np.array([2 * np.pi] * 3), None,
                       "single")
        fwd = FFT.forward_packed_fn()
        bwd = FFT.backward_packed_fn()
        u = jnp.asarray(np.random.default_rng(0).standard_normal(
            (N, N, N), dtype=np.float32))

        def rt(v):
            return bwd(fwd(v))

        iters = 20 if N <= 512 else 5
        t = measure(rt, u, iters=iters)
        print(json.dumps({"N": N, "combine": mode,
                          "roundtrip_ms": round(t * 1e3, 2)}), flush=True)
        del FFT, fwd, bwd, u


if __name__ == "__main__":
    main()
