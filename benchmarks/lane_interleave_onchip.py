"""API-zdif boundary: gather vs structured-interleave unpermute (round 5).

The zdif lane order is NOT an arbitrary permutation: the DIF layout is r
contiguous 64-lane pieces (one per residue b of k = r·t + b), and natural
order is their stride-r interleave.  So the unpermute can be phrased as r
static 64-lane SLICES + stack + reshape — a regular interleave XLA may
lower far better than the measured 46-61%-efficiency lane gather
(BENCH.md round 4 "Lane-gather cost").  Parity with jnp.take is asserted
by tests/test_zdif.py on the CPU mesh; this measures device ms only.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python \
           benchmarks/lane_interleave_onchip.py [sizes...]
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
    import jax.numpy as jnp

    from mpifft4py_tpu.ops.pallas_zdif import (dif_deinterleave,
                                               dif_interleave, zdif_iperm,
                                               zdif_perm)
    from mpifft4py_tpu.utils.profiling import measure

    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [512, 768, 1024]
    rng = np.random.default_rng(5)
    for n in sizes:
        h = n // 2
        iters = 20 if n <= 512 else 8
        xr = jnp.asarray(rng.standard_normal((n, n, h)).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal((n, n, h)).astype(np.float32))
        ip = jnp.asarray(zdif_iperm(n))
        pm = jnp.asarray(zdif_perm(n))
        cases = {
            "take_iperm": lambda p: (jnp.take(p[0], ip, axis=-1),
                                     jnp.take(p[1], ip, axis=-1)),
            "interleave": lambda p: (dif_interleave(p[0], n),
                                     dif_interleave(p[1], n)),
            "take_perm": lambda p: (jnp.take(p[0], pm, axis=-1),
                                    jnp.take(p[1], pm, axis=-1)),
            "deinterleave": lambda p: (dif_deinterleave(p[0], n),
                                       dif_deinterleave(p[1], n)),
            "elementwise": lambda p: (p[0] + 1.0, p[1] + 1.0),
        }
        rows = {"n": n, "iters": iters}
        for name, fn in cases.items():
            ms = measure(fn, (xr, xi), iters=iters) * 1e3
            rows[name] = round(ms, 3)
            print(json.dumps({"n": n, "op": name, "ms": rows[name]}),
                  flush=True)
        print(json.dumps(rows), flush=True)
        del xr, xi


if __name__ == "__main__":
    main()
