"""Lane-permute cost microbench: can the complex API path afford zdif?

zdif leaves the packed z lanes in `zdif_perm` order; the packed interface's
consumers permute their k2 VECTORS instead of the data, but the complex API
boundary must emit NATURAL order — so the API path has kept the dense
z-stage (BENCH.md round 4: zdif wins 1.14-1.33x on the packed roundtrip at
512/768).  The missing datum: what does a one-shot lane gather
(`jnp.take(..., axis=-1)`) cost at 512/768/1024-class?  If

    take_cost < zdif_saving (dense_z - zdif_z)

the API path can run zdif + an unpermute fused into the unpack boundary.
Times the gather on a packed-pair-sized array per size, plus an x+1
elementwise anchor at the same shape.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/lane_perm_onchip.py [N ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [512, 768]
    import jax.numpy as jnp
    from mpifft4py_tpu.ops.pallas_zdif import zdif_iperm, zdif_ok
    from mpifft4py_tpu.utils.cache import enable_wisdom_cache
    from mpifft4py_tpu.utils.profiling import measure

    enable_wisdom_cache(os.environ.get("MPIFFT4PY_TPU_CACHE",
                                       "/tmp/mpifft4py_tpu_cache"))
    rng = np.random.default_rng(5)
    for N in sizes:
        if not zdif_ok(N):
            print(json.dumps({"N": N, "skip": "zdif not gated"}))
            continue
        h = N // 2
        iters = 20 if N <= 512 else 8
        yr = jnp.asarray(rng.standard_normal((N, N, h)).astype(np.float32))
        yi = jnp.asarray(rng.standard_normal((N, N, h)).astype(np.float32))
        ip = jnp.asarray(zdif_iperm(N))
        gb = 2 * yr.size * 4 / 1e9  # pair read once

        t_take = measure(lambda p: (jnp.take(p[0], ip, axis=-1),
                                    jnp.take(p[1], ip, axis=-1)),
                         (yr, yi), iters=iters) * 1e3
        t_ew = measure(lambda p: (p[0] + 1.0, p[1] + 1.0),
                       (yr, yi), iters=iters) * 1e3
        print(json.dumps({"N": N, "take_pair_ms": round(t_take, 2),
                          "elementwise_pair_ms": round(t_ew, 2),
                          "take_eff_gbs": round(2 * gb / (t_take * 1e-3), 0),
                          "iters": iters}), flush=True)
        del yr, yi


if __name__ == "__main__":
    main()
