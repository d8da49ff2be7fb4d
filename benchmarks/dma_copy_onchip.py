"""HBM->HBM DMA copy-rate microbench (VERDICT r3 weak #6).

The config-6 transpose proxy moves its whole per-peer block as ONE DMA
descriptor and measures ~117 GB/s payload (~234 GB/s HBM r+w) vs the chip's
measured ~480 GB/s elementwise streaming rate.  Hypothesis: a single
descriptor is one DMA-engine pipeline; k CONCURRENT descriptors (chunked
along the leading axis) should scale toward the streaming rate.

Sweeps k in {1, 2, 4, 8, 16} for (a) local async copies and (b) the
remote-copy-to-self path the rdma kernels use, at a 512 MiB payload.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/dma_copy_onchip.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mpifft4py_tpu.utils.cache import enable_wisdom_cache
    from mpifft4py_tpu.utils.profiling import measure

    enable_wisdom_cache(os.environ.get("MPIFFT4PY_TPU_CACHE",
                                       "/tmp/mpifft4py_tpu_cache"))

    rows, n0, n1 = 1024, 512, 256  # 512 MiB f32
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((rows, n0, n1)).astype(np.float32))
    gb = x.size * 4 / 1e9

    def local_copy(k):
        def kern(x_ref, o_ref, sem):
            c = rows // k
            cps = []
            for i in range(k):
                cp = pltpu.make_async_copy(
                    x_ref.at[pl.ds(i * c, c)], o_ref.at[pl.ds(i * c, c)],
                    sem.at[i])
                cp.start()
                cps.append(cp)
            for cp in cps:
                cp.wait()

        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((k,))],
        )

    for k in (1, 2, 4, 8, 16):
        t = measure(local_copy(k), x, iters=20)
        print(json.dumps({"mode": "local", "k": k,
                          "ms": round(t * 1e3, 3),
                          "payload_GBps": round(gb / t, 1),
                          "hbm_GBps": round(2 * gb / t, 1)}), flush=True)

    # elementwise anchor (same array: read + write once)
    t = measure(jax.jit(lambda v: v + 1.0), x, iters=20)
    print(json.dumps({"mode": "elementwise x+1", "ms": round(t * 1e3, 3),
                      "hbm_GBps": round(2 * gb / t, 1)}), flush=True)


if __name__ == "__main__":
    main()
