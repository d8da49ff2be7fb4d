"""x-stage lane-tile (tq) sweep at the frontier sizes (round 5).

The post-zdif stage budget (stage_budget_big.py) found the axis-0 planar
stage the dominant cost: 33.2 ms of the 66.6 ms 768³ packed roundtrip,
running at 218 GB/s vs the y stage's 351 and the 476 GB/s elementwise
rate.  Hypothesis: the (1, n, tq) block at tq=128 reads 512-BYTE row
chunks at a ~1.2 MB stride (the row pitch N1·h·4), which DRAM serves at
poor efficiency; widening tq to 256/384 doubles/triples the contiguous
chunk.  _pick_tq's VMEM accounting caps tq at 128 for n >= 512 — the
MPIFFT4PY_TPU_TQ override lets the sweep probe past it (Mosaic raises a
scoped-vmem error if a point genuinely doesn't fit; each measure() jits a
fresh closure so the env is re-read at trace time, same pattern as
line2d_onchip's A/B).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python \
           benchmarks/xstage_tq_onchip.py [N ...]
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
    from mpifft4py_tpu.ops import pallas_fft3d as p3
    from mpifft4py_tpu.utils.profiling import measure

    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [768, 1024]
    rng = np.random.default_rng(11)
    for N in sizes:
        h = N // 2
        iters = 20 if N <= 768 else 10
        xr = jnp.asarray(rng.standard_normal((N, N, h)).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal((N, N, h)).astype(np.float32))
        pair_gb = 2 * N * N * h * 4 / 1e9

        def xrt(p):
            ar, ai = p3.fft_axis_planar(p[0], p[1], axis=0)
            return p3.fft_axis_planar(ar, ai, axis=0, inverse=True)

        post = N * h
        for tq in (128, 256, 384, 512):
            if post % tq:
                continue
            os.environ["MPIFFT4PY_TPU_TQ"] = str(tq)
            try:
                ms = measure(xrt, (xr, xi), iters=iters) * 1e3
            except Exception as e:  # scoped-vmem overflow at big tq
                print(json.dumps({"N": N, "tq": tq,
                                  "error": str(e)[:160]}), flush=True)
                continue
            print(json.dumps({"N": N, "tq": tq, "ms": round(ms, 3),
                              "GBps": round(4 * pair_gb / (ms * 1e-3), 1)}),
                  flush=True)
        os.environ.pop("MPIFFT4PY_TPU_TQ", None)
        del xr, xi


if __name__ == "__main__":
    main()
