"""Buoyancy-rider fallback cost (VERDICT r4 item 4 residual, round 5).

At 512³ the rider rides IN-KERNEL (fft_x_epilogue_ok(512, buoy=True) —
confirmed on chip round 4); at 576-class+ the two extra VMEM blocks
overflow and fft_x_epilogue_packed falls back to the riderless kernel +
an XLA linear-projection pass (projection is linear in F̂).  This
measures that fallback's cost AT 512³ by forcing the gate off — the
same kernel/shapes either way, so the delta IS the fallback premium a
576-class user would pay per projection epilogue.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python \
           benchmarks/buoy_rider_onchip.py
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
    from mpifft4py_tpu.ops import pallas_zdif as z
    from mpifft4py_tpu.utils.profiling import measure

    N = 512
    h = N // 2
    rng = np.random.default_rng(17)
    sh = (3, N, N, h)
    fzr = jnp.asarray(rng.standard_normal(sh).astype(np.float32))
    fzi = jnp.asarray(rng.standard_normal(sh).astype(np.float32))
    sr = jnp.asarray(rng.standard_normal(sh).astype(np.float32))
    si = jnp.asarray(rng.standard_normal(sh).astype(np.float32))
    tr = jnp.asarray(rng.standard_normal((1, N, N, h)).astype(np.float32))
    ti = jnp.asarray(rng.standard_normal((1, N, N, h)).astype(np.float32))
    k = np.fft.fftfreq(N, 1.0 / N).astype(np.float32)
    k2 = np.arange(h, dtype=np.float32)[z.zdif_perm(N)]
    k0 = jnp.asarray(k)
    k1 = jnp.asarray(k)
    k2 = jnp.asarray(k2)
    m = jnp.asarray(np.abs(np.asarray(k)) < N // 3)
    m2 = jnp.asarray(np.asarray(k2) < N // 3)

    def run(args):
        # thread ALL big arrays through the carry: closure constants would
        # be captured into the jaxpr (2.15 GB) and re-uploaded per trace
        fr, fi, sr, si, tr, ti = args
        yr, yi = p3.fft_x_epilogue_packed(fr, fi, sr, si, k0, k1, k2,
                                          m, m, m2, "project", 1e-3,
                                          buoy=(tr, ti, 0.5))
        return yr, yi, sr, si, tr, ti

    carry = (fzr, fzi, sr, si, tr, ti)
    ms_in = measure(run, carry, iters=10) * 1e3
    print(json.dumps({"case": "rider in-kernel", "ms": round(ms_in, 3)}),
          flush=True)

    orig = p3.fft_x_epilogue_ok

    def patched(n0, buoy=False):
        return False if buoy else orig(n0)
    p3.fft_x_epilogue_ok = patched
    try:
        ms_fb = measure(run, carry, iters=10) * 1e3
    finally:
        p3.fft_x_epilogue_ok = orig
    print(json.dumps({"case": "XLA fallback", "ms": round(ms_fb, 3),
                      "premium_ms": round(ms_fb - ms_in, 3),
                      "premium_pct": round(100 * (ms_fb / ms_in - 1), 1)}),
          flush=True)


if __name__ == "__main__":
    main()
